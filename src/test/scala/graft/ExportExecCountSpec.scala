package graft

import graft.export.Coco
import graft.operators.SeqIds
import org.apache.spark.sql.functions._

/** Pins the export path's single-execution contract: annotationRecords
  * must execute its anno input plan exactly once per export, no matter
  * how many internal actions (dim collects, SeqIds count pass) it
  * issues. A nondeterministic spy UDF on the anno source counts per-row
  * evaluations in an accumulator; the multi-execution anti-pattern this
  * guards against (each dim collect re-running the full upstream anno
  * projection — at 100 TB, repeated fact-table scans) multiplies the
  * count by 3-4×, so `== nRows` fails loudly if a future correctness
  * fix silently re-introduces an uncached collect.
  */
class ExportExecCountSpec extends SparkSpec {
  import spark.implicits._

  private def spiedFrames(accName: String) = {
    val acc = spark.sparkContext.longAccumulator(accName)
    val spy = udf { s: String => acc.add(1); s }.asNondeterministic()
    val base = (0 until 120).map { i =>
      val x0 = (i % 7).toDouble; val y0 = (i % 5).toDouble
      (s"img_${i % 11}", s"cat_${i % 3}", i.toLong,
        Seq(x0, y0, x0 + 4, y0, x0, y0 + 3),
        Seq(x0, y0, 4.0, 3.0, 0.0))
    }.toDF("image_name", "category", "anno_key", "segmentation", "rcoco")
    val annos = base.withColumn("image_name", spy(col("image_name")))
    // images derived from the SAME anno frame, as Synth.images derives
    // from Synth.annos — exercises the cache-substitution path too
    val images = annos.select("image_name").distinct()
      .withColumn("width", lit(640L)).withColumn("height", lit(480L))
    (acc, annos, images)
  }

  test("annotationRecords executes the anno source exactly once") {
    val (acc, annos, images) = spiedFrames("annoExecARecs")
    val out = Coco.annotationRecords(annos, images, "anno_key").collect()
    SeqIds.releaseAll()
    assert(out.length == 120)
    assert(acc.value == 120L,
      s"anno source evaluated ${acc.value} row-executions for 120 rows — " +
        "the export path is re-executing its input plan")
  }

  test("cocoDocument executes the anno source exactly once") {
    val (acc, annos, images) = spiedFrames("annoExecDoc")
    val doc = Coco.cocoDocument(annos, images, "anno_key", train = true)
    SeqIds.releaseAll()
    assert(doc.contains("\"annotations\""))
    assert(acc.value == 120L,
      s"anno source evaluated ${acc.value} row-executions for 120 rows")
  }

  test("cocoDocument job count is bounded independent of shuffle partitions") {
    // The streamed sections fetch contiguous partition-index GROUPS
    // (Coco.groupedRows, ≤8 jobs per section, zero exchange), so the job
    // count must not scale with spark.sql.shuffle.partitions — at the
    // production default (hundreds of partitions) an orderBy-shaped or
    // per-partition-fetch section would pay hundreds of jobs per export.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.sparkContext.addSparkListener(listener)
    try {
      val (_, annos, images) = spiedFrames("annoExecJobs")
      val doc = Coco.cocoDocument(annos, images, "anno_key", train = true)
      SeqIds.releaseAll()
      assert(doc.contains("\"annotations\""))
      // listener bus is async — require the count stable across THREE
      // consecutive polls so a single >250 ms bus stall (GC, loaded CI
      // box) can't end the wait early and under-count
      var last = -1
      var stable = 0
      while (stable < 3) {
        if (jobs.get == last) stable += 1 else { stable = 0; last = jobs.get }
        Thread.sleep(250)
      }
      // measured 41 at 64 partitions (8+8 section fetches + dim/SeqIds/
      // range-sampling actions); the orderBy-shaped sections paid 64 per
      // section — anything near 128 means the bound regressed
      assert(jobs.get <= 48,
        s"cocoDocument ran ${jobs.get} jobs at 64 shuffle partitions — " +
          "a streamed section is fetching one job per shuffle partition")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
