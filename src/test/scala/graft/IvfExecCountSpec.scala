package graft

import graft.ext.Ivf
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pins Lloyd's single-scan contract: `Ivf.lloyd` must execute its
  * embeddings input plan exactly once no matter how many iterations
  * run — each iteration's centroid collect is an action, and before
  * the pin each one re-executed the full upstream scan (at 100 TB,
  * `iters` fact-table scans where one suffices). A nondeterministic
  * spy UDF on the embedding column counts per-row evaluations; the
  * un-pinned anti-pattern multiplies the count by `iters`.
  */
class IvfExecCountSpec extends SparkSpec {
  import spark.implicits._

  test("lloyd executes the embeddings source exactly once across iterations") {
    val acc = spark.sparkContext.longAccumulator("embExecLloyd")
    val spy = udf { v: Seq[Float] => acc.add(1); v }.asNondeterministic()
    val base = (0 until 120).map { i =>
      (i.toLong, Seq(i.toFloat, (i % 7).toFloat, (i % 3).toFloat))
    }.toDF("vec_id", "embedding")
    val emb = base.withColumn("embedding",
      spy(col("embedding")).cast("array<float>"))
    // literal init centroids: no action on the spied frame before lloyd
    val init = Seq((0, Seq(0.0f, 0.0f, 0.0f)), (1, Seq(100.0f, 3.0f, 1.0f)))
      .toDF("cell", "centroid")

    val out = Ivf.lloyd(spark, emb, init, iters = 3)
    assert(out.count() <= 2 && out.columns.toSeq == Seq("cell", "centroid"))
    assert(acc.value == 120L,
      s"embeddings evaluated ${acc.value} row-executions for 120 rows over " +
        "3 Lloyd iterations — the corpus is being re-scanned per iteration")
    // the pin must not outlive the call
    assert(emb.storageLevel == StorageLevel.NONE,
      "lloyd must unpersist its internal corpus pin before returning")
    // the result is a local relation: consuming it twice re-scans nothing
    out.collect(); out.collect()
    assert(acc.value == 120L, "lloyd's result must be decoupled from the corpus")
  }

  test("lloyd values are unchanged by the pin (match a hand-rolled reference)") {
    val emb = (0 until 60).map { i =>
      (i.toLong, Seq((i % 10).toFloat, (i % 4).toFloat))
    }.toDF("vec_id", "embedding")
    val init = Seq((0, Seq(0.0f, 0.0f)), (1, Seq(9.0f, 3.0f)))
      .toDF("cell", "centroid")
    val refined = Ivf.lloyd(spark, emb, init, iters = 2)
      .orderBy("cell").collect()
    // hand-rolled reference: same assignment rule (cosine argmax, ties
    // to lowest cell), same mean, two rounds
    var cents = Map(0 -> Array(0.0, 0.0), 1 -> Array(9.0, 3.0))
    val vecs = (0 until 60).map(i => Array((i % 10).toDouble, (i % 4).toDouble))
    for (_ <- 0 until 2) {
      def cos(a: Array[Double], b: Array[Double]) = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val byCell = vecs.groupBy { v =>
        cents.toSeq.sortBy(_._1).maxBy { case (c, m) =>
          val s = cos(v, m); (if (s.isNaN) Double.MaxValue else s, -c)
        }._1
      }
      cents = byCell.map { case (c, vs) =>
        c -> Array.tabulate(2)(d => vs.map(_(d)).sum / vs.length)
      }
    }
    for (r <- refined) {
      val got = r.getSeq[Float](1)
      val exp = cents(r.getInt(0))
      for (d <- 0 until 2)
        assert(math.abs(got(d) - exp(d)) < 1e-4,
          s"cell ${r.getInt(0)} dim $d: $got vs ${exp.toSeq}")
    }
  }
}
