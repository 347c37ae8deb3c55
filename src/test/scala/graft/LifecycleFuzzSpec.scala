package graft

import graft.lake.BucketedUpsert
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Model-based fuzz of the bucketed-table lifecycle: a random
  * interleaving of upsert batches, fragment appends, key deletes,
  * compactions, and a mid-run widening is replayed against a plain
  * in-memory map with last-version-wins semantics; after every
  * operation `readResolved` must equal the model exactly. This is the
  * cross-operation net under the per-verb specs — regressions that
  * only appear in particular orderings (a fragment landing after a
  * delete, compaction between two upserts of one key, widening mid-
  * stream) have nowhere to hide.
  */
class LifecycleFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("fuzz-spec").toString + "/t"

  test("randomized lifecycle interleavings match the in-memory model") {
    val rnd = new scala.util.Random(4177)
    val root = tmp()
    val nBuckets = 4
    // model: key -> (value, version); last version wins, later op wins ties
    val model = scala.collection.mutable.Map[Long, (Long, Long)]()
    var tag = 0L
    def nextTag(): Long = { tag += 1; tag }
    var widened = false

    def mkBatch(n: Int, ver: Long): Seq[(Long, Long, Long)] =
      (1 to n).map { _ =>
        val k = rnd.nextInt(60).toLong + 1
        val v = if (widened) rnd.nextLong().abs else rnd.nextInt(100000).toLong
        (k, v, ver)
      }
    // the v column starts INT (so the mid-run widening is real) and
    // carries LONG after it
    def toBatchDf(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("k", "v", "ver")
        .withColumn("v", col("v").cast(if (widened) "long" else "int"))

    def applyModel(rows: Seq[(Long, Long, Long)]): Unit =
      rows.foreach { case (k, v, ver) =>
        model.get(k) match {
          case Some((_, mv)) if mv > ver => () // stale arrival loses
          case _ => model(k) = (v, ver)        // ties: later op wins
        }
      }

    def verify(step: String): Unit = {
      val got = BucketedUpsert.readResolved(spark, root, "k", "ver")
        .select(col("k"), col("v").cast("long"), col("ver")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == model.toMap,
        s"divergence after $step: got ${got.size} rows, model ${model.size}\n" +
          s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)} " +
          s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)} " +
          s"diff=${got.collect { case (k, v) if model.get(k).exists(_ != v) => (k, v, model(k)) }.take(3)}")
    }

    // seed the table
    val seed = mkBatch(40, nextTag())
    // de-dup within the batch the way the engine resolves it (one row
    // per key survives; which one is the engine's tie-break) — keep the
    // model unambiguous by deduping the input instead
    def dedup(rows: Seq[(Long, Long, Long)]) =
      rows.groupBy(_._1).map(_._2.last).toSeq
    val seed1 = dedup(seed)
    BucketedUpsert.applyBatch(toBatchDf(seed1), root, "k", "ver",
      nBuckets, tag)
    applyModel(seed1)
    verify("seed")

    for (step <- 1 to 30) {
      val ver = nextTag()
      rnd.nextInt(6) match {
        case 0 | 1 => // resolve-on-write upsert
          val b = dedup(mkBatch(rnd.nextInt(12) + 1, ver))
          BucketedUpsert.applyBatch(toBatchDf(b), root, "k", "ver",
            nBuckets, ver)
          applyModel(b)
        case 2 | 3 => // fragment append (merge-on-read)
          val b = dedup(mkBatch(rnd.nextInt(12) + 1, ver))
          BucketedUpsert.appendFragment(toBatchDf(b), root, "k",
            nBuckets, ver)
          applyModel(b)
        case 4 => // key delete
          val victims = model.keys.toSeq.sorted
            .filter(_ => rnd.nextInt(5) == 0).take(6)
          if (victims.nonEmpty) {
            BucketedUpsert.deleteKeys(spark, root, "k",
              victims.toDF("k"), ver)
            victims.foreach(model.remove)
          }
        case 5 => // compaction: must change NOTHING visible
          BucketedUpsert.mergeFragments(spark, root, "k", "ver", ver)
      }
      if (step == 15) {
        // mid-run widening: metadata-only, later batches carry longs
        BucketedUpsert.widenColumn(spark, root, "v", LongType, nextTag())
        widened = true
      }
      verify(s"step $step (op tag $ver)")
    }
    // final shape sanity: the table survived ~30 mixed generations
    assert(model.nonEmpty && BucketedUpsert.read(spark, root).count() >=
      model.size)
  }
}
