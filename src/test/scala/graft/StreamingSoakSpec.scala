package graft

import graft.lake.BucketedUpsert
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end SOAK of the LSM streaming regime (VERDICT r16 #5): 110
  * real micro-batches through `streamingIngestMaintained`'s shipped
  * batch body — fragment appends, threshold compaction, and periodic
  * tombstone GC interleaved — against the lifecycle-fuzz in-memory
  * model as the oracle. The long run is the point: the invariants that
  * matter in production only fail after accumulation, not on batch 2.
  *
  * Checked throughout:
  *  - resolved state == model at every checkpoint (exactly, including
  *    tombstone rows not yet GC'd);
  *  - the live view == the model's non-tombstone slice;
  *  - the worst bucket's FRAGMENT COUNT never exceeds the threshold —
  *    the bound that keeps merge-on-read latency flat at any batch
  *    count (without maintenance it would grow one per batch);
  *  - purge physically shrinks the table WITHOUT changing the live
  *    view and never resurrects a superseded version (the
  *    fragmented-purge hazard is separately pinned to fail fast).
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("110-batch maintained ingest matches the model with bounded fragments") {
    val root = tmp("soak-spec") + "/t"
    val rnd = new scala.util.Random(90217)
    val input = MemoryStream[(Long, Long, Long, Boolean)](spark, 41)
    val nBuckets = 4
    val maxFragments = 6
    val purgeEvery = 16
    val horizonLag = 12L // versions a tombstone must age before GC

    // model: k -> (v, ver, del); last version wins (versions are the
    // batch ordinal, so strictly increasing across batches)
    val model = scala.collection.mutable.Map[Long, (Long, Long, Boolean)]()

    val q = input.toDF().toDF("k", "v", "ver", "del").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        EventStreams.maintainedBatch(spark, b, id, "k", "ver", root,
          nBuckets, maxFragments, Some("del"), purgeEvery,
          bid => bid + 1 - horizonLag)
        ()
      }
      .option("checkpointLocation", tmp("soak-ckpt"))
      .start()

    def verify(step: Int): Unit = {
      val got = BucketedUpsert.readResolved(spark, root, "k", "ver")
        .select("k", "v", "ver", "del").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap
      assert(got == model.toMap,
        s"divergence at batch $step: got ${got.size} rows, model ${model.size}; " +
          s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(5)} " +
          s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(5)} " +
          s"diff=${got.collect { case (k, v) if model.get(k).exists(_ != v) => (k, v, model(k)) }.take(3)}")
      val live = BucketedUpsert.readLive(spark, root, col("del"))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(live == model.collect { case (k, (_, _, false)) => k }.toSet,
        s"live view diverged at batch $step")
    }

    try {
      var purgesThatDropped = 0
      for (step <- 0 until 110) {
        val ver = step + 1L
        // 1-8 rows, keys in 1..40, ~15% tombstones; dedup within the
        // batch so the model is unambiguous
        val rows = (1 to rnd.nextInt(8) + 1).map { _ =>
          (rnd.nextInt(40).toLong + 1, rnd.nextInt(100000).toLong, ver,
            rnd.nextInt(7) == 0)
        }.groupBy(_._1).map(_._2.last).toSeq
        input.addData(rows)
        q.processAllAvailable()
        rows.foreach { case (k, v, vr, del) => model(k) = (v, vr, del) }
        if ((step + 1) % purgeEvery == 0) {
          // the sink merged then purged: age-expired tombstones left
          // the table PHYSICALLY — mirror in the model
          val horizon = step + 1 - horizonLag
          val victims = model.collect {
            case (k, (_, vr, true)) if vr <= horizon => k
          }.toSeq
          if (victims.nonEmpty) purgesThatDropped += 1
          victims.foreach(model.remove)
        }
        // the LSM latency bound, checked EVERY batch: maintenance must
        // keep the worst bucket at or under the threshold forever
        val worst = BucketedUpsert.fragmentCounts(spark, root)
          .values.maxOption.getOrElse(0)
        assert(worst <= maxFragments,
          s"fragment bound broken at batch $step: worst bucket $worst > $maxFragments")
        if ((step + 1) % 10 == 0) verify(step)
      }
      verify(109)
      // the soak must have actually exercised the GC path
      assert(purgesThatDropped >= 2,
        s"soak never aged a tombstone past the horizon ($purgesThatDropped) — weaken the lag")
      // and nothing the LAST GC's horizon covered survived physically
      val lastPurgeStep = (110 / purgeEvery) * purgeEvery - 1
      val horizon = lastPurgeStep + 1 - horizonLag
      val expired = BucketedUpsert.read(spark, root)
        .filter(col("del") && col("ver") <= horizon).count()
      assert(expired == 0, s"$expired expired tombstones survived the purge")
    } finally q.stop()
  }
}
