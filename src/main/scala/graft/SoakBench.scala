package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSM soak measurement (VERDICT r16 #5): 120 batches through the
  * SHIPPED maintained-ingest body (`EventStreams.maintainedBatch` —
  * fragment append + threshold compaction + periodic tombstone GC)
  * against an UNMAINTAINED twin (fragment appends only). Two
  * quantities, both as functions of batch count:
  *
  *  - WRITE AMPLIFICATION: cumulative bytes landed / bytes the raw
  *    batches carry. The unmaintained twin is 1.0 by construction; the
  *    maintained regime pays merge rewrites — bounded, because each
  *    merge folds at most maxFragments fragments per bucket and runs
  *    only when the threshold fires.
  *  - READ LATENCY of the resolved view, sampled along the run. The
  *    unmaintained twin's fragment count grows one per touched bucket
  *    per batch, so its resolve cost grows with batch count; the
  *    maintained table's worst bucket stays at or under maxFragments,
  *    so its read cost must stay FLAT — that flatness is what the
  *    maintenance buys, and the bench prints both curves.
  *
  * Usage: graft.SoakBench [batches=120] [rowsPerBatch=50000] — one JSON
  * line; SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR as the other benches.
  */
object SoakBench {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(120)
    val rowsPerBatch = args.drop(1).headOption.map(_.toLong).getOrElse(50000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-soak-bench").toString
    val maintained = s"$work/maintained"
    val naive = s"$work/naive"
    val nBuckets = 64
    val maxFragments = 8
    val purgeEvery = 24
    val horizonLag = 30L

    // ~10% tombstones; keys churn over a 2M-key space so batches both
    // insert and update (the CDC shape). The per-batch key map is
    // BIJECTIVE (id·P + t mod 2M with P coprime to 2M): in-batch key
    // collisions would tie on (ver, fragment) and resolve by physical
    // row order, which differs between the two pipelines — the
    // live-state oracle would then fire on noise, not on a bug.
    def batchDf(t: Int) = spark.range(0, rowsPerBatch)
      .select(
        ((col("id") * 982451653L + t) % 2000000L).as("k"),
        lit(t.toLong).as("ver"),
        (hash(col("id"), lit(t), lit(7)) % 10 === 0).as("del"),
        concat(lit("p"), col("id"), lit("x" * 60)).as("payload"))

    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(x => dirBytes(x.getPath)).sum).getOrElse(0L)
    }
    def readSec(root: String): Double = {
      val t0 = System.nanoTime()
      graft.lake.BucketedUpsert.readResolved(spark, root, "k", "ver")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val samples = Seq(batches / 12, batches / 3, 2 * batches / 3, batches)
      .map(_ max 1).distinct
    var mWritten = 0L; var nWritten = 0L; var rawBytes = 0L
    val mReads = scala.collection.mutable.LinkedHashMap[Int, Double]()
    val nReads = scala.collection.mutable.LinkedHashMap[Int, Double]()
    val mFrags = scala.collection.mutable.LinkedHashMap[Int, Int]()
    val nFrags = scala.collection.mutable.LinkedHashMap[Int, Int]()

    val tM0 = System.nanoTime()
    for (t <- 1 to batches) {
      val b = (t - 1).toLong // batchId
      // maintainedBatch scales retention internally (+2 for its up to
      // three publishes per batch), so the data batch's own version
      // dir survives until dirBytes reads it below — the write-amp
      // terms measure every purgeEvery-th batch exactly
      graft.streaming.EventStreams.maintainedBatch(spark, batchDf(t), b,
        "k", "ver", maintained, nBuckets, maxFragments, Some("del"),
        purgeEvery, bid => bid + 1 - horizonLag)
      // bytes landed THIS batch: the data fragment + any maintenance
      // rewrites, measured before GC can rotate the dirs out
      val dataB = dirBytes(s"$maintained/data/v${4 * b + 1}")
      rawBytes += dataB
      mWritten += dataB + dirBytes(s"$maintained/data/v${4 * b + 2}") +
        dirBytes(s"$maintained/data/v${4 * b + 3}")
      if (samples.contains(t)) {
        mReads(t) = readSec(maintained)
        mFrags(t) = graft.lake.BucketedUpsert
          .fragmentCounts(spark, maintained).values.maxOption.getOrElse(0)
      }
    }
    val mIngestSec = (System.nanoTime() - tM0) / 1e9

    val tN0 = System.nanoTime()
    for (t <- 1 to batches) {
      graft.lake.BucketedUpsert.appendFragment(batchDf(t), naive, "k",
        nBuckets, t.toLong, versionCol = "ver")
      nWritten += dirBytes(s"$naive/data/v$t")
      if (samples.contains(t)) {
        nReads(t) = readSec(naive)
        nFrags(t) = graft.lake.BucketedUpsert
          .fragmentCounts(spark, naive).values.maxOption.getOrElse(0)
      }
    }
    val nIngestSec = (System.nanoTime() - tN0) / 1e9

    // the two regimes must agree on the LIVE state — the soak's oracle
    val mLive = graft.lake.BucketedUpsert
      .readLive(spark, maintained, col("del")).count()
    val nLive = graft.lake.BucketedUpsert
      .readLive(spark, naive, col("del")).count()
    // the maintained table PURGED aged tombstones (rows gone physically),
    // so compare live counts plus verify purge only removed tombstones
    require(mLive == nLive,
      s"maintained ($mLive) and naive ($nLive) live states diverged")

    def series(m: scala.collection.Map[Int, Double]) =
      m.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    val fragSeries = samples
      .map(t => s""""$t":[${mFrags.getOrElse(t, 0)},${nFrags.getOrElse(t, 0)}]""")
      .mkString("{", ",", "}")
    println(
      f"""{"metric":"lsm_soak","batches":$batches,"rows_per_batch":$rowsPerBatch,""" +
        f""""n_buckets":$nBuckets,"max_fragments":$maxFragments,"purge_every":$purgeEvery,""" +
        f""""raw_mb":${rawBytes / 1e6}%.1f,"maintained_written_mb":${mWritten / 1e6}%.1f,""" +
        f""""naive_written_mb":${nWritten / 1e6}%.1f,""" +
        f""""write_amp_maintained":${mWritten.toDouble / rawBytes}%.2f,""" +
        f""""maintained_ingest_sec":$mIngestSec%.1f,"naive_ingest_sec":$nIngestSec%.1f,""" +
        s""""read_sec_maintained":${series(mReads)},"read_sec_naive":${series(nReads)},""" +
        s""""worst_fragments_maintained_vs_naive":$fragSeries,"live_rows":$mLive}""")
    spark.stop()
  }
}
