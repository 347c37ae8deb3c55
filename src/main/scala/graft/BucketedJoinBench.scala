package graft

import graft.lake.BucketedUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-bucketed vs naive fact⋈fact join (VERDICT r15 #1): builds two
  * keyed tables co-bucketed on the join key, joins them (a) as plain
  * parquet reads (two-sided shuffle) and (b) through
  * [[BucketedUpsert.bucketedJoin]] (zero Exchange), and reports wall
  * time plus the EXECUTED PLAN's shuffle-write bytes — the quantity
  * that goes to zero by construction, and the one that dominates a
  * 100 TB × 2 join. Both variants materialize the full join output
  * through the same checksum aggregate, so IO and join work are
  * identical; only the exchange differs.
  *
  * Usage: graft.BucketedJoinBench [nRows] [nBuckets] — one JSON line.
  */
object BucketedJoinBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nBuckets = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("bjoin-bench").toString

    // ~100 B payload per row on each side
    def side(tag: String) = spark.range(0, nRows)
      .select(col("id").as("k"), lit(1L).as("ver"),
        concat(lit(tag), col("id"), lit("x" * 90)).as(s"payload_$tag"))
    val l = s"$work/left"; val r = s"$work/right"
    BucketedUpsert.applyBatch(side("l"), l, "k", "ver", nBuckets, 1)
    BucketedUpsert.applyBatch(side("r"), r, "k", "ver", nBuckets, 1)

    // consume every joined column so both variants do the full join work
    def run(mk: => DataFrame): (Double, Long, Long) = {
      val df = mk
      val out = df.agg(count(lit(1)).as("n"),
        sum(hash(col("k"), col("payload_l"), col("payload_r"))).as("h"))
      val t0 = System.nanoTime()
      val n = out.collect().head.getLong(0)
      ((System.nanoTime() - t0) / 1e9,
        graft.plans.PlanInspect.shuffleBytesWritten(out), n)
    }

    // warm codecs/JIT once at small scale
    run(BucketedUpsert.read(spark, l).limit(1000)
      .join(BucketedUpsert.read(spark, r).limit(1000), Seq("k")))

    val (naiveSec, naiveSh, nN) = run(
      BucketedUpsert.read(spark, l).join(BucketedUpsert.read(spark, r), Seq("k")))
    val (bktSec, bktSh, nB) = run(
      BucketedUpsert.bucketedJoin(spark, l, r, "k"))
    require(nN == nRows && nB == nRows, s"join cardinality wrong: $nN/$nB")
    // third variant: the certified sort order honored too — SMJ with
    // neither Exchange nor Sort (the opt-in trades file splitting away)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val (sortedSec, _, nS) = run(BucketedUpsert.bucketedJoin(spark, l, r, "k"))
    spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    require(nS == nRows, s"sorted-join cardinality wrong: $nS")

    println(
      f"""{"metric":"bucketed_join","rows_per_side":$nRows,"n_buckets":$nBuckets,"naive_sec":$naiveSec%.2f,"bucketed_sec":$bktSec%.2f,"sorted_sec":$sortedSec%.2f,"naive_shuffle_mb":${naiveSh / 1e6}%.1f,"bucketed_shuffle_mb":${bktSh / 1e6}%.1f}""")
    spark.stop()
  }
}
