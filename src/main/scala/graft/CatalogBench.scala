package graft

import graft.lake.BucketedUpsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the DSv2 partitioning claim is worth from PLAIN SQL
  * (VERDICT r19 #1): a key aggregate and a co-bucketed join over
  * catalog-resolved graft tables, each run (a) with the claim honored
  * (v2 bucketing on — zero exchange) and (b) with it ignored (the
  * shuffling plan), same session, same checksum aggregate consuming
  * every row. Reports wall seconds and the executed plan's
  * shuffle-write bytes — the quantity the claim sends to zero by
  * construction, and the one that dominates key-clustered work at
  * 100 TB.
  *
  * Deliberately mirrors [[BucketedJoinBench]]'s fixture/measure
  * protocol (same payload shape, checksum consumption,
  * PlanInspect.shuffleBytesWritten) so the two benches' numbers stay
  * comparable — a protocol change must land in both.
  *
  * Usage: graft.CatalogBench [nRows] [nBuckets] — one JSON line.
  */
object CatalogBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(8000000L)
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
    val work = java.nio.file.Files.createTempDirectory("cat-bench").toString

    def side(tag: String) = spark.range(0, nRows)
      .select(col("id").as("k"), lit(1L).as("ver"),
        concat(lit(tag), col("id"), lit("x" * 90)).as(s"payload_$tag"))
    BucketedUpsert.applyBatch(side("l"), s"$work/db/l", "k", "ver",
      nBuckets, 1)
    BucketedUpsert.applyBatch(side("r"), s"$work/db/r", "k", "ver",
      nBuckets, 1)
    val cat = graft.sources.GraftSql.registerCatalog(spark, work)

    def run(mk: => DataFrame): (Double, Long, Long) = {
      val out = mk
      val t0 = System.nanoTime()
      val n = out.collect().head.getLong(0)
      ((System.nanoTime() - t0) / 1e9,
        graft.plans.PlanInspect.shuffleBytesWritten(out), n)
    }
    def withBucketing[T](on: Boolean)(body: => T): T = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", on.toString)
      try body
      finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
    def agg() = spark.sql(
      s"""SELECT count(*) AS n, sum(h) AS hs FROM (
            SELECT k, count(*) AS c, sum(hash(payload_l)) AS h
            FROM $cat.db.l GROUP BY k)""")
    def join() = spark.sql(
      s"""SELECT count(*) AS n, sum(hash(l.k, l.payload_l, r.payload_r)) AS hs
          FROM $cat.db.l l JOIN $cat.db.r r ON l.k = r.k""")

    // warm codecs/JIT once
    withBucketing(on = true)(run(spark.sql(
      s"SELECT count(*) AS n FROM (SELECT k FROM $cat.db.l LIMIT 1000)")))

    val (aggClu, aggCluSh, nA) = withBucketing(on = true)(run(agg()))
    val (aggShf, aggShfSh, nA2) = withBucketing(on = false)(run(agg()))
    val (joinClu, joinCluSh, nJ) = withBucketing(on = true)(run(join()))
    val (joinShf, joinShfSh, nJ2) = withBucketing(on = false)(run(join()))
    require(nA == nRows && nA2 == nRows && nJ == nRows && nJ2 == nRows,
      s"cardinality drift: $nA/$nA2/$nJ/$nJ2 vs $nRows")

    println(
      f"""{"metric":"catalog_cluster","rows":$nRows,"n_buckets":$nBuckets,"agg_clustered_sec":$aggClu%.2f,"agg_shuffled_sec":$aggShf%.2f,"agg_clustered_shuffle_mb":${aggCluSh / 1e6}%.1f,"agg_shuffled_shuffle_mb":${aggShfSh / 1e6}%.1f,"join_clustered_sec":$joinClu%.2f,"join_shuffled_sec":$joinShf%.2f,"join_clustered_shuffle_mb":${joinCluSh / 1e6}%.1f,"join_shuffled_shuffle_mb":${joinShfSh / 1e6}%.1f}""")
    spark.stop()
  }
}
