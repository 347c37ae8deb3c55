package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-join stress main (SCALE.md §Skew): synthesizes a fact table
  * where ONE key owns a large fraction of all rows — the hot-key shape
  * that straggles a shuffle join at 100 TB — and measures the same
  * join three ways:
  *
  *   plain     shuffle-hash join, AQE skew handling OFF (what any
  *             engine without runtime re-planning executes)
  *   aqe       the same join with spark.sql.adaptive.skewJoin enabled
  *             (Spark's runtime answer — note its ABSOLUTE trigger,
  *             skewedPartitionThresholdInBytes=256m: a hot partition
  *             below that never splits no matter how lopsided)
  *   salted    operators.Salt.saltedJoin — the proactive fix, spread
  *             pinned ahead of time, no size threshold
  *
  * Alongside wall time it reports the join-output partition histogram
  * (max/median rows per partition) — the direct measure of whether the
  * hot key's rows landed on one reducer or eight.
  *
  * A fourth variant, aqe_forced, sets
  * spark.sql.adaptive.forceOptimizeSkewedJoin — needed because in the
  * join+aggregate pipeline shape AQE otherwise DECLINES to split the
  * hot partition (splitting would break the downstream aggregate's
  * distribution requirement and cost an extra shuffle).
  *
  * Usage: graft.SkewBench [replication=10] [hotPercent=40] [salts=8]
  * Prints one JSON line.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val rep = args.lift(0).map(_.toInt).getOrElse(10)
    val hotPct = args.lift(1).map(_.toInt).getOrElse(40)
    val salts = args.lift(2).map(_.toInt).getOrElse(8)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // the scenario models a dim too big to broadcast — that is the
      // only regime where salting is the right tool at all
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // keep all 32 reducers: at this toy byte-scale AQE would coalesce
      // both variants to ~10 partitions and blur the straggler the
      // bench exists to show (at 100 TB nothing gets coalesced)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nSupp = spark.read.parquet(s"$srcDir/supplier.parquet").count()
    // rep× lineitem with l_suppkey rewritten: hotPct% of rows take key 1,
    // the rest spread uniformly. The rewrite hash is deterministic per
    // (row, replica) so reruns synthesize the identical corpus.
    // a synthetic 64-char comment rides along so the shuffled row and the
    // per-row agg work have realistic width — a skinny all-numeric row
    // understates what a straggler costs on production fact tables.
    val fact = spark.read.parquet(s"$srcDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .withColumn("l_comment", concat(md5(col("l_orderkey").cast("string")),
        md5(col("l_linenumber").cast("string"))))
      .withColumn("r", explode(sequence(lit(1), lit(rep))))
      .withColumn("h", pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("r")), lit(100)))
      .withColumn("l_suppkey",
        when(col("h") < hotPct, lit(1L))
          .otherwise(pmod(xxhash64(col("h"), col("l_orderkey"), col("r")), lit(nSupp)) + 1))
      .select("l_suppkey", "l_quantity", "l_comment", "l_orderkey", "l_linenumber", "r")
    fact.write.mode("overwrite").parquet("/tmp/graft-skew/fact.parquet")
    val f = spark.read.parquet("/tmp/graft-skew/fact.parquet")
    val dim = spark.read.parquet(s"$srcDir/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val nRows = f.count()

    def consume(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def agg(j: DataFrame): DataFrame =
      j.groupBy("l_suppkey").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"),
        sum(length(col("l_comment"))).as("cb"))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def partHist(j: DataFrame): (Long, Long) = {
      val counts = j.select(spark_partition_id().as("p"))
        .groupBy("p").count().select("count").as[Long].collect().sorted
      (counts.last, counts(counts.length / 2))
    }

    val skewOff = () => spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val skewOn = () => spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    def plainJoin = f.join(dim.hint("shuffle_hash"), Seq("l_suppkey"))
    def saltedJoin = graft.operators.Salt.saltedJoin(
      f, dim, "l_suppkey", salts, xxhash64(col("l_orderkey"), col("l_linenumber"), col("r")))

    // warm: page cache + codegen on a throwaway variant
    skewOff(); consume(agg(plainJoin).limit(1))
    consume(agg(saltedJoin).limit(1))

    // interleaved rounds, min-of per variant — the box's slow drift over
    // a session must not masquerade as a variant difference
    var tPlain, tAqe, tAqeF, tSalted = Double.MaxValue
    for (_ <- 1 to 3) {
      skewOff(); tSalted = math.min(tSalted, time(consume(agg(saltedJoin))))
      tPlain = math.min(tPlain, time(consume(agg(plainJoin))))
      skewOn(); tAqe = math.min(tAqe, time(consume(agg(plainJoin))))
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      tAqeF = math.min(tAqeF, time(consume(agg(plainJoin))))
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    }
    skewOff()
    val (maxPlain, medPlain) = partHist(plainJoin)
    val (maxSalt, medSalt) = partHist(saltedJoin)

    // sanity: identical results
    val chk = agg(plainJoin).union(agg(saltedJoin))
      .groupBy("l_suppkey", "n", "q", "cb").count().filter(col("count") =!= 2).count()

    println(
      s"""{"metric":"skew_join","rows":$nRows,"hot_pct":$hotPct,"n_supp":$nSupp,""" +
      s""""plain_sec":$tPlain,"aqe_sec":$tAqe,"aqe_forced_sec":$tAqeF,""" +
      s""""salted_sec":$tSalted,"salts":$salts,""" +
      s""""plain_max_part":$maxPlain,"plain_med_part":$medPlain,""" +
      s""""salted_max_part":$maxSalt,"salted_med_part":$medSalt,"mismatch":$chk}""")
    spark.stop()
  }
}
