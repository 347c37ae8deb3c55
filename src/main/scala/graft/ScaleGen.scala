package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-corpus scale-up synthesizer (SCALE.md §sf1): replicates EVERY
  * testdata table `rep`× with disjoint, referentially-consistent keys,
  * so the complete gate/bench suite runs unmodified at "sf1" scale
  * (10× sf0.1 ≈ 6M lineitem rows) — the end-to-end scaling check the
  * per-family stress mains ([[Stress]], [[SkewBench]], [[LayoutBench]])
  * don't cover.
  *
  * Construction: replica r shifts every key k by r·(max(k)+1) **in its
  * own key space**, and applies the SAME shift to each foreign key
  * (o_custkey/user_id ride the customer space, l_orderkey the order
  * space, …), so each replica is a self-consistent copy of the source
  * universe and every join's fan-out per key is preserved — data and
  * key cardinality both scale by rep, which is exactly the regime a
  * linear-scaling claim must hold in. Replica 0 is the identity copy.
  * The dimension tables (region, nation) stay fixed, as TPC-H scaling
  * does. Documents get a replica-unique suffix on 90% of texts (exact
  * copies on the rest keep dedup honest); embeddings get a one-dim
  * deterministic perturbation. Event timestamps are NOT shifted: 10×
  * traffic in the same time span, so windowed state per key stays flat
  * while volume scales — the production shape for a 10× ingest.
  *
  * Usage: graft.ScaleGen [workDir=/tmp/graft-sf1-full] [rep=10]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft-sf1-full")
    val rep = args.lift(1).map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(name: String): DataFrame = Tables.t(spark, srcDir, name)
    def shiftUnit(name: String, key: String): Long =
      src(name).agg(max(col(key)).cast("long")).collect()(0).getLong(0) + 1
    val reps = spark.range(rep).select(col("id").as("r"))
    def write(df: DataFrame, name: String, parts: Int = 32): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$workDir/$name.parquet")

    // fixed dims — joins against them stay broadcast-able at any rep
    for (t <- Seq("region", "nation")) write(src(t), t, parts = 1)

    val kCust = shiftUnit("customer", "c_custkey")
    val kSupp = shiftUnit("supplier", "s_suppkey")
    val kPart = shiftUnit("part", "p_partkey")
    val kOrd = shiftUnit("orders", "o_orderkey")
    val kEvt = shiftUnit("events", "event_id")
    val kDoc = shiftUnit("documents", "doc_id")
    val kVec = shiftUnit("embeddings", "vec_id")

    def shifted(name: String, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(src(name).crossJoin(reps)) { case (df, (c, unit)) =>
        df.withColumn(c, col(c) + col("r") * unit)
      }

    write(shifted("customer", "c_custkey" -> kCust).drop("r"), "customer")
    write(shifted("supplier", "s_suppkey" -> kSupp).drop("r"), "supplier")
    write(shifted("part", "p_partkey" -> kPart).drop("r"), "part")
    write(shifted("orders", "o_orderkey" -> kOrd, "o_custkey" -> kCust).drop("r"), "orders")
    write(shifted("lineitem", "l_orderkey" -> kOrd, "l_partkey" -> kPart,
      "l_suppkey" -> kSupp).drop("r"), "lineitem")
    write(shifted("events", "event_id" -> kEvt, "user_id" -> kCust).drop("r"), "events")

    write(shifted("documents", "doc_id" -> kDoc)
      .withColumn("text",
        when(col("doc_id") % 10 === 0 || col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("r").cast("string"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("r"), "documents")

    write(shifted("embeddings", "vec_id" -> kVec)
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> CASE WHEN i = 0 " +
          "THEN cast(x + r * 0.001 as float) ELSE x END)"))
      .drop("r"), "embeddings")

    val counts = Tables.all.map(t =>
      s""""$t":${spark.read.parquet(s"$workDir/$t.parquet").count()}""")
    println(s"""{"metric":"scale_gen","rep":$rep,"src":"$srcDir","out":"$workDir",""" +
      s""""rows":{${counts.mkString(",")}}}""")
    spark.stop()
  }
}
