package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.LongType

/** Testdata table access (TESTDATA.md): one parquet file per table under
  * a scale-factor directory. At 100 TB these would be directory trees of
  * many files — `spark.read.parquet(dir)` handles both shapes, so nothing
  * here assumes single-file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts canon: every consumer (queries, oracles via epoch_ns,
    // streaming event-time derivation) treats `ts` as an epoch-NANOSECOND
    // long. The driver's generator has shipped the column both as
    // timestamp[ns] (surfaced as long via nanosAsLong) and as
    // timestamp[us] (surfaced as TIMESTAMP_NTZ) across rounds — so the
    // scan normalizes BY TYPE, not by expectation: a timestamp of either
    // unit becomes epoch-ns (unix_micros under the UTC session * 1000;
    // micros-resolution data has exact ns equivalents, no precision
    // loss), a long passes through. One narrow projection at the scan,
    // free at any scale.
    // independent try blocks: the two confs have independent
    // settability, and a failure on the first (the documented
    // non-settable case) must not skip the second
    if (name == "events") {
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () } // non-settable → caller configured it
      // the timestamp[us] branch below interprets NTZ wall time in the
      // SESSION timezone — a non-UTC caller would shift every epoch-ns
      // value, so pin UTC for the duration of this method and RESTORE
      // the caller's timezone after (a permanent re-pin would silently
      // reconfigure every subsequent unrelated query in an ad-hoc
      // session). Restoring is safe because DataFrame construction
      // analyzes eagerly: ResolveTimeZone stamps the cast below with
      // the session timezone in force HERE, and the stamped expression
      // keeps it through later execution and composition.
      val prevTz = spark.conf.get("spark.sql.session.timeZone")
      try spark.conf.set("spark.sql.session.timeZone", "UTC")
      catch { case _: Exception => () }
      try {
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        if (df.schema("ts").dataType != LongType)
          df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
        else df
      } finally {
        try spark.conf.set("spark.sql.session.timeZone", prevTz)
        catch { case _: Exception => () }
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
