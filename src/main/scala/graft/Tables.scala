package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // events.parquet carries timestamp[ns], which Spark's reader rejects
    // unless surfaced as long. Our mains set this at build time; set it
    // defensively here too so the queries run under any caller session.
    if (name == "events")
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () } // non-settable → caller configured it
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
