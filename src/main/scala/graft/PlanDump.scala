package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the r21
  * optimization round's plan-evidence rig (`plans/r21/<q>_before.txt` /
  * `_after.txt`). Runs each gate's DataFrame builder exactly as the
  * bench does (same session config) and captures the FORMATTED plan of
  * the returned frame; lifecycle gates execute their side-effect
  * pipeline during construction, so the dump reflects the final read
  * over the state those writes produced. Dev tool — not part of the
  * driver contract.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>"
  *   e.g. runMain graft.PlanDump plans/r21 before st_bm25_ingest,s18_incr_agg
  * SPARK_GRAFT_SF_DIR picks the data dir (default sf0.001 — plan shapes
  * are scale-independent; AQE may swap strategies at size).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, names) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          s"== $name ($suffix, $sfDir) ==\n" + plan)
        println(s"wrote $outDir/${name}_$suffix.txt")
      } finally graft.operators.SeqIds.releaseAll()
    }
    spark.stop()
  }
}
