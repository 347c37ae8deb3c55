package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): print or dump the plan of named SparkEntry
  * queries — the source of the snippets in PLANS.md and of the r21
  * optimization round's plan evidence (`plans/r21/<q>_before.txt` /
  * `_after.txt`).
  *
  * Usage:
  *   sbt "Test/runMain graft.PlanDump <query> [sfDir]"
  *     — print the executed plan (PLANS.md mode)
  *   sbt "Test/runMain graft.PlanDump --out <dir> <suffix> <q1,q2,...>"
  *     — write `.explain("formatted")` to <dir>/<q>_<suffix>.txt each
  * SPARK_GRAFT_SF_DIR overrides the data dir in --out mode (default
  * sf0.001; plan shapes are scale-independent, AQE may swap join
  * strategies at size).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("--out")) {
      val Array(_, outDir, suffix, names) = args.take(4)
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.001")
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
    } else {
      val name = args(0)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.executedPlan.toString)
      graft.operators.SeqIds.releaseAll()
    }
    spark.stop()
  }
}
