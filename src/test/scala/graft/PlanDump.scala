package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope): print the executed plan of a named
  * SparkEntry query — the source of the snippets in PLANS.md.
  * Usage: sbt "Test/runMain graft.PlanDump <query> [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.executedPlan.toString)
    graft.operators.SeqIds.releaseAll()
    spark.stop()
  }
}
