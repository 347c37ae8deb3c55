package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** r21 plan-evidence scratch: the applyBatch resolve+route frame's
  * executed plan (the write body), dumped to a file. */
object ResolvePlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("rpd").toString + "/t"
    val df = spark.range(0, 10000).select(col("id").as("k"), lit(1L).as("ver"), (col("id")*2).as("v"))
    graft.lake.BucketedUpsert.applyBatch(df, root, "k", "ver", 16, 1)
    val b2 = df.filter(col("k") % 10 === 0).withColumn("ver", lit(2L))
    // the exact resolve+route frame applyBatch writes on a LATER batch
    // (base = standing table, batch = b2), pre-r21 vs r21 shape
    val base = graft.lake.BucketedUpsert.read(spark, root)
    val resolved =
      if (args.length > 1 && args(1) == "old") {
        import org.apache.spark.sql.expressions.Window
        base.unionByName(b2, allowMissingColumns = true)
          .withColumn("graft_rn", row_number().over(
            Window.partitionBy("k").orderBy(desc("ver"))))
          .filter(col("graft_rn") === 1).drop("graft_rn")
          .withColumn("graft_bucket", graft.lake.BucketedUpsert.bucketOf(col("k"), 16))
          .repartition(col("graft_bucket"))
          .sortWithinPartitions(col("graft_bucket"), col("k"))
      } else {
        import org.apache.spark.sql.expressions.Window
        base.unionByName(b2, allowMissingColumns = true)
          .repartition(16, col("k"))
          .withColumn("graft_rn", row_number().over(
            Window.partitionBy("k").orderBy(desc("ver"))))
          .filter(col("graft_rn") === 1).drop("graft_rn")
          .withColumn("graft_bucket", graft.lake.BucketedUpsert.bucketOf(col("k"), 16))
          .sortWithinPartitions(col("graft_bucket"), col("k"))
      }
    val plan = resolved.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      s"== applyBatch resolve+route frame (${if (args.length > 1) args(1) else "new"}) ==\n" + plan)
    println("wrote " + out)
    spark.stop()
  }
}
