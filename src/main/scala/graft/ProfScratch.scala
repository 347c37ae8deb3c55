package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling scratch — delete before committing.
object ProfScratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val li = graft.Tables.t(spark, d, "lineitem")
    time("lineitem count 1")(li.count())
    time("lineitem count 2")(li.count())
    time("lineitem full noop")(li.write.format("noop").mode("overwrite").save())
    time("lineitem full noop 2")(li.write.format("noop").mode("overwrite").save())

    val annos = graft.queries.Synth.annos(spark, d)
    time("annos noop 1")(annos.write.format("noop").mode("overwrite").save())
    time("annos noop 2")(annos.write.format("noop").mode("overwrite").save())
    time("annos noop 3")(annos.write.format("noop").mode("overwrite").save())

    // repartition right after scan so projection parallelizes?
    val annosPar = graft.Tables.t(spark, d, "lineitem").repartition(32)
    time("lineitem repartition(32) noop")(annosPar.write.format("noop").mode("overwrite").save())

    val images = graft.queries.Synth.images(spark, d)
    time("images noop")(images.write.format("noop").mode("overwrite").save())

    // cache lineitem then annos off cache
    val cached = li.persist()
    time("cache build (count)")(cached.count())
    time("annos off cache noop")(annos.write.format("noop").mode("overwrite").save())
    time("images off cache noop")(images.write.format("noop").mode("overwrite").save())
  }
}
