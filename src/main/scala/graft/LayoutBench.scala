package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout bench (SURVEY §4 / VERDICT r11 #5): hive-partitioning by
  * a high-cardinality key — the reference's per-image directory layout —
  * versus bucketing by the same key, versus a plain unpartitioned write.
  * Measures write time, file count, and the j1-shaped equi-join both
  * layouts exist to serve, plus whether the join planned an Exchange
  * (the thing bucketing eliminates).
  *
  * Usage: graft.LayoutBench [workDir] — prints one JSON line.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-layout").toString)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      // AQE off: the layout comparison is about the STATIC plan each
      // layout produces (does the join need an Exchange at all), and
      // with AQE on the hasExchange probe would read a pre-execution
      // AdaptiveSparkPlan that can differ from what the timed run
      // actually executed
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The anno-shaped fact: lineitem rows keyed by a synthetic image
    // name (~2k distinct — the reference partitions its lake by exactly
    // this kind of key). The dim side is the distinct key set with a
    // per-image attribute, as in s9/s11's image-table joins.
    val annos = Tables.t(spark, srcDir, "lineitem")
      .select(concat(lit("img_"), (col("l_orderkey") % 2000).cast("string")).as("image_name"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_partkey"))
    val images = annos.select("image_name").distinct()
      .withColumn("width", (length(col("image_name")) * 100).cast("int"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def fileCount(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(path))
    }
    def hasExchange(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Exchange")

    // Layout A: hive-partitioned by image_name (reference layout).
    // Repartition on the key first — the sane way to write this layout;
    // a naive write would emit tasks×partitions ≈ 64k files.
    val (_, tHiveWrite) = timed {
      annos.repartition(32, col("image_name"))
        .write.mode("overwrite").partitionBy("image_name")
        .parquet(s"$workDir/annos_hive")
    }
    val hiveFiles = fileCount(s"$workDir/annos_hive")

    // Layout B: bucketed by image_name, both sides of the join.
    val (_, tBucketWrite) = timed {
      graft.lake.Bucketing.writeBucketed(annos, "annos_bucketed", "image_name", 32)
      graft.lake.Bucketing.writeBucketed(images, "images_bucketed", "image_name", 32)
    }
    val bucketFiles = fileCount(s"$workDir/warehouse/annos_bucketed")

    // Layout C: plain unpartitioned parquet (the baseline both compete
    // against).
    val (_, tPlainWrite) = timed {
      annos.write.mode("overwrite").parquet(s"$workDir/annos_plain")
      images.write.mode("overwrite").parquet(s"$workDir/images_plain")
    }
    val plainFiles = fileCount(s"$workDir/annos_plain")

    def benchJoin(a: DataFrame, i: DataFrame): (Double, Boolean) = {
      val joined = a.join(i.hint("shuffle_hash"), Seq("image_name"))
        .groupBy("image_name")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"), max("width").as("w"))
      val (_, t) = timed {
        joined.write.format("noop").mode("overwrite").save()
      }
      (t, hasExchange(joined))
    }
    // point lookup: the other access pattern hive-partitioning serves
    def benchLookup(a: DataFrame): Double =
      timed {
        a.filter(col("image_name") === "img_42")
          .write.format("noop").mode("overwrite").save()
      }._2

    val imgPlain = spark.read.parquet(s"$workDir/images_plain")
    val (tJoinHive, exHive) =
      benchJoin(spark.read.parquet(s"$workDir/annos_hive"), imgPlain)
    val (tJoinBucket, exBucket) =
      benchJoin(spark.table("annos_bucketed"), spark.table("images_bucketed"))
    val (tJoinPlain, exPlain) =
      benchJoin(spark.read.parquet(s"$workDir/annos_plain"), imgPlain)
    val lkHive = benchLookup(spark.read.parquet(s"$workDir/annos_hive"))
    val lkBucket = benchLookup(spark.table("annos_bucketed"))
    val lkPlain = benchLookup(spark.read.parquet(s"$workDir/annos_plain"))

    println(f"""{"metric":"layout_bench","sf":"$srcDir",""" +
      f""""hive":{"write_sec":$tHiveWrite%.2f,"files":$hiveFiles,"join_sec":$tJoinHive%.2f,"join_exchange":$exHive,"lookup_sec":$lkHive%.2f},""" +
      f""""bucketed":{"write_sec":$tBucketWrite%.2f,"files":$bucketFiles,"join_sec":$tJoinBucket%.2f,"join_exchange":$exBucket,"lookup_sec":$lkBucket%.2f},""" +
      f""""plain":{"write_sec":$tPlainWrite%.2f,"files":$plainFiles,"join_sec":$tJoinPlain%.2f,"join_exchange":$exPlain,"lookup_sec":$lkPlain%.2f}}""")
    spark.stop()
  }
}
