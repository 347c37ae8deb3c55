package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bloom-index bench: file-skip rate and wall cost of a point/IN
  * lookup through lake.BloomIndex versus the naive full-tree scan, at
  * a production-like file count (default 512 shuffled files — a shape
  * where zone maps prune NOTHING because every file spans the id
  * domain). Prints one JSON line.
  * Usage: graft.BloomBench [workDir] [nFiles]
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-bloombench").toString)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(512)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.ui.enabled", "false")
      .appName("graft-bloom-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dataDir = s"$workDir/data"; val bloomDir = s"$workDir/bloom"
      Tables.t(spark, srcDir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .repartition(nFiles).write.parquet(dataDir)

      val tb0 = System.nanoTime()
      graft.lake.BloomIndex.writeBloom(spark, dataDir, bloomDir, "event_id")
      val buildSec = (System.nanoTime() - tb0) / 1e9

      val ids = (1 to 20).map(i => (i * 4789L).toString)
      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // warm both paths once (file listing, codegen), then measure
      graft.lake.BloomIndex.prunedReadIn(spark, dataDir, bloomDir,
        "event_id", ids).count()
      spark.read.parquet(dataDir)
        .filter(col("event_id").cast("string").isin(ids: _*)).count()

      val (survivors, probeSec) =
        time(graft.lake.BloomIndex.survivors(spark, bloomDir, ids))
      val (nPruned, prunedSec) = time(
        graft.lake.BloomIndex.prunedReadIn(spark, dataDir, bloomDir,
          "event_id", ids).count())
      val (nFull, fullSec) = time(spark.read.parquet(dataDir)
        .filter(col("event_id").cast("string").isin(ids: _*)).count())
      require(nPruned == nFull, s"pruning changed results: $nPruned vs $nFull")

      println(
        s"""{"metric":"bloom_bench","n_files":$nFiles,"build_sec":$buildSec,""" +
        s""""probe_sec":$probeSec,"files_opened":${survivors.size},""" +
        s""""pruned_read_sec":$prunedSec,"full_scan_sec":$fullSec,""" +
        s""""rows":$nFull,"skip_pct":${100.0 * (nFiles - survivors.size) / nFiles}}""")
    } finally spark.stop()
  }
}
