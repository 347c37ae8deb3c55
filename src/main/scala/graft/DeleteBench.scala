package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stats-pruned delete bench: the bytes and wall cost of
  * lake.DeleteWhere's touched-file rewrite versus the naive full-table
  * rewrite, on a z-ordered events tree at the bench SF. Prints one JSON
  * line. Usage: graft.DeleteBench [workDir]
  */
object DeleteBench {
  private def dirBytes(p: String): Long = {
    val f = new java.io.File(p)
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(x => dirBytes(x.getPath)).sum).getOrElse(0L)
  }

  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-delbench").toString)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.ui.enabled", "false")
      .appName("graft-delete-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ev = Tables.t(spark, srcDir, "events")
        .withColumn("bucket", expr("ts div 3600000000000"))
      graft.lake.ZOrder.writeZOrdered(ev, s"$workDir/data", 64, "user_id", "bucket")
      graft.lake.FileStats.writeStats(spark, s"$workDir/data", s"$workDir/stats",
        Seq("user_id"))
      val tableBytes = dirBytes(s"$workDir/data")

      // pruned delete of a narrow user range
      val t0 = System.nanoTime()
      val res = graft.lake.DeleteWhere.deleteRange(spark, s"$workDir/stats",
        "user_id", lit(100L), lit(110L), s"$workDir/v2")
      val prunedSec = (System.nanoTime() - t0) / 1e9
      val prunedBytes = dirBytes(s"$workDir/v2/files")

      // deletion-vector delete of the SAME range: no file rewrites at
      // all — bytes written are the (path, row_idx) sidecar plus the
      // copied metadata manifests
      val t2 = System.nanoTime()
      val dvRes = graft.lake.DeleteWhere.deleteVectors(spark, s"$workDir/stats",
        "user_id", lit(100L), lit(110L), s"$workDir/vdv")
      val dvSec = (System.nanoTime() - t2) / 1e9
      val dvBytes = dirBytes(s"$workDir/vdv")
      // and the read-side cost the sidecar adds (masked full scan)
      val t3 = System.nanoTime()
      val dvRows = graft.lake.DeleteWhere.read(spark, s"$workDir/vdv").count()
      val dvReadSec = (System.nanoTime() - t3) / 1e9

      // naive full rewrite of the same delete
      val t1 = System.nanoTime()
      spark.read.parquet(s"$workDir/data")
        .filter(col("user_id").isNull || !col("user_id").between(100L, 110L))
        .write.mode("overwrite").parquet(s"$workDir/full")
      val fullSec = (System.nanoTime() - t1) / 1e9
      val fullBytes = dirBytes(s"$workDir/full")
      require(dvRows == spark.read.parquet(s"$workDir/full").count(),
        "DV-masked read disagrees with the rewrite")

      println(s"""{"bench":"delete_where","sf":"$srcDir","table_bytes":$tableBytes,""" +
        s""""files_total":${res.filesTotal},"files_rewritten":${res.filesRewritten},""" +
        s""""rows_deleted":${res.rowsDeleted},"pruned_sec":$prunedSec,""" +
        s""""pruned_bytes":$prunedBytes,"full_sec":$fullSec,"full_bytes":$fullBytes,""" +
        s""""bytes_ratio":${if (prunedBytes > 0) fullBytes.toDouble / prunedBytes else -1},""" +
        s""""dv_sec":$dvSec,"dv_bytes":$dvBytes,"dv_read_sec":$dvReadSec,""" +
        s""""dv_rows_deleted":${dvRes.rowsDeleted}}""")
    } finally spark.stop()
  }
}
