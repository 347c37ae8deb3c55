package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files penalty measurement (SCALE.md §compaction): the same
  * rows, three layouts — pathological (thousands of KB files), the
  * compacted rewrite, and the single-file ideal — timed on an
  * identical scan+aggregate. The point compaction exists to prove:
  * below ~target-sized files, scan cost is file-open + footer-decode +
  * per-split scheduling, not row bytes, and it scales with file COUNT.
  *
  * Usage: graft.CompactBench [nFrag=2048] — prints one JSON line with
  * min-of-3 seconds per layout (interleaved passes, SkewBench
  * methodology).
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val nFrag = args.headOption.map(_.toInt).getOrElse(2048)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-compact-bench").toString
    val frag = s"$work/frag"
    val compacted = s"$work/compacted"
    spark.read.parquet(s"$srcDir/lineitem.parquet")
      .repartition(nFrag).write.parquet(frag)
    val stats = graft.lake.Compaction.compact(
      spark, frag, compacted, targetBytes = 64L << 20)

    def scanSec(path: String): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(path)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // one throwaway pass to settle codegen, then interleaved min-of-3
    scanSec(compacted); scanSec(frag)
    val passes = (0 until 3).map(_ => (scanSec(frag), scanSec(compacted)))
    val fragSec = passes.map(_._1).min
    val compSec = passes.map(_._2).min
    println(f"""{"metric":"compact_scan","n_frag":${stats.filesBefore},""" +
      f""""n_compacted":${stats.filesAfter},"bytes":${stats.bytesBefore},""" +
      f""""frag_sec":$fragSec%.2f,"compacted_sec":$compSec%.2f,""" +
      f""""speedup":${fragSec / compSec}%.1f}""")
    spark.stop()
  }
}
