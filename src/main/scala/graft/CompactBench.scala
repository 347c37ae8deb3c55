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

    // ---- 50-batch streaming table: fragment ingest + bucket-granular
    // compaction vs the rewrite-per-batch upsert (VERDICT r15 #3).
    // Write amplification is the quantity: applyBatch re-reads and
    // re-writes every touched bucket per batch; appendFragment writes
    // the batch.
    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(x => dirBytes(x.getPath)).sum).getOrElse(0L)
    }
    val nBuckets = 64; val batches = 50; val rowsPerBatch = 20000L
    def batchDf(t: Int) = spark.range(0, rowsPerBatch)
      .select((hash(col("id"), lit(t)).cast("long").bitwiseAND(lit(Long.MaxValue))
        % 1000000L).as("k"),
        lit(t.toLong).as("ver"),
        concat(lit("p"), col("id"), lit("x" * 60)).as("payload"))
    val fragRoot = s"$work/stream-frag"; val upsRoot = s"$work/stream-ups"
    // write amplification: CUMULATIVE bytes landed per regime (each
    // batch's fresh version dir, summed before GC can rotate it out)
    var fragWritten = 0L; var upsWritten = 0L
    val tF0 = System.nanoTime()
    for (t <- 1 to batches) {
      graft.lake.BucketedUpsert.appendFragment(batchDf(t), fragRoot, "k",
        nBuckets, t.toLong)
      fragWritten += dirBytes(s"$fragRoot/data/v$t")
    }
    val fragIngestSec = (System.nanoTime() - tF0) / 1e9
    val tU0 = System.nanoTime()
    for (t <- 1 to batches) {
      graft.lake.BucketedUpsert.applyBatch(batchDf(t), upsRoot, "k", "ver",
        nBuckets, t.toLong)
      upsWritten += dirBytes(s"$upsRoot/data/v$t")
    }
    val upsIngestSec = (System.nanoTime() - tU0) / 1e9
    def resolvedSec(): Double = {
      val t0 = System.nanoTime()
      graft.lake.BucketedUpsert.readResolved(spark, fragRoot, "k", "ver")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val readFragmented = resolvedSec()
    val tC0 = System.nanoTime()
    val nMerged = graft.lake.BucketedUpsert.mergeFragments(spark, fragRoot,
      "k", "ver", tag = 1000)
    val compactSec = (System.nanoTime() - tC0) / 1e9
    val readCompacted = resolvedSec()
    val nRows = graft.lake.BucketedUpsert.readResolved(spark, fragRoot, "k", "ver").count()
    require(nRows == graft.lake.BucketedUpsert.read(spark, upsRoot).count(),
      "fragment and rewrite regimes disagree")
    println(f"""{"metric":"fragment_stream","batches":$batches,""" +
      f""""rows_per_batch":$rowsPerBatch,"n_buckets":$nBuckets,""" +
      f""""frag_ingest_sec":$fragIngestSec%.1f,"upsert_ingest_sec":$upsIngestSec%.1f,""" +
      f""""frag_written_mb":${fragWritten / 1e6}%.1f,"upsert_written_mb":${upsWritten / 1e6}%.1f,""" +
      f""""read_fragmented_sec":$readFragmented%.2f,"buckets_compacted":$nMerged,""" +
      f""""compact_sec":$compactSec%.2f,"read_compacted_sec":$readCompacted%.2f}""")
    spark.stop()
  }
}
