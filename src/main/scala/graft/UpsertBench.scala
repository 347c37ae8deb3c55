package graft

import graft.lake.{BucketedUpsert, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed- vs full-rewrite upsert cost (VERDICT r14 #4): builds a
  * standing keyed table, applies update batches of varying key counts
  * through both paths, and measures per-batch wall time and bytes
  * written. The law being demonstrated: a batch of b random keys over n
  * buckets touches ~n·(1-(1-1/n)^b) ≤ min(b, n) buckets, so the
  * bucketed write cost is that fraction of the table instead of 1.0 —
  * the sizing rule is n >> typical batch key count (the 100 TB shape:
  * 65k buckets, thousand-key batches → ~1.5% of the table rewritten).
  *
  * Usage: graft.UpsertBench [nRows] [nBuckets] — one JSON line.
  */
object UpsertBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nBuckets = args.drop(1).headOption.map(_.toInt).getOrElse(512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("upsert-bench").toString

    def dirBytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(dir))
    }
    // ~100 B payload per row so bytes, not row overhead, dominate
    def rows(ids: org.apache.spark.sql.DataFrame, version: Long) = ids
      .select(col("id").as("k"), lit(version).as("version"),
        concat(lit("p"), col("id"), lit("x" * 90)).as("payload"))

    val base = rows(spark.range(0, nRows).toDF("id"), 1L)
    val flat = s"$work/flat"; val bkt = s"$work/bkt"
    Snapshot.publish(base, flat, 0)
    BucketedUpsert.applyBatch(base, bkt, "k", "version", nBuckets, 0)
    val tableBytes = dirBytes(s"$bkt/data/v0")

    var tag = 0L
    val results = Seq(10, 100, 1000, 10000).map { b =>
      tag += 1
      val batch = rows(spark.range(0, b.toLong)
        .select((hash(col("id"), lit(tag)).cast("long").bitwiseAND(lit(Long.MaxValue)) % nRows).as("id")),
        tag + 1)
      // full rewrite: the SHIPPED streamingUpsert per-batch body
      val t0 = System.nanoTime()
      graft.streaming.EventStreams.upsertBatch(batch, "k", "version", flat, tag)
      val flatSec = (System.nanoTime() - t0) / 1e9
      val flatBytes = dirBytes(s"$flat/v$tag")
      // bucketed: touched buckets only
      val t1 = System.nanoTime()
      BucketedUpsert.applyBatch(batch, bkt, "k", "version", nBuckets, tag)
      val bktSec = (System.nanoTime() - t1) / 1e9
      val bktBytes = dirBytes(s"$bkt/data/v$tag")
      val touched = new java.io.File(s"$bkt/data/v$tag").listFiles()
        .count(_.getName.startsWith("graft_bucket="))
      f"""{"batch_keys":$b,"touched_buckets":$touched,"flat_sec":$flatSec%.2f,"flat_bytes":$flatBytes,"bkt_sec":$bktSec%.2f,"bkt_bytes":$bktBytes,"bytes_ratio":${bktBytes.toDouble / flatBytes}%.4f}"""
    }
    println(s"""{"metric":"upsert_bench","rows":$nRows,"n_buckets":$nBuckets,"table_bytes":$tableBytes,"batches":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
