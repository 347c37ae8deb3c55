package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the lake-maintenance primitive behind
  * OPTIMIZE/rewrite_data_files in the table formats. Streaming ingest
  * and per-task writers leave a table as thousands of KB-scale files;
  * at 100 TB the scan cost of that layout is dominated by file-open +
  * footer-decode + scheduler overhead per file, not by row bytes, and
  * the driver's file index grows with file COUNT. Compaction rewrites
  * the data into ~targetBytes files so scans return to being
  * bandwidth-bound.
  *
  * Two modes, per the classic tradeoff:
  *  - `even = false` (default): `coalesce` — NO shuffle; each output
  *    task concatenates whole input partitions. The cheapest rewrite,
  *    but output sizes inherit input unevenness (adjacent-merge).
  *  - `even = true`: round-robin `repartition` — one full shuffle,
  *    near-identical output sizes. Worth it when the table is also
  *    size-skewed, or downstream consumers assume uniform splits.
  *
  * Byte accounting is ONE driver metadata call (`getContentSummary`),
  * not a per-file status RPC — at lake scale the file count is exactly
  * what is pathological, so the stats path must not be O(files) on the
  * driver. Partitioned trees compact per partition directory (apply
  * this to each leaf dir); hive-partition columns would otherwise be
  * lost by the flat rewrite.
  */
object Compaction {

  /** before/after layout facts, for monitoring and for specs. */
  final case class Stats(filesBefore: Int, bytesBefore: Long, filesAfter: Int)

  /** Rewrite the parquet table at `inPath` into `outPath` with file
    * sizes targeting `targetBytes` (pre-compression on-disk bytes of
    * the INPUT as the sizing basis). Returns layout stats.
    *
    * The ceil(bytes/target) output count holds when compacting
    * (nOut <= input files); if the target asks for MORE files than the
    * input has partitions, `coalesce` leaves partitioning unchanged —
    * use `even = true` (repartition) to split a too-coarse table
    * upward.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20, even: Boolean = false): Stats = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val fs = new Path(inPath).getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(new Path(inPath)).getLength
    val df = spark.read.parquet(inPath)
    val nBefore = df.inputFiles.length
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val rewritten = if (even) df.repartition(nOut) else df.coalesce(nOut)
    rewritten.write.mode("overwrite").parquet(outPath)
    Stats(nBefore, bytes, spark.read.parquet(outPath).inputFiles.length)
  }

  /** Compact a hive-partitioned tree: each LEAF partition directory is
    * rewritten independently into `outPath` under the same relative
    * partition path, so partition columns (which live in the directory
    * names) survive and per-partition file counts return to
    * ceil(bytes/target). The tree walk is a driver-side recursion over
    * partition METADATA — the thing that is small even at 100 TB; the
    * data rewrite inside each leaf is `compact` (distributed). Returns
    * (relative partition path → stats) for monitoring.
    */
  def compactTree(spark: SparkSession, inPath: String, outPath: String,
                  targetBytes: Long = 128L << 20, even: Boolean = false): Seq[(String, Stats)] = {
    val root = new Path(inPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def leaves(p: Path): Seq[Path] = {
      val st = fs.listStatus(p)
      if (st.exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))) Seq(p)
      else st.filter(_.isDirectory).toSeq.flatMap(d => leaves(d.getPath))
    }
    // qualify the root FIRST: listStatus returns fully-qualified leaf
    // paths, so a relative inPath would never strip and the partition
    // dirs would silently re-root under a mangled prefix
    val rootUri = fs.makeQualified(root).toUri.getPath.stripSuffix("/")
    leaves(root).map { leaf =>
      val rel = leaf.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      rel -> compact(spark, leaf.toString, s"$outPath/$rel", targetBytes, even)
    }
  }
}
