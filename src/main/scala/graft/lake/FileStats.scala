package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Zone maps for a plain-parquet tree: a per-FILE min/max stats
  * manifest and a reader that skips every file whose range cannot
  * contain the predicate. This is the query-side payoff of the
  * clustered layouts the lake already writes ([[ZOrder]] makes every
  * file's range narrow on BOTH curve dimensions; a plain sort makes the
  * leading column narrow) — without it, a range query still opens every
  * file and only the row-group footer check saves work, which at 100 TB
  * is millions of object-store GETs for files that were never
  * candidates. With it, file listing cost drops to one manifest read
  * (file-count-sized, metadata-scale) and the scan reads only
  * intersecting files.
  *
  * The stats build is ONE distributed scan of the columns being
  * indexed, grouped by `input_file_name` — partial aggregation makes
  * the shuffle file-count-sized. Rebuild after layout changes
  * (compaction, z-order rewrite); the manifest names files, so a stale
  * manifest fails loudly on read rather than silently dropping rows.
  *
  * Pruning is necessary-not-sufficient: a surviving file may still hold
  * no matching row, so [[prunedRead]] RE-APPLIES the predicate — file
  * skipping is an optimization, never a semantic filter.
  */
object FileStats {

  private def minName(c: String) = s"min_$c"
  private def maxName(c: String) = s"max_$c"

  /** Scan the parquet tree at `dataDir` once and write a stats manifest
    * `(path, n_rows, min_<c>, max_<c>…)` for `cols` to `statsDir`. Min
    * and max keep each column's native type, so pruning compares in the
    * column's own ordering (no string/number coercion surprises).
    */
  def writeStats(spark: SparkSession, dataDir: String, statsDir: String,
                 cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "at least one column to index")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(minName(c)), max(col(c)).as(maxName(c))))
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1) // manifest is file-count-sized
      .write.mode("overwrite").parquet(statsDir)
  }

  /** The manifest paths whose [min,max] on `column` intersects
    * [lo, hi] — the files a range query must read. Null bounds (an
    * all-null file) never intersect. */
  def prunedFiles(spark: SparkSession, statsDir: String, column: String,
                  lo: Column, hi: Column): Seq[String] =
    spark.read.parquet(statsDir)
      .filter(col(maxName(column)) >= lo && col(minName(column)) <= hi)
      .select("path").collect().map(_.getString(0)).toSeq

  /** Range read through the manifest: open only files that can contain
    * `column` in [lo, hi], then re-apply the exact predicate. Falls
    * back to an empty frame with the table schema when nothing
    * intersects. */
  def prunedRead(spark: SparkSession, dataDir: String, statsDir: String,
                 column: String, lo: Column, hi: Column): DataFrame =
    prunedReadAnd(spark, dataDir, statsDir, Seq((column, lo, hi)))

  /** CONJUNCTIVE pruning: the manifest paths whose range intersects
    * EVERY (column, lo, hi) bound — a file skippable on ANY dimension
    * is skipped. This is where a z-ordered layout pays in full: each
    * z-block is narrow on BOTH curve dimensions, so a 2D predicate
    * multiplies the two dimensions' skip rates instead of taking the
    * weaker one. */
  def prunedFilesAnd(spark: SparkSession, statsDir: String,
                     bounds: Seq[(String, Column, Column)]): Seq[String] = {
    require(bounds.nonEmpty, "at least one pruning bound")
    val pred = bounds.map { case (c, lo, hi) =>
      col(maxName(c)) >= lo && col(minName(c)) <= hi
    }.reduce(_ && _)
    spark.read.parquet(statsDir).filter(pred)
      .select("path").collect().map(_.getString(0)).toSeq
  }

  /** METADATA-ONLY aggregate: global count / min / max answered purely
    * from the stats manifest, zero data files opened. Exact because
    * the per-file stats are exact: count(*) = Σ n_rows, global min =
    * min of file minima (NULL-only files carry NULL bounds and drop
    * out of min/max, matching SQL aggregate semantics). The 100 TB
    * payoff: "how many rows / what's the key range of this table" is
    * a manifest read — the question every planner, pipeline monitor,
    * and sanity check asks first, answered without touching the data.
    * The manifest must be current (rebuild after writes), same staleness
    * contract as pruning.
    */
  def aggFromStats(spark: SparkSession, statsDir: String,
                   cols: Seq[String]): DataFrame = {
    // count over an empty manifest is 0, as count(*) would be — never
    // NULL; min/max legitimately stay NULL there
    val aggs = coalesce(sum(col("n_rows")), lit(0L)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(minName(c))).as(minName(c)),
        max(col(maxName(c))).as(maxName(c))))
    spark.read.parquet(statsDir).agg(aggs.head, aggs.tail: _*)
  }

  /** Multi-bound range read: open only files surviving every bound,
    * then re-apply the exact conjunctive predicate. */
  def prunedReadAnd(spark: SparkSession, dataDir: String, statsDir: String,
                    bounds: Seq[(String, Column, Column)]): DataFrame = {
    val files = prunedFilesAnd(spark, statsDir, bounds)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).limit(0)
      else spark.read.parquet(files: _*)
    val pred = bounds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    base.filter(pred)
  }
}
