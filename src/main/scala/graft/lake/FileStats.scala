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

  /** Deterministic fingerprint of the data tree a manifest was built
    * over: data-file count, total bytes, max modification time
    * (side files with `_`/`.` prefixes excluded — the same set a
    * parquet scan reads). Recorded as a `_tree_fp` sidecar beside
    * every stats/Bloom manifest at build time so [[Routing]] can fail
    * FAST on staleness: without it, files landed after the build are
    * excluded both from routed reads and from the manifest-derived
    * full-scan fallback — silently missing rows, the one failure the
    * docs promise cannot happen. Cost at read time is one recursive
    * listing, metadata-scale (and already paid by any un-indexed scan).
    */
  def treeFingerprint(spark: SparkSession, dataDir: String): String = {
    val hp = new org.apache.hadoop.fs.Path(dataDir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var n = 0L; var bytes = 0L; var maxM = 0L
    if (fs.exists(hp)) {
      val it = fs.listFiles(hp, true)
      while (it.hasNext) {
        val f = it.next()
        val nm = f.getPath.getName
        if (!nm.startsWith("_") && !nm.startsWith(".")) {
          n += 1; bytes += f.getLen
          if (f.getModificationTime > maxM) maxM = f.getModificationTime
        }
      }
    }
    s"v1:$n:$bytes:$maxM"
  }

  private def fpPath(manifestDir: String) =
    new org.apache.hadoop.fs.Path(manifestDir, "_tree_fp")

  /** Record the CURRENT fingerprint of `dataDir` beside the manifest
    * at `manifestDir`. Computed fresh (after the manifest lands), so a
    * tree mutated DURING the build mismatches at read time — fail-safe
    * in the racy direction. The `_` prefix keeps parquet readers of
    * the manifest itself blind to the sidecar. */
  private[lake] def writeTreeFp(spark: SparkSession, dataDir: String,
                                manifestDir: String): Unit = {
    val p = fpPath(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(treeFingerprint(spark, dataDir).getBytes("UTF-8"))
    finally out.close()
  }

  /** The fingerprint recorded at build time, if any. */
  private[lake] def recordedTreeFp(spark: SparkSession,
                                   manifestDir: String): Option[String] = {
    val p = fpPath(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }
  }

  /** Fail-fast freshness gate (ADVICE r16, medium): the manifest at
    * `manifestDir` must carry a fingerprint matching the CURRENT state
    * of `dataDir`. Mirrors [[SecondaryIndex]]'s table-vs-index tag
    * parity — a stale index yields a LOUD failure naming the fix, not
    * silently missing rows. Manifests predating the fingerprint (no
    * sidecar) also fail: their freshness is unknowable. */
  def requireFresh(spark: SparkSession, dataDir: String,
                   manifestDir: String,
                   currentFp: Option[String] = None): Unit = {
    val rec = recordedTreeFp(spark, manifestDir).getOrElse(
      throw new IllegalStateException(
        s"manifest at $manifestDir carries no tree fingerprint — " +
          s"rebuild it (Routing.indexStats / indexBloom) over $dataDir"))
    // callers checking several manifests of ONE tree pass the
    // fingerprint once — the recursive listing is metadata-scale but
    // not free at millions of files
    val cur = currentFp.getOrElse(treeFingerprint(spark, dataDir))
    if (rec != cur) throw new IllegalStateException(
      s"manifest at $manifestDir is STALE: built over tree state $rec, " +
        s"data tree at $dataDir is now $cur — rebuild the index before " +
        "routing reads through it (a stale manifest would silently " +
        "exclude files added after the build)")
  }

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
    writeTreeFp(spark, dataDir, statsDir)
  }

  /** INCREMENTAL stats refresh — the companion of the freshness
    * fail-fast: a stale manifest is LOUD ([[requireFresh]]), and
    * re-freshing it costs the DELTA, not the table. Files added since
    * the build are scanned (only them); rows for vanished files drop;
    * everything else carries verbatim. At 100 TB a full
    * [[writeStats]] re-scan per ingest cycle would negate the index's
    * economics — this is O(changed files), driven by the same listing
    * the fingerprint already takes. The indexed column set is the
    * MANIFEST's own (a refresh can never silently change what the
    * index covers). Returns (filesScanned, rowsDropped).
    */
  def refreshStats(spark: SparkSession, dataDir: String,
                   statsDir: String): (Long, Long) = {
    val old = spark.read.parquet(statsDir)
    val cols = old.columns.collect {
      case c if c.startsWith("min_") => c.stripPrefix("min_")
    }.toSeq
    require(cols.nonEmpty, s"manifest at $statsDir indexes no columns")
    def norm(s: String) = s.replaceFirst("^[a-z][a-zA-Z0-9+.-]*:/+", "/")
    // current tree listing — the same walk the fingerprint takes
    val hp = new org.apache.hadoop.fs.Path(dataDir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // normalized form ONLY for set comparison; reads keep the original
    // scheme-carrying path (stripping it would break non-local FSes)
    val current = scala.collection.mutable.Map[String, String]() // norm -> orig
    if (fs.exists(hp)) {
      val it = fs.listFiles(hp, true)
      while (it.hasNext) {
        val f = it.next()
        val nm = f.getPath.getName
        if (!nm.startsWith("_") && !nm.startsWith("."))
          current(norm(f.getPath.toString)) = f.getPath.toString
      }
    }
    val oldPaths = old.select("path").collect().map(_.getString(0))
    val oldNorm = oldPaths.map(norm).toSet
    val added = (current.keySet -- oldNorm).toSeq.sorted.map(current)
    val droppedNorm = oldNorm -- current.keySet
    val kept = old.filter(!udfFreeNormIsIn(col("path"), droppedNorm))
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(minName(c)),
        max(col(c)).as(maxName(c))))
    val merged =
      if (added.isEmpty) kept
      else kept.unionByName(
        spark.read.parquet(added: _*)
          .groupBy(input_file_name().as("path"))
          .agg(aggs.head, aggs.tail: _*))
    // staged swap (the manifest cannot be read and overwritten in one
    // plan, and a driver-side collect would not survive million-file
    // manifests): write the merged manifest beside, then swap dirs
    val staging = new org.apache.hadoop.fs.Path(statsDir + "-refresh")
    val target = new org.apache.hadoop.fs.Path(statsDir)
    val mfs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    merged.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    if (!mfs.delete(target, true) || !mfs.rename(staging, target))
      throw new java.io.IOException(
        s"stats refresh swap failed for $statsDir — rebuild via writeStats")
    writeTreeFp(spark, dataDir, statsDir)
    (added.size.toLong, droppedNorm.size.toLong)
  }

  /** scheme-normalized membership test as a Column (no UDF). */
  private def udfFreeNormIsIn(c: Column, normSet: Set[String]): Column =
    if (normSet.isEmpty) lit(false)
    else regexp_replace(c, "^[a-z][a-zA-Z0-9+.-]*:/+", "/")
      .isInCollection(normSet.toSeq)

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
