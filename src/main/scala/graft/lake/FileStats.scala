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

  // Tree fingerprints: a deterministic digest (file count, total
  // bytes, max mtime) of the data tree a manifest was built over,
  // recorded as a `_tree_fp` sidecar beside every stats/Bloom manifest
  // so [[Routing]] can fail FAST on staleness — without it, files
  // landed after the build are silently excluded from routed reads AND
  // the manifest-derived full-scan fallback. Read-time cost is one
  // recursive listing: metadata-scale, already paid by un-indexed scans.

  /** One data file as the tree walk sees it: original (scheme-carrying)
    * path for I/O, scheme-normalized path for joins/sets (the form
    * `input_file_name` comparisons use), plus the (len, mtime) pair
    * that detects in-place content changes. */
  private[lake] final case class FileMeta(path: String, norm: String,
                                          len: Long, mtime: Long)

  private[lake] def normPath(s: String): String =
    s.replaceFirst("^[a-z][a-zA-Z0-9+.-]*:/+", "/")

  /** Recursive listing of the data files under `dataDir` (side files
    * with `_`/`.` prefixes excluded — the set a parquet scan reads). */
  private[lake] def walkTree(spark: SparkSession,
                             dataDir: String): Seq[FileMeta] = {
    val hp = new org.apache.hadoop.fs.Path(dataDir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer[FileMeta]()
    if (fs.exists(hp)) {
      val it = fs.listFiles(hp, true)
      while (it.hasNext) {
        val f = it.next()
        val nm = f.getPath.getName
        if (!nm.startsWith("_") && !nm.startsWith("."))
          out += FileMeta(f.getPath.toString, normPath(f.getPath.toString),
            f.getLen, f.getModificationTime)
      }
    }
    out.toSeq
  }

  /** ORDER-INDEPENDENT per-file digest (ADVICE r17): the old aggregate
    * (count, total bytes, max mtime) missed a same-size in-place
    * overwrite whose mtime did not advance past the tree max, and any
    * rename preserving count/bytes/mtime — stale bounds then silently
    * excluded files from routed reads, the exact hazard the gate
    * exists to prevent. Here every file's (normalized path, len,
    * mtime) hashes individually into 64 bits; SUM and XOR of the
    * per-file hashes commute, so listing order cannot matter, and any
    * single-file change moves both accumulators with overwhelming
    * probability. */
  private[lake] def fpOf(files: Seq[FileMeta]): String = {
    var sum = 0L; var xor = 0L
    files.foreach { m =>
      val h1 = scala.util.hashing.MurmurHash3.stringHash(
        s"${m.norm}|${m.len}|${m.mtime}")
      val h2 = scala.util.hashing.MurmurHash3.stringHash(
        s"${m.mtime}|${m.len}|${m.norm}", 0x9747b28c)
      val h64 = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      sum += h64; xor ^= h64
    }
    f"v2:${files.size}:$sum%016x:$xor%016x"
  }

  def treeFingerprint(spark: SparkSession, dataDir: String): String =
    fpOf(walkTree(spark, dataDir))

  private def fpPath(manifestDir: String) =
    new org.apache.hadoop.fs.Path(manifestDir, "_tree_fp")

  // ---- ATOMIC manifest publish (ADVICE r17): a refresh must never
  // delete the live manifest before its replacement is readable (the
  // old delete-then-rename left a crash window with NO manifest —
  // routing silently degrading to full scan — and a torn-listing
  // window for concurrent readers). Refreshed manifests land as a NEW
  // immutable `m<N>/` version INSIDE the manifest dir and readers
  // resolve through the `_mp` pointer file, flipped by the same
  // single-file rename-with-overwrite primitive [[Snapshot.publish]]
  // uses. The tree fingerprint lives INSIDE each version dir, so data
  // and freshness stamp flip together. Manifests built by
  // [[writeStats]]/[[BloomIndex.writeBloom]] stay flat (no pointer);
  // the resolver falls back to the dir itself, which also covers
  // [[DeleteWhere]]'s version-immutable maintained manifests.

  private val MPtr = "_mp"

  /** One reader for the tiny control files beside manifests (pointer,
    * fingerprint, pending-append marker) — three hand-rolled
    * open/read/close blocks had already grown (review r18). */
  private[lake] def readSidecar(fs: org.apache.hadoop.fs.FileSystem,
                                p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8"))
      finally in.close()
    }

  /** The directory holding the manifest's CURRENT parquet data: the
    * `_mp`-named version subdir when published through
    * [[publishManifest]], else the manifest dir itself (flat build).
    * Public — external consumers of a manifest must resolve through
    * this, never read the dir raw. */
  def resolveManifest(spark: SparkSession,
                      manifestDir: String): String = {
    val ptr = new org.apache.hadoop.fs.Path(manifestDir, MPtr)
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readSidecar(fs, ptr).map(n => s"$manifestDir/${n.trim}")
      .getOrElse(manifestDir)
  }

  /** The manifest's current parquet data as a frame — EVERY manifest
    * read goes through this, so a pointer flip is invisible to
    * consumers. */
  private[lake] def manifestDf(spark: SparkSession,
                               manifestDir: String): DataFrame =
    spark.read.parquet(resolveManifest(spark, manifestDir))

  /** Publish the next manifest version: `write` lands parquet into the
    * new immutable `m<N>` dir, `fp` is stamped inside it, then the
    * pointer flips atomically. The PREVIOUS version is retained (an
    * in-flight reader that resolved it keeps a valid path,
    * Snapshot-style); anything older — including flat legacy parquet
    * and the root-level fingerprint of the pre-pointer layout — is
    * collected. A crash before the flip leaves the old version live
    * and the tree fingerprint stale → loud, the fail-safe direction. */
  private[lake] def publishManifest(spark: SparkSession, manifestDir: String,
                                    fp: String)(write: String => Unit): Unit = {
    val dir = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = resolveManifest(spark, manifestDir)
    val curName = if (cur == manifestDir) None
      else Some(new org.apache.hadoop.fs.Path(cur).getName)
    val nextName = "m" + (curName.flatMap(_.stripPrefix("m").toLongOption)
      .map(_ + 1).getOrElse(0L))
    write(s"$manifestDir/$nextName")
    writeTreeFp(spark, s"$manifestDir/$nextName", fp)
    val tmp = new org.apache.hadoop.fs.Path(manifestDir, MPtr + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(nextName.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dir.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(manifestDir, MPtr),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // GC honors the retention promise on the FIRST flip too (review
    // r18): when the previous version was the FLAT layout, its parquet
    // files are the in-flight readers' "previous version" — retained
    // for this publish cycle (only stale m<N> dirs and the tmp pointer
    // collect); the NEXT publish, whose curName is a version dir,
    // sweeps the flat legacy files.
    fs.listStatus(dir).foreach { st =>
      val nm = st.getPath.getName
      val stale =
        if (curName.isDefined) nm != nextName && !curName.contains(nm) &&
          nm != MPtr
        else (nm.matches("m\\d+") && nm != nextName) || nm == MPtr + ".tmp"
      if (stale) fs.delete(st.getPath, true)
    }
  }

  /** Record `fp` beside the manifest at `manifestDir`. The fingerprint
    * must come from the SAME listing the build consumed — stamping a
    * listing taken AFTER the build would record files the build never
    * saw, and requireFresh would then pass on a manifest that is
    * missing them (the inverted-race hole a review found). With the
    * build's own listing, a file landing mid-build makes the read-time
    * fingerprint differ → loud, the fail-safe direction. The `_`
    * prefix keeps parquet readers of the manifest blind to the
    * sidecar. */
  private[lake] def writeTreeFp(spark: SparkSession, manifestDir: String,
                                fp: String): Unit = {
    val p = fpPath(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(fp.getBytes("UTF-8"))
    finally out.close()
  }

  /** Broadcastable (norm-path → len/mtime) frame of a listing, joined
    * onto manifest rows at build time so a later [[refreshStats]] can
    * detect IN-PLACE content changes (same path, different bytes) —
    * without it a path-set-only delta would "heal" the fingerprint
    * while keeping stale bounds. */
  private def metaDf(spark: SparkSession,
                     listing: Seq[FileMeta]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    listing.map(m => (m.norm, m.path, m.len, m.mtime))
      .toDF("_gf_norm", "_gf_orig", "f_len", "f_mtime")
  }

  /** Join the per-file (len, mtime) meta onto `stats` — FULL OUTER
    * against the listing, so a listed file that contributed NO stats
    * row (zero-row file) still gets a META-ONLY MARKER row (ADVICE
    * r17: without one, every later refresh classifies such files as
    * 'added' and rescans them forever, defeating the O(changed files)
    * contract). Marker rows carry `n_rows = 0` and NULL bounds — NULL
    * bounds never satisfy a prune predicate, so bounded reads skip the
    * file, correctly. */
  private def withFileMeta(stats: DataFrame,
                           listing: Seq[FileMeta]): DataFrame = {
    val spark = stats.sparkSession
    // no broadcast hint: full outer cannot build either side, and both
    // inputs are file-count-sized (manifest scale) — the shuffle is
    // metadata-priced at any table size
    stats.join(
        metaDf(spark, listing),
        regexp_replace(col("path"), "^[a-z][a-zA-Z0-9+.-]*:/+", "/") ===
          col("_gf_norm"), "full")
      .withColumn("path", coalesce(col("path"), col("_gf_orig")))
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .drop("_gf_norm", "_gf_orig")
  }

  /** The fingerprint recorded at build time, if any. */
  private[lake] def recordedTreeFp(spark: SparkSession,
                                   manifestDir: String): Option[String] = {
    val p = fpPath(manifestDir)
    readSidecar(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
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
    val rec = recordedTreeFp(spark,
      resolveManifest(spark, manifestDir)).getOrElse(
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
    // listing taken BEFORE the scan: the recorded fingerprint must
    // describe what the build could have seen (see writeTreeFp)
    val listing = walkTree(spark, dataDir)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(minName(c)), max(col(c)).as(maxName(c))))
    // pointer-published from DAY ONE (review r18): a flat first build
    // would make the first refresh a flat→pointer transition with a
    // mixed-depth window (a reader that resolved the flat dir pre-flip
    // and lists post-flip sees parquet at two depths); and a REBUILD
    // over a live manifest lands as the next version instead of
    // mode("overwrite")'s delete-then-write of the live dir.
    publishManifest(spark, statsDir, fpOf(listing)) { dest =>
      withFileMeta(
          spark.read.parquet(dataDir)
            .groupBy(input_file_name().as("path"))
            .agg(aggs.head, aggs.tail: _*),
          listing)
        .coalesce(1) // manifest is file-count-sized
        .write.mode("overwrite").parquet(dest)
    }
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
    * index covers). Returns (filesScanned, filesDropped).
    */
  def refreshStats(spark: SparkSession, dataDir: String,
                   statsDir: String): (Long, Long) = {
    val old = manifestDf(spark, statsDir)
    val cols = old.columns.collect {
      case c if c.startsWith("min_") => c.stripPrefix("min_")
    }.toSeq
    require(cols.nonEmpty, s"manifest at $statsDir indexes no columns")
    val listing = walkTree(spark, dataDir)
    val current = listing.map(m => m.norm -> m).toMap
    // the recorded per-file (len, mtime) detects IN-PLACE content
    // changes: same path, different bytes -> the file rescans like an
    // add (a path-set-only delta would "heal" the fingerprint while
    // keeping stale bounds). Manifests predating the meta columns
    // cannot certify their kept files - every kept file rescans
    // (one-time full-rebuild cost; the refreshed manifest then carries
    // the meta).
    val hasMeta = old.columns.contains("f_len")
    val oldMeta: Map[String, Option[(Long, Long)]] =
      old.select(Seq(col("path")) ++
          (if (hasMeta) Seq(col("f_len"), col("f_mtime")) else Nil): _*)
        .collect().map { r =>
          normPath(r.getString(0)) -> (if (hasMeta && !r.isNullAt(1))
            Some((r.getLong(1), r.getLong(2))) else None)
        }.toMap
    val oldNorm = oldMeta.keySet
    val changedNorm = oldNorm.intersect(current.keySet).filter { n =>
      val m = current(n)
      !oldMeta(n).contains((m.len, m.mtime))
    }
    val rescanNorm = (current.keySet -- oldNorm) ++ changedNorm
    val added = rescanNorm.toSeq.sorted.map(n => current(n).path)
    val droppedNorm = (oldNorm -- current.keySet) ++ changedNorm
    if (added.isEmpty && droppedNorm.isEmpty) {
      // nothing changed: restamp (covers pure mtime-of-dir drift) and go
      writeTreeFp(spark, resolveManifest(spark, statsDir), fpOf(listing))
      return (0L, 0L)
    }
    val kept = old.filter(!udfFreeNormIsIn(col("path"), droppedNorm))
      .drop("f_len", "f_mtime")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(minName(c)),
        max(col(c)).as(maxName(c))))
    val merged0 =
      if (added.isEmpty) kept
      else kept.unionByName(
        spark.read.parquet(added: _*)
          .groupBy(input_file_name().as("path"))
          .agg(aggs.head, aggs.tail: _*))
    val merged = withFileMeta(merged0, listing)
    // the manifest cannot be read and overwritten in one plan (and a
    // driver-side collect would not survive million-file manifests):
    // the merged manifest lands as the NEXT immutable version and the
    // pointer flips atomically — the live manifest is never deleted
    // before its replacement is readable (ADVICE r17)
    publishManifest(spark, statsDir, fpOf(listing)) { dest =>
      merged.coalesce(1).write.mode("overwrite").parquet(dest)
    }
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
    manifestDf(spark, statsDir)
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
                     bounds: Seq[(String, Column, Column)]): Seq[String] =
    prunedFilesOpt(spark, statsDir,
      bounds.map { case (c, lo, hi) => (c, Some(lo), Some(hi)) })

  /** [[prunedFilesAnd]] generalized to HALF-OPEN ranges (VERDICT r17
    * #1): a bound may carry only one end — `c >= lo` prunes files with
    * `max_c < lo`, `c <= hi` prunes `min_c > hi`. This is the
    * retention-scan shape (`ts >= cutoff`) that a closed-range-only
    * pruner full-scans; on a time-clustered 100 TB tree the one-sided
    * prune is the difference between opening last week's files and
    * opening all of history. Each bound needs at least one end. */
  def prunedFilesOpt(spark: SparkSession, statsDir: String,
                     bounds: Seq[(String, Option[Column], Option[Column])])
      : Seq[String] =
    manifestDf(spark, statsDir).filter(boundsIntersect(bounds))
      .select("path").collect().map(_.getString(0)).toSeq

  /** The zone-map intersection predicate over `min_<c>`/`max_<c>`
    * columns for (possibly half-open) `bounds` — ONE builder shared by
    * file-level ([[prunedFilesOpt]]) and bucket-level
    * ([[BucketStats.prunedBuckets]]) pruning, so the two pruners'
    * bound semantics can never diverge. NULL manifest bounds (all-NULL
    * column) never satisfy it. */
  private[lake] def boundsIntersect(
      bounds: Seq[(String, Option[Column], Option[Column])]): Column = {
    require(bounds.nonEmpty, "at least one pruning bound")
    bounds.map { case (c, lo, hi) =>
      require(lo.isDefined || hi.isDefined, s"bound on $c has no ends")
      (lo.map(col(maxName(c)) >= _).toSeq ++
        hi.map(col(minName(c)) <= _).toSeq).reduce(_ && _)
    }.reduce(_ && _)
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
    manifestDf(spark, statsDir).agg(aggs.head, aggs.tail: _*)
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
