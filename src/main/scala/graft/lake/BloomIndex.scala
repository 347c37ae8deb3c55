package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-FILE Bloom filters for a plain-parquet tree — the pruning axis
  * [[FileStats]] zone maps cannot serve: EQUALITY lookup on a
  * high-cardinality column with no clustered layout. A zone map skips
  * on ranges, so on an unsorted id column every file's [min,max] spans
  * the domain and nothing prunes; the Bloom index answers "which files
  * can contain THIS key" probabilistically, with false positives only
  * (a re-applied exact predicate makes them harmless) and NO false
  * negatives — missing a file would drop rows, so the index is sized
  * and hashed deterministically and verified by spec.
  *
  * Layout: relational, not opaque — one manifest row per (file, 64-bit
  * word) that has any bit set: `(path, w, bits)` plus the filter
  * parameters `(m_log2, k)` on every row so a probe with mismatched
  * params fail-fasts instead of silently false-negating. At
  * m=2^16 bits a file's filter is ≤1024 rows / 8 KB — for a million
  * 100 MB files that is a ~8 GB manifest, metadata-scale next to
  * 100 TB, and the probe reads only the k words each value hashes to.
  *
  * Build is ONE distributed scan: k md5-derived positions per row
  * (computed map-side), distinct per (file, position) with partial
  * aggregation, then bit_or into words. Probe hashes the SAME md5
  * math on the JVM driver side (probe-set-sized work), so build and
  * probe agree bit-for-bit — BloomIndexSpec pins the two paths equal.
  *
  * The column is hashed through its canonical STRING form (how Spark
  * casts it); probes take the same textual form, exact for integral
  * ids. Rebuild after layout changes, like the zone-map manifest.
  */
object BloomIndex {

  /** k distinct bit positions for a value — Spark side (build). */
  private[lake] def posArray(v: org.apache.spark.sql.Column, mLog2: Int, k: Int) =
    array_distinct(array((0 until k).map(i =>
      conv(substring(md5(concat(v, lit("#" + i))), 1, 15), 16, 10)
        .cast("long") % (1L << mLog2)): _*))

  /** The same k positions — JVM side (probe). MD5 of the identical
    * UTF-8 bytes, same 15-hex-char prefix, same modulus. */
  private[lake] def positions(value: String, mLog2: Int, k: Int): Seq[Long] =
    (0 until k).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((value + "#" + i).getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % (1L << mLog2)
    }.distinct

  /** Build the Bloom manifest for `column` over the tree at `dataDir`.
    * NULLs are not indexed (an equality probe can never be NULL). */
  def writeBloom(spark: SparkSession, dataDir: String, bloomDir: String,
                 column: String, mLog2: Int = 16, k: Int = 3): Unit = {
    require(mLog2 >= 6 && mLog2 <= 30, s"mLog2 out of range: $mLog2")
    require(k >= 1 && k <= 8, s"k out of range: $k")
    // listing BEFORE the scan: the recorded fingerprint must describe
    // what the build could have seen (FileStats.writeTreeFp rationale).
    // Pointer-published from day one, like writeStats — no flat→pointer
    // transition window, atomic rebuilds.
    val listing = FileStats.walkTree(spark, dataDir)
    FileStats.publishManifest(spark, bloomDir, FileStats.fpOf(listing)) {
      dest =>
        filterRows(spark, dataDir, column, mLog2, k, listing)
          .write.mode("overwrite").parquet(dest)
    }
  }

  /** The manifest rows for `paths`-restricted (or full-tree) builds:
    * per-(file, word) filter bits plus the build params and the
    * per-file (len, mtime) meta [[refreshBloom]] uses to certify kept
    * files against in-place content changes. */
  /** `covered` is EXACTLY the files this build scans (the full listing
    * for a build, the added subset for a refresh): the meta join is
    * FULL OUTER against it, so a covered file that contributed no
    * filter row (all-NULL indexed column) still gets a META-ONLY
    * MARKER row — `w`/`bits` NULL, params and (len, mtime) real.
    * Without it, every later refresh classified such files as 'added'
    * and rescanned them forever (ADVICE r17). Probes are blind to
    * markers (they filter on `w`); refreshes certify them as kept. */
  private def filterRows(spark: SparkSession, source: String, column: String,
                         mLog2: Int, k: Int,
                         covered: Seq[FileStats.FileMeta],
                         paths: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val base = if (paths.isEmpty) spark.read.parquet(source)
               else spark.read.parquet(paths: _*)
    val meta = covered.map(m => (m.norm, m.path, m.len, m.mtime))
      .toDF("_gf_norm", "_gf_orig", "f_len", "f_mtime")
    base
      .filter(col(column).isNotNull)
      .select(input_file_name().as("path"),
        explode(posArray(col(column).cast("string"), mLog2, k)).as("pos"))
      // no distinct: bit_or is idempotent and the groupBy's partial
      // aggregation collapses duplicates map-side — a pre-distinct
      // would only add a second full shuffle of the exploded pairs
      .groupBy(col("path"), (col("pos") / 64).cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))")
        .as("bits"))
      .withColumn("m_log2", lit(mLog2)).withColumn("k", lit(k))
      // per-file meta columns: constant per path, dictionary/RLE-encoded
      // to near-zero bytes by parquet. No broadcast hint: full outer
      // cannot build either side, and both inputs are manifest-sized
      .join(meta,
        regexp_replace(col("path"), FileStats.SchemeRe, "/") ===
          col("_gf_norm"), "full")
      .withColumn("path", coalesce(col("path"), col("_gf_orig")))
      .withColumn("m_log2", coalesce(col("m_log2"), lit(mLog2)))
      .withColumn("k", coalesce(col("k"), lit(k)))
      .drop("_gf_norm", "_gf_orig")
      // NOT coalesced to one file: the manifest scales with FILE COUNT
      // (unlike the bucket-bounded index manifests), and a single-task
      // write would serialize the bit_or of a million files' words
      // through one executor; probes filter by word, so a multi-file
      // manifest costs readers nothing
  }

  /** Build a Bloom manifest over an EXPLICIT path list (files or
    * directories) — the immutable-version shape ([[DeleteWhere]]): the
    * caller's own manifest is the truth about membership, so no
    * refresh applies; a version's index is built once and lives
    * exactly as long as the version.
    *
    * ATOMIC (ADVICE r18, medium): the build lands through
    * [[FileStats.publishManifest]] — staged write, rename, pointer
    * flip — so a crash mid-build can never leave a torn index whose
    * missing word rows silently exclude files from reads. Consumers
    * gate on the POINTER ([[FileStats.isPublished]]), not on directory
    * existence: no pointer → the index does not exist yet. The
    * recorded fingerprint digests the covered files (diagnostic only —
    * the version is immutable, so no freshness gate consults it). */
  def writeBloomFiles(spark: SparkSession, paths: Seq[String],
                      bloomDir: String, column: String,
                      mLog2: Int = 16, k: Int = 3): Unit = {
    require(mLog2 >= 6 && mLog2 <= 30, s"mLog2 out of range: $mLog2")
    require(k >= 1 && k <= 8, s"k out of range: $k")
    require(paths.nonEmpty, "at least one path to index")
    val conf = spark.sparkContext.hadoopConfiguration
    val covered = paths.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.getFileStatus(hp).isDirectory) FileStats.walkTree(spark, p)
      else {
        val st = fs.getFileStatus(hp)
        Seq(FileStats.FileMeta(p, FileStats.normPath(p), st.getLen,
          st.getModificationTime))
      }
    }
    FileStats.publishManifest(spark, bloomDir, FileStats.fpOf(covered)) {
      dest =>
        filterRows(spark, paths.head, column, mLog2, k, covered,
          paths = paths).write.mode("overwrite").parquet(dest)
    }
  }

  /** INCREMENTAL Bloom refresh — same delta contract as
    * [[FileStats.refreshStats]]: only files added since the build are
    * scanned (their filter rows APPEND to the relational manifest);
    * rows for vanished files are dropped via a staged rewrite of the
    * manifest (metadata-scale) that only runs when something vanished.
    * Filter parameters are the MANIFEST's own — a refresh can never
    * silently mix hash geometries (the mixed-params fail-fast in
    * [[survivors]] is the backstop). Returns (filesScanned,
    * filesDropped).
    */
  private def pendingPath(bloomDir: String) =
    new org.apache.hadoop.fs.Path(bloomDir, "_pending_append")

  /** Data-file norms named by an interrupted append-only refresh (the
    * crash-heal guard below), empty when none is pending. */
  private def pendingAppend(fs: org.apache.hadoop.fs.FileSystem,
                            bloomDir: String): Set[String] =
    FileStats.readSidecar(fs, pendingPath(bloomDir))
      .map(_.linesIterator.map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  def refreshBloom(spark: SparkSession, dataDir: String,
                   bloomDir: String, column: String): (Long, Long) = {
    val params = FileStats.localDistinct(FileStats.manifestDf(spark, bloomDir)
      .select("m_log2", "k")).collect()
    require(params.length == 1,
      s"bloom index at $bloomDir mixes filter params " +
        s"${params.mkString(",")} - rebuild it")
    val (mLog2, k) = (params.head.getInt(0), params.head.getInt(1))
    val listing = FileStats.walkTree(spark, dataDir)
    val bfs = new org.apache.hadoop.fs.Path(bloomDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash-heal guard (review r18): an interrupted APPEND may have
    // landed a SUBSET of a new file's word rows — with correct
    // (len, mtime) meta, so a naive rerun would certify the file as
    // kept and its incomplete filter would silently FALSE-NEGATE (the
    // one failure the index forbids). The append branch records its
    // target norms in `_pending_append` first; a rerun that finds the
    // marker treats those norms as suspect — dropped and rescanned
    // through the atomic staged publish.
    val suspect = pendingAppend(bfs, bloomDir)
    // per-file (len, mtime) recorded at build time certifies kept files
    // against IN-PLACE content changes; manifests predating the meta
    // columns rescan every kept file once (then carry meta). The
    // classification is a distributed join ([[FileStats.deltaOf]],
    // VERDICT r18 #2) over the manifest's DISTINCT per-file rows —
    // only the delta reaches the driver.
    val oldDf = FileStats.manifestDf(spark, bloomDir)
    // localDistinct (r21): a localized manifest dedupes driver-side,
    // which also keeps the input a LocalRelation so deltaOf's
    // pure-driver classification applies (a .distinct() Aggregate
    // forced it back onto the distributed full-outer join)
    val (added, dropped) = FileStats.deltaOf(spark,
      FileStats.localDistinct(oldDf.select(Seq(col("path")) ++
        (if (oldDf.columns.contains("f_len"))
           Seq(col("f_len"), col("f_mtime")) else Nil): _*)),
      listing, suspect)
    val addedNorm = added.map(FileStats.normPath).toSet
    val addedCovered = listing.filter(m => addedNorm.contains(m.norm))
    val fp = FileStats.fpOf(listing)
    if (dropped.nonEmpty) {
      // files vanished: the surviving rows (plus the added files' new
      // rows) land as the NEXT immutable manifest version and the
      // pointer flips atomically — the live manifest is never deleted
      // before its replacement is readable (ADVICE r17)
      FileStats.publishManifest(spark, bloomDir, fp) { dest =>
        oldDf
          .filter(!regexp_replace(col("path"), FileStats.SchemeRe, "/")
            .isInCollection(dropped.toSeq))
          .write.mode("overwrite").parquet(dest)
        if (added.nonEmpty)
          filterRows(spark, dataDir, column, mLog2, k, addedCovered,
            paths = added).write.mode("append").parquet(dest)
      }
    } else if (added.nonEmpty) {
      // append-only churn: new files' rows APPEND into the live
      // version (no existing row is touched). The pending marker lands
      // FIRST: a crash mid-append leaves the stamp stale (→ routed
      // reads fail loud) AND the marker naming the suspect files, so
      // the healing rerun rescans them instead of certifying a
      // partially-appended filter (silent false negatives).
      //
      // CONTRACT (ADVICE r18): this branch makes Bloom version dirs
      // APPEND-MUTABLE — a deliberate exception to publishManifest's
      // version-immutability, because rewriting the whole relational
      // manifest per ingest cycle would cost O(files × words) where
      // the append costs O(batch). The exposure is bounded: appends
      // only ADD rows for NEW data files, never touch existing rows,
      // so a reader that resolved the version mid-append sees a torn
      // listing ONLY for files it could not have known about. Routed
      // reads re-validate through the tree fingerprint (stale until
      // the append completes → loud); DIRECT survivors/prunedReadIn
      // callers must not run concurrently with refreshBloom of the
      // same index — the same single-maintainer window the compaction
      // path documents (BucketedUpsert.mergeFragmentsIfNeeded).
      val out = bfs.create(pendingPath(bloomDir), true)
      try out.write(addedNorm.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      val dest = FileStats.resolveManifest(spark, bloomDir)
      filterRows(spark, dataDir, column, mLog2, k, addedCovered,
        paths = added).write.mode("append").parquet(dest)
      FileStats.writeTreeFp(spark, dest, fp)
    } else
      FileStats.writeTreeFp(spark,
        FileStats.resolveManifest(spark, bloomDir), fp)
    // the marker clears LAST in every branch — publish/stamp complete
    bfs.delete(pendingPath(bloomDir), false)
    (added.size.toLong, dropped.size.toLong)
  }

  /** The words `values` hash to — the only manifest rows a probe reads. */
  private[lake] def wantedWords(values: Seq[String], mLog2: Int,
                                k: Int): Seq[Int] =
    values.flatMap(v => positions(v, mLog2, k)).map(p => (p / 64).toInt).distinct

  /** Shared probe core for both the file-keyed and bucket-keyed index:
    * given the collected (entity, word) → bits slice, the entities
    * whose filter admits at least one of `values` (every position of
    * some value set). One implementation — the bit test of the two
    * indexes can never diverge. */
  private[lake] def admittedEntities[K](words: Map[(K, Int), Long],
                                        values: Seq[String], mLog2: Int,
                                        k: Int): Seq[K] = {
    val perValue = values.map(v => positions(v, mLog2, k))
    val entities = words.keys.map(_._1).toSeq.distinct
    entities.filter(e => perValue.exists(ps => ps.forall { pos =>
      (words.getOrElse((e, (pos / 64).toInt), 0L) & (1L << (pos % 64))) != 0L
    }))
  }

  /** The files that may contain ANY of `values` (union of per-value
    * survivors). No false negatives; false positives are filtered by
    * the re-applied predicate in [[prunedReadIn]]. */
  def survivors(spark: SparkSession, bloomDir: String,
                values: Seq[String]): Seq[String] = {
    require(values.nonEmpty, "at least one probe value")
    // mixed params in one manifest (two interrupted writeBloom runs with
    // different settings) would be probed with one row's params and
    // silently false-negate — the one failure the index forbids. Same
    // uniformity check as SecondaryIndex.lookupBuckets; distinct is
    // manifest-sized (metadata).
    val meta = FileStats.localDistinct(FileStats.manifestDf(spark, bloomDir)
      .select("m_log2", "k")).collect()
    if (meta.isEmpty) return Seq.empty // empty table indexed → no files
    require(meta.length == 1,
      s"bloom index at $bloomDir mixes filter params " +
        s"${meta.mkString(",")} — rebuild it")
    val (mLog2, k) = (meta.head.getInt(0), meta.head.getInt(1))
    // probe-set-sized collect: only the words the values hash to
    // (marker rows of all-NULL files carry NULL w and never match)
    val words = FileStats.manifestDf(spark, bloomDir)
      .filter(col("w").isin(wantedWords(values, mLog2, k): _*))
      .select("path", "w", "bits").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    admittedEntities(words, values, mLog2, k)
  }

  /** Equality/IN read through the Bloom manifest: open only files whose
    * filter admits at least one probe value, then re-apply the exact
    * predicate (through the same canonical string form the index
    * hashed). */
  def prunedReadIn(spark: SparkSession, dataDir: String, bloomDir: String,
                   column: String, values: Seq[String]): DataFrame = {
    val files = survivors(spark, bloomDir, values)
    val base =
      if (files.isEmpty) spark.read.parquet(dataDir).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(column).cast("string").isin(values: _*))
  }
}
