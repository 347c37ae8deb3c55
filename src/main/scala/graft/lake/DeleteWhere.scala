package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Row-level delete over a plain-parquet tree, priced by the data it
  * TOUCHES instead of the table it lives in — the GDPR / retention /
  * takedown shape every production lake needs.
  *
  * A naive delete rewrites the whole table (`read.filter(!p).write`):
  * at 100 TB that is a full-table scan plus a full-table write to drop
  * what is usually a sliver of rows. This operator uses the [[FileStats]]
  * zone-map manifest to split the tree into files whose min/max range on
  * the predicate column CANNOT contain a matching row (kept — referenced
  * verbatim, never opened, never copied) and files that might (rewritten
  * with the deletion predicate applied). On the clustered layouts the
  * lake already writes ([[ZOrder]], sorted compaction) the touched set is
  * a small minority, so delete cost ∝ matching-range bytes, not table
  * bytes.
  *
  * A delete's output is a new immutable VERSION that is itself a valid
  * delete input: `files/` holds the rewritten survivors, `manifest/`
  * (file-count-sized) lists every data path of the version, and `stats/`
  * is the MAINTAINED zone-map manifest — kept files carry their old
  * stats rows verbatim, rewritten files get fresh rows from one scan of
  * `files/`. Stats maintenance therefore costs O(touched files), never a
  * full-table rebuild, and deletes chain: `deleteRange(v2/stats) → v3`.
  * The manifest is written LAST, so a crash mid-delete leaves no
  * readable half-version; production wraps the version dir in the
  * [[Snapshot]] pointer protocol for multi-version atomicity, exactly as
  * [[BucketedUpsert]] does with its bucket manifest.
  *
  * Correctness guards:
  *  - Zone pruning is necessary-not-sufficient, so rewritten files apply
  *    the EXACT predicate — a kept file skipped by a too-wide range and
  *    a rewritten file agree with the full-scan delete by construction.
  *  - NULLs in the predicate column never match a range delete
  *    (SQL three-valued logic would silently drop them through
  *    `NOT(col BETWEEN lo AND hi)`); the survivor filter keeps them
  *    explicitly.
  *  - A stale stats manifest (layout changed since `writeStats`) fails
  *    loudly: the delete opens the manifest's paths, and a missing file
  *    is an error, never a silent no-op.
  */
object DeleteWhere {

  /** What a delete touched: `filesTotal` files in the old version,
    * `filesRewritten` of them intersected the range and were rewritten;
    * the rest are referenced by the new manifest unread. */
  final case class DeleteStats(filesTotal: Long, filesRewritten: Long,
                               rowsDeleted: Long)

  private def manifestDir(outDir: String) = s"$outDir/manifest"
  private def filesDir(outDir: String) = s"$outDir/files"

  /** The maintained zone-map manifest of the version at `outDir` — pass
    * this to the next [[deleteRange]] to chain deletes. */
  def statsDirOf(outDir: String): String = s"$outDir/stats"

  /** Delete every row with `column` in [lo, hi] from the version
    * described by the stats manifest at `statsDir` (built by
    * [[FileStats.writeStats]] over the initial tree, or maintained by a
    * previous delete), publishing the result as a new version at
    * `outDir`. Only files whose zone-map range intersects [lo, hi] are
    * read or written — including their replacement stats rows. */
  def deleteRange(spark: SparkSession, statsDir: String, column: String,
                  lo: Column, hi: Column, outDir: String): DeleteStats = {
    val oldStats = spark.read.parquet(statsDir)
    require(oldStats.columns.contains(s"min_$column"),
      s"stats manifest at $statsDir does not index column '$column'")
    // every column the old manifest indexes (min_x/max_x pairs) is
    // re-derived for rewritten files so the new manifest prunes on the
    // same columns the old one did
    val indexed = oldStats.columns.collect { case c if c.startsWith("min_") => c.stripPrefix("min_") }.toSeq
    val touched = FileStats.prunedFiles(spark, statsDir, column, lo, hi).toSet
    // file-count-sized (metadata scale), same bound as the stats build
    val all = oldStats.select("path").collect().map(_.getString(0)).toSeq
    require(touched.subsetOf(all.toSet),
      "stats manifest disagrees with itself: pruned paths missing from it")
    val kept = all.filterNot(touched)

    var rowsDeleted = 0L
    if (touched.nonEmpty) {
      val hit = spark.read.parquet(touched.toSeq: _*)
      val c = col(column)
      // survivors: NULL keys can never match a range delete — keep them
      val survivors = hit.filter(c.isNull || c < lo || c > hi)
      // re-range-cluster the survivors on the indexed columns before
      // writing: a plain write inherits the scan's file-merged
      // partitioning, whose per-file ranges go wide and erode the NEXT
      // delete's pruning. The shuffle moves touched-file data only.
      // (Full multi-dimensional re-clustering is compaction's job.)
      survivors.repartitionByRange(touched.size, indexed.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(filesDir(outDir))
      // touched-row count comes from the stats manifest (already built),
      // not a second scan of the touched files
      val before = oldStats.filter(col("path").isInCollection(touched))
        .agg(coalesce(sum("n_rows"), lit(0L))).head.getLong(0)
      // fresh stats for the rewritten files — this scan doubles as the
      // post-delete row count, so stats maintenance adds no extra pass
      FileStats.writeStats(spark, filesDir(outDir),
        s"${statsDirOf(outDir)}-new", indexed)
      val after = spark.read.parquet(s"${statsDirOf(outDir)}-new")
        .agg(coalesce(sum("n_rows"), lit(0L))).head.getLong(0)
      rowsDeleted = before - after
    }
    // maintained stats: kept files' rows verbatim + rewritten files' new
    // rows (column-aligned by name; the fresh build emits the same set)
    val keptStats = oldStats.filter(!col("path").isInCollection(touched))
    val newStats =
      if (touched.isEmpty) keptStats
      else keptStats.unionByName(
        spark.read.parquet(s"${statsDirOf(outDir)}-new"), allowMissingColumns = false)
    newStats.coalesce(1).write.mode(SaveMode.Overwrite).parquet(statsDirOf(outDir))
    if (touched.nonEmpty) { // drop the fresh-stats staging dir
      val p = new org.apache.hadoop.fs.Path(s"${statsDirOf(outDir)}-new")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }

    val newPaths = kept ++ (if (touched.nonEmpty) Seq(filesDir(outDir)) else Nil)
    // manifest last: the version becomes readable only once it is complete
    import spark.implicits._
    newPaths.toDF("path").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(manifestDir(outDir))
    DeleteStats(all.size.toLong, touched.size.toLong, rowsDeleted)
  }

  /** Read the post-delete version: the manifest's paths (kept original
    * files + the rewritten dir), opened as one frame. */
  def read(spark: SparkSession, outDir: String): DataFrame = {
    val paths = spark.read.parquet(manifestDir(outDir))
      .select("path").collect().map(_.getString(0)).toSeq
    require(paths.nonEmpty, s"empty delete manifest at $outDir")
    spark.read.parquet(paths: _*)
  }
}
