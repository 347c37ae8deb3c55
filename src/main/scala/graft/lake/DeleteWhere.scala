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
  * Output is a new immutable version: a `files/` dir holding the
  * rewritten survivors plus a file-count-sized `manifest/` listing every
  * path of the new version (kept originals + the rewritten dir). The
  * manifest is written LAST, so a crash mid-delete leaves no readable
  * half-version; production wraps the manifest in the [[Snapshot]]
  * pointer protocol for multi-version atomicity, exactly as
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
  *  - A stale manifest (layout changed since `writeStats`) fails loudly:
  *    rewriting opens the manifest's paths, and a missing file is an
  *    error, never a silent no-op.
  */
object DeleteWhere {

  /** What a delete touched: `filesTotal` files in the old version,
    * `filesRewritten` of them intersected the range and were rewritten;
    * the rest are referenced by the new manifest unread. */
  final case class DeleteStats(filesTotal: Long, filesRewritten: Long,
                               rowsDeleted: Long)

  private def manifestDir(outDir: String) = s"$outDir/manifest"
  private def filesDir(outDir: String) = s"$outDir/files"

  /** Delete every row with `column` in [lo, hi] from the tree at
    * `dataDir` (stats manifest at `statsDir`, built by
    * [[FileStats.writeStats]] on the SAME layout), publishing the result
    * as a new version at `outDir`. Only files whose zone-map range
    * intersects [lo, hi] are read or written. */
  def deleteRange(spark: SparkSession, dataDir: String, statsDir: String,
                  column: String, lo: Column, hi: Column,
                  outDir: String): DeleteStats = {
    val touched = FileStats.prunedFiles(spark, statsDir, column, lo, hi).toSet
    // file-count-sized (metadata scale), same bound as the stats build
    val all = spark.read.parquet(statsDir)
      .select("path").collect().map(_.getString(0)).toSeq
    require(touched.subsetOf(all.toSet),
      "stats manifest disagrees with itself: pruned paths missing from it")
    val kept = all.filterNot(touched)

    var rowsDeleted = 0L
    if (touched.nonEmpty) {
      val hit = spark.read.parquet(touched.toSeq: _*)
      val c = col(column)
      // survivors: NULL keys can never match a range delete — keep them
      val survivors = hit.filter(c.isNull || c < lo || c > hi)
      survivors.write.mode(SaveMode.Overwrite).parquet(filesDir(outDir))
      // touched-row count comes from the stats manifest (already built),
      // not a second scan of the touched files
      val before = spark.read.parquet(statsDir)
        .filter(col("path").isInCollection(touched))
        .agg(coalesce(sum("n_rows"), lit(0L))).head.getLong(0)
      val after = spark.read.parquet(filesDir(outDir)).count()
      rowsDeleted = before - after
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
