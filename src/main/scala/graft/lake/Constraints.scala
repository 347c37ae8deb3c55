package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** CONSTRAINT-VALIDATED ingestion: rows that fail a CHECK expression
  * are diverted to a QUARANTINE table instead of landing in (or
  * aborting) the batch — the data-quality gate every production feed
  * runs, expressed over the lake primitives the repo already has
  * ([[BucketedUpsert]] for the table, [[Snapshot]] for the quarantine).
  *
  * Semantics are STRICT, not SQL-CHECK: a row passes only when the
  * constraint evaluates to exactly TRUE — NULL/unknown quarantines.
  * (SQL CHECK lets unknown through; for a pipeline expectation that is
  * the wrong default — a NULL in the guarded column is precisely what
  * you want surfaced. The deviation is deliberate and documented.)
  *
  * Quarantined rows are KEPT, not dropped: they land append-only with
  * a `graft_qtag` batch marker, so every rejected row is auditable and
  * replayable after the upstream fix — rejection without retention
  * just moves the data loss. Both publishes carry per-table tag guards
  * (the [[graft.ext.Bm25Index.deleteDocs]] pattern), so a crash
  * between them is healed by re-running the SAME call: only the
  * missing half lands.
  */
object Constraints {

  /** Fold `batch` into the bucketed table at `root` keeping only rows
    * where `constraint` IS TRUE; the rest append to the quarantine
    * Snapshot table at `quarantineRoot` under the same tag. Returns
    * (rows applied, rows quarantined). Costs: the split is two
    * column-pruned passes over the BATCH (batch-sized, never the
    * table); the upsert itself prices at touched buckets as always.
    */
  def applyBatchValidated(batch: DataFrame, root: String,
                          quarantineRoot: String, key: String,
                          versionCol: String, nBuckets: Int, tag: Long,
                          constraint: Column, keep: Int = 2): (Long, Long) = {
    val spark = batch.sparkSession
    val pass = coalesce(constraint, lit(false))
    val bad = batch.filter(!pass)
    val nBad = bad.count()
    def behind(r: String) = !Snapshot.currentTag(spark, r).exists(_ >= tag)
    if (behind(quarantineRoot)) {
      val prev = Snapshot.resolve(spark, quarantineRoot)
        .map(dir => spark.read.parquet(dir))
      val stamped = bad.withColumn("graft_qtag", lit(tag))
      val all = prev match {
        case Some(p) => p.unionByName(stamped, allowMissingColumns = true)
        case None => stamped
      }
      Snapshot.publish(all, quarantineRoot, tag, keep)
    }
    val good = batch.filter(pass)
    val nGood = good.count()
    if (behind(root))
      BucketedUpsert.applyBatch(good, root, key, versionCol, nBuckets, tag, keep)
    (nGood, nBad)
  }

  /** The quarantined rows of one batch (or all, tag = None). */
  def quarantined(spark: org.apache.spark.sql.SparkSession,
                  quarantineRoot: String, tag: Option[Long] = None): DataFrame = {
    val all = Snapshot.read(spark, quarantineRoot)
    tag.fold(all)(t => all.filter(col("graft_qtag") === t))
  }
}
