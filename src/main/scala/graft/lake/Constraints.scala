package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** CONSTRAINT-VALIDATED ingestion: rows that fail a CHECK expression
  * are diverted to a QUARANTINE table instead of landing in (or
  * aborting) the batch — the data-quality gate every production feed
  * runs, expressed over the lake primitives the repo already has
  * ([[BucketedUpsert]] for the table; a hive-partitioned append tree
  * for the quarantine).
  *
  * Semantics are STRICT, not SQL-CHECK: a row passes only when the
  * constraint evaluates to exactly TRUE — NULL/unknown quarantines.
  * (SQL CHECK lets unknown through; for a pipeline expectation that is
  * the wrong default — a NULL in the guarded column is precisely what
  * you want surfaced. The deviation is deliberate and documented.)
  *
  * Quarantined rows are KEPT, not dropped: each batch's violators land
  * in their own `graft_qtag=<tag>/` partition dir, so every rejected
  * row is auditable by batch and replayable after the upstream fix —
  * rejection without retention just moves the data loss. The
  * per-batch dir is what keeps the cost right: a batch appends
  * O(its violators), never rewriting the accumulated history (a
  * Snapshot-state quarantine would pay O(total rejects) per batch).
  * Replay safety: the quarantine half skips when its partition dir
  * already has a _SUCCESS marker (Spark's commit protocol writes it
  * last; a half-written crash dir lacks it and is overwritten), the
  * table half skips behind its own tag guard — so a crash anywhere is
  * healed by re-running the SAME call, landing only the missing half.
  */
object Constraints {

  /** Fold `batch` into the bucketed table at `root` keeping only rows
    * where `constraint` IS TRUE; the rest land in the quarantine tree
    * at `quarantineRoot` under partition `graft_qtag=tag`. Returns
    * (rows applied, rows quarantined). The batch is locally cached for
    * the two passes, so a non-deterministic source cannot disagree
    * between them; costs are batch-sized plus the usual touched-bucket
    * upsert.
    */
  def applyBatchValidated(batch: DataFrame, root: String,
                          quarantineRoot: String, key: String,
                          versionCol: String, nBuckets: Int, tag: Long,
                          constraint: Column, keep: Int = 2): (Long, Long) = {
    val spark = batch.sparkSession
    val pass = coalesce(constraint, lit(false))
    val cached = batch.persist()
    try {
      val bad = cached.filter(!pass)
      val nBad = bad.count()
      val qDir = new Path(s"$quarantineRoot/graft_qtag=$tag")
      val fs = qDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val landed = fs.exists(new Path(qDir, "_SUCCESS"))
      if (!landed && nBad > 0)
        // overwrite: a half-written crash dir (no _SUCCESS) is replaced
        bad.write.mode("overwrite").parquet(qDir.toString)
      val good = cached.filter(pass)
      val nGood = good.count()
      if (!Snapshot.currentTag(spark, root).exists(_ >= tag))
        BucketedUpsert.applyBatch(good, root, key, versionCol, nBuckets,
          tag, keep)
      (nGood, nBad)
    } finally {
      cached.unpersist()
      ()
    }
  }

  /** The quarantined rows of one batch (or all, tag = None); empty-safe
    * before the first rejection. The `graft_qtag` partition column
    * carries the batch audit tag. */
  def quarantined(spark: SparkSession, quarantineRoot: String,
                  tag: Option[Long] = None): DataFrame = {
    val root = new Path(quarantineRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root))
      return spark.emptyDataFrame
    val all = spark.read.option("basePath", quarantineRoot)
      .parquet(quarantineRoot)
    tag.fold(all)(t => all.filter(col("graft_qtag") === t))
  }
}
