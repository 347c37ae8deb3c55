package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Row-level DIFF between two published states of a [[Snapshot]] table
  * — the lineage verb next to [[Snapshot.readAt]]'s time travel: "what
  * changed between the run I pinned last week and today's state",
  * answered as data instead of by eyeballing two exports. A training
  * pipeline uses it to audit an ingest (how many docs did the batch
  * really add/drop), to validate a migration (diff must be empty), or
  * to build an exact incremental feed from a table that publishes full
  * states.
  *
  * Shape: one full-outer join of the two states on the key — both
  * sides shuffle-partition on the same key so the join co-locates, and
  * UNCHANGED rows (the overwhelming majority between adjacent
  * snapshots) are dropped BEFORE anything downstream, so the result is
  * churn-sized. Change detection is a single null-safe struct
  * comparison over the non-key columns — no per-column plumbing, and
  * NULL-to-value transitions count as changes (`<=>` semantics).
  *
  * At 100 TB prefer diffing a [[BucketedUpsert]] table through its
  * bucket change feed ([[BucketedUpsert.changesSince]] reads only
  * rewritten buckets); this full-state diff is for plain Snapshot
  * tables and cross-root comparisons, and prices at one co-partitioned
  * join of the two states.
  */
object Diff {

  /** Diff `root`'s state as of `fromTag` against `toTag`. Output: the
    * key (coalesced), `op` ∈ I/D/U, and `old_<c>` / `new_<c>` for every
    * non-key column both states share; unchanged rows are absent.
    * Columns only one side has (schema evolution between the tags) are
    * compared as NULL on the missing side, so an added column with a
    * non-NULL value reads as a change — which it is. */
  def diff(spark: SparkSession, root: String, fromTag: Long, toTag: Long,
           key: String): DataFrame =
    diffFrames(Snapshot.readAt(spark, root, fromTag),
      Snapshot.readAt(spark, root, toTag), key)

  /** The same diff over two arbitrary frames (cross-root audits). */
  def diffFrames(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    require(oldDf.columns.contains(key) && newDf.columns.contains(key),
      s"key column $key must exist on both sides")
    val valueCols =
      (oldDf.columns.toSeq ++ newDf.columns.filterNot(oldDf.columns.contains))
        .filterNot(_ == key)
    // a column only one side has gets a NULL of the OWNING side's type
    // on the other — the struct comparison needs matching field types
    val typeOf = (newDf.schema.fields ++ oldDf.schema.fields)
      .map(f => f.name -> f.dataType).toMap
    def side(df: DataFrame, prefix: String) = {
      val widened = valueCols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(typeOf(c))))
      // presence marker: a NULL key cannot prove its side absent (the
      // join below is null-safe, so NULL-key rows DO match each other),
      // and testing the key for null would misclassify them
      widened.select((col(key).as(s"${prefix}$key") +:
        lit(true).as(s"${prefix}present") +:
        valueCols.map(c => col(c).as(s"$prefix$c"))): _*)
    }
    val o = side(oldDf, "old_"); val n = side(newDf, "new_")
    val oldK = col(s"old_$key"); val newK = col(s"new_$key")
    val changed = !(struct(valueCols.map(c => col(s"old_$c")): _*) <=>
      struct(valueCols.map(c => col(s"new_$c")): _*))
    // null-safe join: a NULL-key row compares against the other side's
    // NULL-key row instead of reporting a spurious I+D pair (keys are
    // unique per side by the table contract, NULL included)
    o.join(n, oldK <=> newK, "full_outer")
      .withColumn("op",
        when(!coalesce(col("old_present"), lit(false)), lit("I"))
          .when(!coalesce(col("new_present"), lit(false)), lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select((coalesce(oldK, newK).as(key) +: col("op") +:
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }
}
