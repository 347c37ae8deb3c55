package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed merge (upsert) — the incremental-ingest primitive the
  * reference's full-rewrite exports lack: fold a batch of changed rows
  * into a base table such that updated keys take the new row, unmatched
  * base keys survive, and brand-new keys are inserted. This is the
  * MERGE INTO shape (Delta/Iceberg) expressed as a plain full-outer
  * join + column-wise coalesce, so it runs on any DataFrame pair and
  * its result is oracle-checkable as ANSI SQL.
  *
  * Scale notes (100 TB): the full-outer join shuffles both sides on the
  * key — unavoidable for an arbitrary merge, but when the base lives
  * bucketed by the merge key (lake.Bucketing) the base side's exchange
  * vanishes and only the (much smaller) update batch shuffles; updates
  * are typically <<1% of base, so the rewrite cost is dominated by
  * rewriting the touched buckets, which is exactly what table formats
  * optimize with file-level pruning.
  */
object Merge {

  /** Upsert `updates` into `base` on `key`. Both frames must share the
    * key column name; non-key columns are taken from `updates` when the
    * key matched (update), from whichever side has the row otherwise
    * (insert / carry-over). Columns are the union of both sides' (a side
    * missing a column contributes NULLs, mirroring by-name evolution).
    *
    * Caller contract: `updates` must be key-unique. Where Delta/Iceberg
    * MERGE raises a multiple-source-match error at runtime, this plain
    * full-outer join would silently fan out the matched base row once
    * per duplicate — validating would cost an extra aggregate over the
    * batch, so dedup the batch first (e.g. `o2_last_per_key`) when the
    * source may carry multiple versions of a key.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val baseCols = base.columns.toSeq
    val updCols = updates.columns.toSeq
    require(baseCols.contains(key) && updCols.contains(key),
      s"merge key '$key' must exist on both sides")
    // the b_/u_ rename is only injective when no input already carries a
    // prefixed twin (a base with both 'x' and 'b_x' would end with two
    // 'b_x' columns and an ambiguous-column failure downstream)
    require(!baseCols.exists(c => baseCols.contains(s"b_$c")),
      "base must not contain a column colliding with the internal b_ prefix")
    require(!updCols.exists(c => updCols.contains(s"u_$c")),
      "updates must not contain a column colliding with the internal u_ prefix")
    require(!baseCols.contains("graft_present") && !updCols.contains("graft_present"),
      "inputs must not already carry a 'graft_present' column")
    val outCols = (baseCols ++ updCols.filterNot(baseCols.contains)).filterNot(_ == key)
    val b = baseCols.foldLeft(base)((df, c) => df.withColumnRenamed(c, s"b_$c"))
      .withColumn("b_graft_present", lit(true))
    val u = updCols.foldLeft(updates)((df, c) => df.withColumnRenamed(c, s"u_$c"))
      .withColumn("u_graft_present", lit(true))
    val joined = b.join(u, b(s"b_$key") === u(s"u_$key"), "full_outer")
    val keyOut = coalesce(col(s"u_$key"), col(s"b_$key")).as(key)
    val rest = outCols.map { c =>
      val hasB = baseCols.contains(c)
      val hasU = updCols.contains(c)
      // matched or insert → update's value wins when present; an update
      // row's explicit NULL must override the base value, so route on
      // the update SIDE's presence marker — not on the key column,
      // which a NULL-key update row legitimately carries as NULL (a
      // key test would half-null such a row: shared columns fell back
      // to the absent base side while update-only columns survived)
      if (hasB && hasU)
        when(coalesce(col("u_graft_present"), lit(false)), col(s"u_$c"))
          .otherwise(col(s"b_$c")).as(c)
      else if (hasU) col(s"u_$c").as(c)
      // column the update batch doesn't carry: target value survives the
      // update (UPDATE SET * under schema evolution touches only the
      // source's columns)
      else col(s"b_$c").as(c)
    }
    joined.select(keyOut +: rest: _*)
  }
}
