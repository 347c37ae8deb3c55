package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables — the co-located-join alternative to the reference's
  * high-cardinality `image_name` partitioning (SURVEY §4 / §7 risk 6:
  * "fidelity mode + bucketed mode"). Bucketing by join key at write
  * time lets every subsequent equi-join or aggregation on that key run
  * WITHOUT a shuffle — at 100 TB this converts the dominant recurring
  * cost (shuffling the fact table per query) into a one-time write
  * layout decision.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
