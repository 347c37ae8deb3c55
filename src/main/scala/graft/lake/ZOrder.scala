package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order-clustered lake writer (the third layout option next to
  * hive partitioning and bucketing — see SCALE.md §Lake layout):
  * range-partition and sort files by the Morton interleave of two
  * range-queried columns, so EVERY file carries narrow min/max ranges
  * on BOTH dimensions and a reader's conjunctive or single-dimension
  * range predicate can skip most files outright. A single-column sort
  * gives this property only to its leading column; hive partitioning
  * gives it only at directory granularity and explodes file counts at
  * high cardinality.
  */
object ZOrder {

  /** Write `df` as `nFiles` parquet files clustered by the z-curve
    * over (colA, colB). Both columns must be non-negative and fit 32
    * bits (bucketize/coarsen first — ids via modulo tiers, timestamps
    * via time buckets).
    */
  def writeZOrdered(df: DataFrame, outDir: String, nFiles: Int,
                    colA: String, colB: String): Unit = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.withColumn("_graft_z",
        expr(s"graft_zorder2(cast($colA as bigint), cast($colB as bigint))"))
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").parquet(outDir)
  }
}
