package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Z-order-clustered lake writer (the third layout option next to
  * hive partitioning and bucketing — see SCALE.md §Lake layout):
  * range-partition and sort files by the Morton interleave of two
  * range-queried columns, so EVERY file carries narrow min/max ranges
  * on BOTH dimensions and a reader's conjunctive or single-dimension
  * range predicate can skip most files outright (via [[FileStats]]
  * zone maps). A single-column sort gives this property only to its
  * leading column; hive partitioning gives it only at directory
  * granularity and explodes file counts at high cardinality.
  *
  * Both dimensions are RANGE-NORMALIZED onto the same `bits`-wide
  * integer scale before interleaving. Interleaving raw values only
  * balances dimensions of comparable magnitude: a raw epoch-hour
  * (~2^19) interleaved with a user id (~2^8) puts the hour's high bits
  * above every user bit, the curve degenerates to a plain time sort,
  * and every file spans the full user range — the exact failure
  * FileStatsSpec pins. Normalizing first costs one column-pruned
  * min/max scan (metadata-scale next to the rewrite itself) and gives
  * both dimensions equal weight whatever their units; it also lifts
  * the old non-negative-input restriction, since values are shifted by
  * their min.
  */
object ZOrder {

  /** Write `df` as `nFiles` parquet files clustered by the z-curve
    * over (colA, colB). Columns must be integral (cast/bucketize
    * first — timestamps via time buckets). Each dimension is scaled
    * onto [0, 2^bits) by its observed min/max before interleaving.
    */
  def writeZOrdered(df: DataFrame, outDir: String, nFiles: Int,
                    colA: String, colB: String, bits: Int = 16): Unit = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    graft.plans.GraftFunctions.register(df.sparkSession)
    val src = df
      .withColumn("_graft_a", col(colA).cast("long"))
      .withColumn("_graft_b", col(colB).cast("long"))
    val r = src.agg(
      min("_graft_a"), max("_graft_a"),
      min("_graft_b"), max("_graft_b")).collect()(0)
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"z-order columns $colA/$colB must have at least one non-null value")
    val span = (1L << bits) - 1
    // integer scaling via `div` so no double rounding enters for wide
    // ranges; nulls route to cell 0 (they carry no range information)
    def scaledExpr(c: String, lo: Long, hi: Long): String = {
      // BigInt subtraction: full-range longs (e.g. hash values) wrap
      // hi-lo negative, which would PASS a plain `< bound` guard and
      // silently degenerate the layout to garbage clustering
      val rangeB = BigInt(hi) - BigInt(lo)
      require(rangeB < (BigInt(1) << (62 - bits)),
        s"column range $rangeB too wide to scale without overflow — bucketize first")
      val range = rangeB.toLong
      if (range == 0L) "0L"
      else s"coalesce((($c - ${lo}L) * ${span}L) div ${range}L, 0L)"
    }
    src
      .withColumn("_graft_z", expr(
        s"graft_zorder2(${scaledExpr("_graft_a", r.getLong(0), r.getLong(1))}, " +
          s"${scaledExpr("_graft_b", r.getLong(2), r.getLong(3))})"))
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z", "_graft_a", "_graft_b")
      .write.mode("overwrite").parquet(outDir)
  }
}
