package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic building blocks.
  *
  * The reference's sampling is unseeded Python RNG (TrainDatasets.py:257-263,
  * 423-433) — unreproducible by design. We standardize on *content-keyed*
  * deterministic sampling: hash the row key with md5 (identical bytes-in/
  * hex-out in every engine), and route on a hex prefix. This is the same
  * trick large-scale pipelines use to make train/val/test splits stable
  * across reruns and engines, and it needs no shared RNG state, so it
  * scales to any cluster size (pure map, no shuffle).
  *
  * Float policy for oracle-checked aggregates: sums of money go through
  * exact DECIMAL arithmetic and are cast to DOUBLE at the end — bit-
  * identical in any engine, immune to float summation order (which WILL
  * differ between Spark partial aggregation and DuckDB).
  */
object Portable {

  /** Lowercase hex md5 of the string form of a key column. */
  def md5Key(c: Column): Column = md5(c.cast("string").cast("binary"))

  /** Deterministic Bernoulli-style sample: keep rows whose md5 prefix
    * falls below `permille`/4096 of the space (3 hex chars = 4096 buckets).
    * DuckDB equivalent: `substr(md5(CAST(k AS VARCHAR)),1,3) < 'xyz'`.
    */
  def md5Sample(key: Column, buckets4096: Int): Column = {
    // %03x emits 4 chars at >= 4096, breaking the 3-char lexicographic
    // compare ('fff' > '1000'), so the full range is explicit.
    require(buckets4096 >= 0 && buckets4096 <= 4096,
      s"buckets4096 out of [0,4096]: $buckets4096")
    if (buckets4096 == 4096) lit(true)
    else substring(md5Key(key), 1, 3) < lit(f"$buckets4096%03x")
  }

  /** SQL fragment for the DuckDB oracle matching [[md5Sample]]. */
  def md5SampleSql(keyExpr: String, buckets4096: Int): String = {
    require(buckets4096 >= 0 && buckets4096 <= 4096,
      s"buckets4096 out of [0,4096]: $buckets4096")
    if (buckets4096 == 4096) "TRUE"
    else f"substr(md5(CAST($keyExpr AS VARCHAR)),1,3) < '$buckets4096%03x'"
  }

  /** Deterministic split label: first 3 hex chars of md5(key) partition the
    * 4096-bucket space into [0,valHi) → val, [valHi,testHi) → test,
    * rest → train.
    */
  def md5SplitLabel(key: Column, valHi: Int, testHi: Int): Column = {
    require(valHi >= 0 && testHi >= valHi && testHi < 4096,
      s"split bounds out of range: valHi=$valHi testHi=$testHi")
    val h = substring(md5Key(key), 1, 3)
    when(h < lit(f"$valHi%03x"), "val")
      .when(h < lit(f"$testHi%03x"), "test")
      .otherwise("train")
  }

  def md5SplitLabelSql(keyExpr: String, valHi: Int, testHi: Int): String = {
    // same bounds as the Spark twin: a 4-char %03x rendering against a
    // 3-char substr breaks the lexicographic compare silently — the
    // oracle would diverge instead of throwing
    require(valHi >= 0 && testHi >= valHi && testHi < 4096,
      s"split bounds out of range: valHi=$valHi testHi=$testHi")
    val h = s"substr(md5(CAST($keyExpr AS VARCHAR)),1,3)"
    f"CASE WHEN $h < '$valHi%03x' THEN 'val' WHEN $h < '$testHi%03x' THEN 'test' ELSE 'train' END"
  }

  /** Exact money sum: DECIMAL(12,2) accumulate, DOUBLE out. */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(12, 2))).cast(DoubleType)

  /** Exact revenue-style sum: price * (1 - discount) in DECIMAL. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(12, 2)) *
        (lit(1).cast(DecimalType(4, 2)) - discount.cast(DecimalType(4, 2))))
      .cast(DoubleType)
}
