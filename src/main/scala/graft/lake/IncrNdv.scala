package graft.lake

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained DISTINCT COUNT over a [[BucketedUpsert]]
  * table, via MERGEABLE KMV (k-minimum-values) sketch partials — the
  * sketch counterpart to [[IncrAgg]]'s count/sum partials.
  *
  * Exact NDV is the one common aggregate that is NOT incrementally
  * maintainable from per-bucket scalars (distinct does not sum), which
  * at 100 TB forces a full rescan per refresh. The KMV sketch restores
  * bucket-granular maintenance because it is a MERGE-CLOSED summary:
  * the k smallest distinct hash values of a union are always contained
  * in the union of each side's k smallest, so per-bucket top-k rows
  * merge to exactly the sketch a from-scratch pass would build. The MV
  * therefore stores one row per retained hash — (bucket, group,
  * value, u), at most k per (bucket, group), metadata-scale — and
  * [[refresh]] recomputes ONLY the buckets the base table rewrote
  * since the MV's tag ([[IncrAgg.maintain]] skeleton: change feed in,
  * carried-over partials for untouched buckets).
  *
  * Hashes are md5-derived exactly as the a11_kmv_distinct gate's
  * (first 15 hex chars normalized to [0,1)), so the estimate is
  * DETERMINISTIC and cross-engine hash-checkable — DuckDB computes the
  * identical doubles. Groups that retain fewer than k values report
  * their exact distinct count ([[readNdv]]'s n_mins < k branch), so
  * small groups are exact and large ones carry the standard KMV
  * (k-1)/u_k estimate with ~1/sqrt(k-2) relative error.
  *
  * `k` is a property of the stored sketch: pass the same value to
  * [[refresh]] and [[readNdv]] for one MV root (a larger read-k than
  * the stored rows can answer would silently under-merge; [[readNdv]]
  * fail-fasts on a k above the build's).
  */
object IncrNdv {

  private val pow16_15 = math.pow(16.0, 15)

  /** Normalized md5 hash in [0,1) — the a11/DuckDB-replicable u. */
  private def uOf(v: org.apache.spark.sql.Column) =
    conv(substring(md5(v), 1, 15), 16, 10).cast("double") / lit(pow16_15)

  /** Bring the NDV sketch MV at `mvRoot` up to the base table's
    * published tag, recomputing only buckets rewritten since the MV's
    * own tag. `ndvCol` is the column whose per-`groupCols` distinct
    * count the MV tracks (hashed through its string form, so any type
    * works). Returns the number of buckets recomputed. */
  def refresh(spark: SparkSession, tableRoot: String, mvRoot: String,
              key: String, groupCols: Seq[String], ndvCol: String,
              k: Int, keep: Int = 2): Int = {
    require(groupCols.nonEmpty, "at least one grouping column")
    require(k >= 2, s"KMV needs k >= 2, got $k")
    IncrAgg.maintain(spark, tableRoot, mvRoot, keep) { (changed, nBuckets) =>
      val w = Window.partitionBy("graft_bucket", groupCols: _*)
        .orderBy(col("graft_u"), col("graft_nv"))
      changed
        // NULL does not count as a distinct value (SQL COUNT(DISTINCT)
        // semantics, and what the oracle computes) — unfiltered it
        // would hash to a NULL u, sort NULLS FIRST into every sketch's
        // slot 1, and inflate n_mins
        .filter(col(ndvCol).isNotNull)
        .withColumn("graft_bucket", BucketedUpsert.bucketOf(col(key), nBuckets))
        // string form: type-stable MV schema + the exact value both
        // engines hash; distinct BEFORE the window so per-group state
        // is one row per distinct value, then top-k per bucket-group
        .select((col("graft_bucket") +: groupCols.map(col) :+
          col(ndvCol).cast("string").as("graft_nv")): _*)
        .distinct()
        .withColumn("graft_u", uOf(col("graft_nv")))
        .withColumn("graft_rn", row_number().over(w))
        .filter(col("graft_rn") <= k)
        .drop("graft_rn")
        .withColumn("graft_k", lit(k))
    }
  }

  /** Final combine: merge the bucket sketches per group (dedup by
    * value — the same value retained by several buckets is one distinct
    * — then global top-k) and report `ndv_estimate` + `n_mins`. */
  def readNdv(spark: SparkSession, mvRoot: String,
              groupCols: Seq[String], k: Int): DataFrame = {
    val mv = Snapshot.readLocalized(spark, mvRoot)
    val metaRow = mv.agg(min("graft_k")).head
    // a published-but-empty sketch (all-NULL first batch, or a table
    // emptied completely): zero groups, zero rows — not an NPE
    if (metaRow.isNullAt(0))
      return mv.limit(0).select((groupCols.map(col) :+
        lit(0.0).as("ndv_estimate") :+ lit(0L).as("n_mins")): _*)
    val storedK = metaRow.getInt(0)
    require(k <= storedK,
      s"sketch at $mvRoot stores k=$storedK rows per bucket-group — " +
        s"reading k=$k > $storedK would under-merge; rebuild with a larger k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("graft_u"), col("graft_nv"))
    mv.select((groupCols.map(col) :+ col("graft_nv") :+ col("graft_u")): _*)
      .distinct()
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_mins"), max(col("graft_u")).as("uk"))
      .select((groupCols.map(col) :+
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("uk")).as("ndv_estimate") :+
        col("n_mins")): _*)
  }
}
