package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized interval-point join: points against intervals of
  * ARBITRARY, varying lengths — the form that subsumes the fixed-width
  * trick in `j9_range_join` (there bucket width == range width, so the
  * right side replicates exactly x2).
  *
  * A raw `pt BETWEEN start AND end` join has no equi-key, so Spark
  * plans a broadcast nested loop — quadratic, the plan that dies first
  * at scale. The bucketed form turns it into ONE equi-shuffle: each
  * interval replicates into every `bucketWidth`-wide bucket it
  * overlaps (`sequence(floor(start/W), floor(end/W))`), each point
  * maps to exactly ONE bucket, and the equi-join on the bucket id plus
  * the residual BETWEEN filter yields each qualifying (interval,
  * point) pair EXACTLY ONCE — no post-join dedup, because a point
  * lives in a single bucket and an interval has a single replica
  * there.
  *
  * Choosing W: replication per interval is len/W + 1, while bucket
  * fan-in per point grows as W shrinks relative to interval density —
  * W around the MEDIAN interval length keeps replication ~2x and
  * buckets selective. `maxReplicas` is the skew guard: one
  * pathologically long interval would otherwise explode into millions
  * of replicas (the same failure mode MaxBucket closes for LSH);
  * oversized intervals fail fast with the cap in the message rather
  * than silently flooding the shuffle.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose
    * `[startCol, endCol]` contains `ptCol` (inclusive both ends).
    * Column names must be distinct across the two inputs; the
    * internal bucket column is dropped from the result.
    */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        startCol: String, endCol: String, ptCol: String,
                        bucketWidth: Long, maxReplicas: Int = 1024): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxReplicas > 0, s"maxReplicas must be positive: $maxReplicas")
    // the internal routing columns must not clobber (and later drop)
    // real user columns of the same name — the Salt.graft_salt rule
    for (c <- Seq("graft_b", "graft_reps"))
      require(!intervals.columns.contains(c) && !points.columns.contains(c),
        s"inputs must not already carry a '$c' column")
    val w = lit(bucketWidth)
    def bucketOf(c: Column) = floor(c / w).cast("long")
    // inverted intervals (end < start) contain no points under BETWEEN
    // semantics — drop them BEFORE replication: their negative replica
    // count would otherwise slip past the cap check while sequence()
    // (step -1 when start > stop) explodes a span-long descending list
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("graft_reps",
        (bucketOf(col(endCol)) - bucketOf(col(startCol)) + lit(1L)).cast("long"))
    // fail fast on the skew pathology instead of flooding the shuffle
    val guarded = iv.withColumn("graft_reps",
      when(col("graft_reps") <= lit(maxReplicas.toLong), col("graft_reps"))
        .otherwise(raise_error(concat(
          lit(s"interval spans more than $maxReplicas buckets of $bucketWidth: ["),
          col(startCol), lit(", "), col(endCol), lit("]")))))
    val replicated = guarded
      .withColumn("graft_b",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
      .drop("graft_reps")
    val bucketedPts = points.withColumn("graft_b", bucketOf(col(ptCol)))
    replicated
      .join(bucketedPts, Seq("graft_b"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("graft_b")
  }
}
