package graft.queries

import graft.Tables.t
import graft.functions.Portable
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming-shaped queries over `events`, run in batch mode for the
  * oracle gate (the same transforms run under readStream — see
  * StreamingSpec for the incremental/watermark behavior).
  */
object StreamQueries extends QueryPack {

  val defs: Map[String, QueryFn] = Map(
    // Tumbling-window aggregation (the windowedCounts pipeline, batch
    // mode). Window start is emitted as epoch seconds so the oracle is
    // timezone-proof; sums go through DECIMAL per the float policy.
    "st_windowed_counts" -> ((s, d) =>
      EventStreams.windowedCounts(t(s, d, "events"))
        .select(unix_timestamp(col("window_start")).as("bucket_start"),
          col("event_type"), col("n"))
        .orderBy("bucket_start", "event_type")),

    // Event-time bucketing + exact DECIMAL value sums — pure integer
    // arithmetic on the raw nanosecond longs (engine-portable).
    "st_event_buckets" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("bucket", expr("ts div 3600000000000")) // exact integer division
        .groupBy("bucket", "event_type")
        .agg(count(lit(1)).as("n"), Portable.moneySum(col("value")).as("sum_value"))
        .orderBy("bucket", "event_type"))
  )

  val oracle: Map[String, String] = Map(
    // events.ts is timestamp[ns] in parquet; epoch_ns recovers the long.
    "st_windowed_counts" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_start,
         event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""",
    "st_event_buckets" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS bucket,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""
  )
}
