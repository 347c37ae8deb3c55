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

    // Batch sessionization via lag + running sum (the SQL-expressible
    // twin of EventStreams.sessionize): a session break is a >30-minute
    // gap; session ids are per-user running counts of breaks.
    "st_sessionize_batch" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("brk",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > 1800000000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("brk")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), Portable.moneySum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    }),

    // NATIVE session_window (vs st_sessionize_batch's manual lag form):
    // session bounds surface as epoch-micros longs; the oracle
    // replicates the built-in's exact merge rule (break at gap >= 30
    // min, end = last event + gap) via gaps-and-islands.
    "st_session_native" -> ((s, d) =>
      EventStreams.sessionWindows(t(s, d, "events"))
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          unix_micros(col("session_end")).as("session_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_us")),

    // The STATEFUL sessionizer itself under the oracle gate (VERDICT
    // r17 #6 — previously the one streaming op without a DuckDB
    // oracle): EventStreams.sessionize (flatMapGroupsWithState +
    // event-time timeout) runs through a real checkpointed file
    // stream. Values are folded as integer CENTS carried in Double
    // (exact to 2^53 — the state encoder favors flat primitives, and
    // integer-valued doubles make the fold cross-engine hashable, the
    // spec-pinned-rounding variant the verdict asked for). Two
    // sentinel batches (user -1, filtered from the output) push the
    // watermark past every real session's end+gap so the operator
    // CERTIFIES them final and the timeout path flushes them — the
    // gate covers the certify-and-emit machinery, not a batch twin.
    "st_sessionize_state" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-sess-q").toString
      val src = s"$base/src"; val sink = s"$base/sink"; val ckp = s"$base/ckp"
      val gap = 30 * 60 * 1000L; val delay = 10 * 60 * 1000L
      val ev = t(s, d, "events").select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("event_time"),
        col("value").cast("decimal(12,2)").*(lit(100))
          .cast("long").cast("double").as("value"))
      val maxMs = ev.agg(max(unix_millis(col("event_time")))).head.getLong(0)
      def sentinel(at: Long) = s.range(1).select(lit(-1L).as("user_id"),
        timestamp_millis(lit(at)).as("event_time"), lit(0.0).as("value"))
      writeOrderedBatches(src, Seq(ev,
        sentinel(maxMs + gap + delay + 5000L),
        sentinel(maxMs + 2 * (gap + delay) + 10000L)))
      EventStreams.runFileToParquet(s, src, s.read.parquet(src).schema,
        df => {
          import s.implicits._
          EventStreams.sessionize(s, df.as[EventStreams.Event]).toDF
        }, sink, ckp, maxFilesPerTrigger = 1)
      s.read.parquet(sink)
        .filter(col("user_id") >= 0) // drop the watermark sentinels
        .select(col("user_id"),
          unix_millis(col("start")).as("start_ms"),
          unix_millis(col("end")).as("end_ms"),
          col("n_events"),
          col("sum_value").cast("long").as("sum_cents"))
        .orderBy("user_id", "start_ms")
    }),

    // Moving frame aggregate: exact DECIMAL sum over the last 4 events
    // per user (rows frame — deterministic content, engine-exact).
    "st_moving_sum" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
      t(s, d, "events")
        .withColumn("mov_sum",
          sum(col("value").cast("decimal(12,2)")).over(w).cast("double"))
        .select("event_id", "user_id", "mov_sum")
        .orderBy("event_id")
    }),

    // Event-time bucketing + exact DECIMAL value sums — pure integer
    // arithmetic on the raw nanosecond longs (engine-portable).
    "st_event_buckets" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("bucket", expr("ts div 3600000000000")) // exact integer division
        .groupBy("bucket", "event_type")
        .agg(count(lit(1)).as("n"), Portable.moneySum(col("value")).as("sum_value"))
        .orderBy("bucket", "event_type")),

    // Stream-static enrichment (batch twin of the broadcast
    // dim join StreamingSpec runs under readStream): per-segment
    // per-type event rollup after the dim attach. The static side is
    // dimension-sized → broadcast; the stream side never shuffles for
    // the join itself.
    "st_enrich_join" -> ((s, d) =>
      EventStreams.enrichWithDim(
        t(s, d, "events"),
        t(s, d, "customer").select(col("c_custkey").as("user_id"), col("c_mktsegment")),
        "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"), Portable.moneySum(col("value")).as("sum_value"))
        .orderBy("c_mktsegment", "event_type")),

    // Stream-stream interval join, batch twin: view→click attribution
    // within 4 hours per user (EventStreams.intervalJoin). StreamingSpec
    // runs the same program over two MemoryStreams and pins state
    // eviction; here the unified API runs it as an equi+range join.
    "st_interval_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      EventStreams.intervalJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"))
        .orderBy("user_id", "view_id", "click_id")
    }),

    // Streaming replay dedup, batch twin: the input is the event stream
    // REPLAYED twice (union — an at-least-once delivery), pushed through
    // dedupEvents (watermarked dropDuplicates by event_id). Integer
    // aggregates per type prove exactly-once semantics survived the
    // replay; StreamingSpec covers the incremental/state-eviction side.
    "st_dedup_replay" -> ((s, d) => {
      val ev = t(s, d, "events")
      EventStreams.dedupEvents(ev.union(ev))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("event_type")
    }),

    // The ACTUAL streaming runtime under the gate (not a batch twin):
    // events land as files, a checkpointed AvailableNow query pushes
    // them through a stateless filter+projection into a parquet sink,
    // and the gate hash-checks the SINK — covering source offsets, the
    // sink commit log and exactly-once file processing. Restart and
    // out-of-order cases are FileStreamSpec's.
    "st_file_sink" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-stream-q").toString
      val src = s"$base/src"; val sink = s"$base/sink"; val ckp = s"$base/ckp"
      t(s, d, "events").write.parquet(src)
      EventStreams.runFileToParquet(s, src, s.read.parquet(src).schema,
        df => df.filter(col("event_type") === "click")
          .select("event_id", "user_id", "value"),
        sink, ckp)
      s.read.parquet(sink)
        .select(col("event_id"), col("user_id"),
          col("value").cast("double").as("value"))
        .orderBy("event_id")
    }),

    // Streaming CDC-apply under the gate: events replayed as a keyed
    // update stream (key = user_id, version = event_id), folded through
    // streamingUpsert's per-batch SEQUENCE BY resolve + atomic swap;
    // the final table must equal the batch last-version-per-key.
    // CDC with DELETE ops through the REAL streaming runtime: rows
    // where event_type='purchase' are tombstones ('the account closed').
    // They flow through the bucketed upsert as NORMAL versioned rows —
    // stored, not applied-and-dropped, so a late OLDER update can never
    // resurrect a deleted key (BucketedUpsertSpec pins that property
    // and the retention purge) — and the live view filters them at
    // read. The oracle applies the same rule to the resolved stream:
    // keys whose NEWEST event is a tombstone disappear.
    "st_cdc_delete" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-cdc-q").toString
      val src = s"$base/src"; val table = s"$base/table"; val ckp = s"$base/ckp"
      t(s, d, "events")
        .select(col("user_id"), col("event_id").as("version"),
          col("event_type"), col("value"))
        .write.parquet(src)
      val updates = s.readStream.schema(s.read.parquet(src).schema).parquet(src)
      EventStreams.streamingUpsertBucketed(s, updates, "user_id", "version",
        table, ckp, nBuckets = 8)
      graft.lake.BucketedUpsert
        .readLive(s, table, col("event_type") === "purchase")
        .select(col("user_id"), col("version"), col("event_type"),
          col("value").cast("double").as("value"))
        .orderBy("user_id")
    }),

    "st_upsert_sink" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-upsert-q").toString
      val src = s"$base/src"; val table = s"$base/table"; val ckp = s"$base/ckp"
      t(s, d, "events")
        .select(col("user_id"), col("event_id").as("version"),
          col("event_type"), col("value"))
        .write.parquet(src)
      val updates = s.readStream.schema(s.read.parquet(src).schema).parquet(src)
      EventStreams.streamingUpsert(s, updates, "user_id", "version", table, ckp)
      graft.lake.Snapshot.read(s, table)
        .select(col("user_id"), col("version"), col("event_type"),
          col("value").cast("double").as("value"))
        .orderBy("user_id")
    }),

    // Streaming-maintained MV: the full production loop in one gate —
    // CDC micro-batches fold into the bucketed table AND the standing
    // aggregate refreshes to each batch's tag, recomputing only the
    // buckets the batch touched. The oracle is s18's from-scratch
    // aggregate of the same two batches, so hash-green means the
    // continuously-maintained MV is indistinguishable from a nightly
    // full rebuild — at a per-batch cost of the churn, not the table.
    "st_incr_mv" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-stmv-q").toString
      val src = s"$base/src"; val table = s"$base/table"
      val mv = s"$base/mv"; val ckp = s"$base/ckp"
      val cust = t(s, d, "customer")
      val batch1 = cust
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("double").as("c_acctbal"), lit(1L).as("ver"))
      val batch2 = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), lit("UPDATED").as("c_mktsegment"),
          (col("c_acctbal").cast("double") + 100.0).as("c_acctbal"),
          lit(2L).as("ver"))
        .unionAll(cust.filter(col("c_custkey") % 17 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            lit("INSERTED").as("c_mktsegment"),
            lit(0.0).as("c_acctbal"), lit(2L).as("ver")))
      writeOrderedBatches(src, Seq(batch1, batch2))
      val updates = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      EventStreams.streamingUpsertWithAgg(s, updates, "c_custkey", "ver",
        table, mv, ckp, nBuckets = 16,
        Seq("c_mktsegment"), Seq("c_acctbal"))
      graft.lake.IncrAgg.read(s, mv, Seq("c_mktsegment"), Seq("c_acctbal"))
        .withColumnRenamed("sum_c_acctbal", "sum_bal")
        .orderBy("c_mktsegment")
    })
  )

  val oracle: Map[String, String] = Map(
    // events.ts is timestamp[ns] in parquet; epoch_ns recovers the long.
    "st_windowed_counts" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_start,
         event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""",
    "st_sessionize_batch" ->
      """WITH g AS (
           SELECT user_id, event_id, value, epoch_ns(ts) AS tns,
                  lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         b AS (
           SELECT user_id, event_id, value, tns,
                  CASE WHEN prev IS NULL OR tns - prev > 1800000000000 THEN 1 ELSE 0 END AS brk
           FROM g),
         sess AS (
           SELECT user_id, value,
                  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tns, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM b)
         SELECT user_id, session_id, count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    // ns → us truncation first (matching Spark's timestamp_micros(ts
    // div 1000)); brk uses STRICT > — the native operator still merges
    // an event landing exactly at the session end (StreamingSpec pins
    // this boundary on crafted input; real ns-resolution data never
    // exercises it). Ties in tus carry brk = 0, so the running sum is
    // order-independent within a tie group.
    "st_session_native" ->
      """WITH g AS (
           SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tus,
                  lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                    ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
           FROM events),
         b AS (
           SELECT user_id, event_id, value, tus,
                  CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk
           FROM g),
         sess AS (
           SELECT user_id, value, tus,
                  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
           FROM b)
         SELECT user_id, min(tus) AS session_start_us,
                max(tus) + 1800000000 AS session_end_us,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM sess GROUP BY user_id, sid
         ORDER BY user_id, session_start_us""",
    // gaps-and-islands at MILLISECOND resolution (sessionize folds
    // java.sql.Timestamp.getTime = ns // 1e6): break at gap > 30 min,
    // session end = last event (no +gap, unlike the native operator);
    // cents derive through the same DECIMAL(12,2) cast as moneySum
    "st_sessionize_state" ->
      """WITH g AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS tms,
                  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                  lag(epoch_ns(ts) // 1000000) OVER (PARTITION BY user_id
                    ORDER BY epoch_ns(ts) // 1000000, event_id) AS prev
           FROM events),
         b AS (
           SELECT user_id, tms, cents,
                  CASE WHEN prev IS NULL OR tms - prev > 1800000 THEN 1 ELSE 0 END AS brk
           FROM g),
         sess AS (
           SELECT user_id, tms, cents,
                  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tms
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
           FROM b)
         SELECT user_id, min(tms) AS start_ms, max(tms) AS end_ms,
                count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM sess GROUP BY user_id, sid ORDER BY user_id, start_ms""",
    "st_moving_sum" ->
      """SELECT event_id, user_id,
         CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id
           ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum
         FROM events ORDER BY event_id""",
    "st_event_buckets" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS bucket,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""",
    "st_enrich_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""",
    // micros arithmetic (ts ns // 1000) mirrors withEventTime's
    // timestamp_micros; 240 min = 14.4e9 micros
    "st_interval_join" ->
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
         FROM events v JOIN events c
           ON v.user_id = c.user_id
          AND v.event_type = 'view' AND c.event_type = 'click'
          AND (epoch_ns(c.ts) // 1000) > (epoch_ns(v.ts) // 1000)
          AND (epoch_ns(c.ts) // 1000) <= (epoch_ns(v.ts) // 1000) + 14400000000
         ORDER BY v.user_id, view_id, click_id""",
    // the replayed union deduped by id is just the original stream
    "st_dedup_replay" ->
      """SELECT event_type, count(*) AS n,
         min(event_id) AS min_id, max(event_id) AS max_id
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the streaming run is exactly-once, so the sink is the filter
    "st_file_sink" ->
      """SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
         FROM events WHERE event_type = 'click' ORDER BY event_id""",
    // the CDC apply rule: SEQUENCE BY resolve, then keys whose newest
    // row is a tombstone (event_type='purchase') leave the live view
    "st_cdc_delete" ->
      """SELECT user_id, version, event_type, CAST(value AS DOUBLE) AS value
         FROM (SELECT user_id, event_id AS version, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 AND event_type <> 'purchase' ORDER BY user_id""",
    // SEQUENCE BY resolve over the whole stream = last version per key
    "st_upsert_sink" ->
      """SELECT user_id, version, event_type, CAST(value AS DOUBLE) AS value
         FROM (SELECT user_id, event_id AS version, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    // the streaming-maintained MV must equal s18's from-scratch
    // aggregate of the same two batches — the oracle is shared verbatim
    "st_incr_mv" -> CoreQueries.oracle("s18_incr_agg")
  )
}
