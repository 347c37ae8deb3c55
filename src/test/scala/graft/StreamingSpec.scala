package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured Streaming behavior that the batch oracle can't see:
  * incremental window aggregation, watermark-driven late-data dropping,
  * and gap-based sessionization with event-time timeouts.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000)

  private def nsRow(id: Long, minutes: Long, typ: String): (Long, Long, Long, String, Double, String) =
    (id, minutes * 60L * 1000 * 1000 * 1000, id, typ, 1.0, "{}")

  test("windowedCounts runs incrementally over a stream and drops late data") {
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 1)
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val query = EventStreams.windowedCounts(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      // batch 1: two events in hour 0, one in hour 1
      input.addData(nsRow(1, 10, "a"), nsRow(2, 20, "a"), nsRow(3, 70, "a"))
      query.processAllAvailable()
      // batch 2: advance watermark far past hour 0 so its window closes
      input.addData(nsRow(4, 200, "a"))
      query.processAllAvailable()
      // batch 3: a LATE event for hour 0 — must be dropped by the watermark
      input.addData(nsRow(5, 15, "a"))
      query.processAllAvailable()
      // batch 4: advance again so hour 1 closes too
      input.addData(nsRow(6, 400, "a"))
      query.processAllAvailable()
      val out = spark.table("wc")
        .select(unix_timestamp(col("window_start")).as("start"), col("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out(0L) == 2, s"hour-0 window: $out")   // late event 5 NOT counted
      assert(out(3600L) == 1, s"hour-1 window: $out")
    } finally query.stop()
  }

  test("sessionize closes sessions on gap timeout and emits aggregates") {
    val input = MemoryStream[Event](spark, 1)
    val sessions = EventStreams.sessionize(spark, input.toDS(), gapMillis = 30 * 60 * 1000L)
    val query = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: events at minutes 50, 60 (one session), then silence.
      // (Not minute 0: an event at epoch 0 ties the initial watermark
      // and is dropped as late.)
      input.addData(Event(1L, ts(50), 2.0), Event(1L, ts(60), 3.0))
      query.processAllAvailable()
      // user 2 far in the future pushes the watermark past user 1's timeout
      input.addData(Event(2L, ts(600), 1.0))
      query.processAllAvailable()
      input.addData(Event(2L, ts(1200), 1.0))
      query.processAllAvailable()
      val out = spark.table("sess").as[Session].collect()
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.length == 1, s"expected one closed session for user 1: ${out.toSeq}")
      assert(u1.head.n_events == 2 && u1.head.sum_value == 5.0)
      assert(u1.head.start == ts(50) && u1.head.end == ts(60))
    } finally query.stop()
  }

  test("sessionize rejects a watermark delay exceeding the gap (finality precondition)") {
    // with delay > gap, an in-watermark event landing in a later
    // micro-batch below an already-emitted session would re-emit a
    // duplicate fragment — the single-open-session state cannot merge
    // it; the constructor enforces the precondition loudly
    val input = MemoryStream[Event](spark, 97)
    val ex = intercept[IllegalArgumentException](
      EventStreams.sessionize(spark, input.toDS(),
        gapMillis = 5 * 60 * 1000L,
        watermarkDelayMillis = 10 * 60 * 1000L))
    assert(ex.getMessage.contains("must not exceed the session gap"),
      ex.getMessage)
  }

  test("sessionize merges a late in-watermark event and extends the session START") {
    val input = MemoryStream[Event](spark, 13)
    val sessions = EventStreams.sessionize(spark, input.toDS(),
      gapMillis = 30 * 60 * 1000L)
    val query = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      // state: session start=end=60 for user 1
      input.addData(Event(1L, ts(60), 1.0))
      query.processAllAvailable()
      // LATE event at 55 (watermark = 60 - 10min = 50 → admitted):
      // in-gap of the session interval, so it must MERGE and extend
      // the start — the stale-start bug reported the session starting
      // five minutes after its earliest event
      input.addData(Event(1L, ts(55), 2.0))
      query.processAllAvailable()
      // push the watermark far past the timeout so the session closes
      input.addData(Event(2L, ts(600), 1.0))
      query.processAllAvailable()
      input.addData(Event(2L, ts(1200), 1.0))
      query.processAllAvailable()
      val u1 = spark.table("sess_late").as[Session].collect()
        .filter(_.user_id == 1L)
      assert(u1.length == 1, s"one session expected: ${u1.toSeq}")
      assert(u1.head.start == ts(55) && u1.head.end == ts(60) &&
        u1.head.n_events == 2 && u1.head.sum_value == 3.0,
        s"late merge wrong: ${u1.head}")
    } finally query.stop()
  }

  test("sessionize never splits a session the watermark has not certified (late bridge)") {
    // gap = delay = 100s (legal). Batch 1: events at 0s and 150s —
    // 150s is beyond the gap, so the OLD eager logic emitted [0,0] as
    // final immediately. But the watermark after batch 1 is only 50s:
    // an event at 80s is still admissible, within gap of BOTH, and
    // bridges everything into ONE session [0,150]. Emission must wait
    // for watermark > end + gap.
    val input = MemoryStream[Event](spark, 23)
    val sessions = EventStreams.sessionize(spark, input.toDS(),
      gapMillis = 100 * 1000L, watermarkDelayMillis = 100 * 1000L)
    val query = sessions.writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()
    // offset from epoch 0: an event tying the INITIAL watermark (0)
    // is dropped as late before it reaches the operator
    def at(sec: Long) = new java.sql.Timestamp((1000 + sec) * 1000L)
    try {
      input.addData(Event(1L, at(0), 1.0), Event(1L, at(150), 2.0))
      query.processAllAvailable() // watermark → 1050s; NOTHING final yet
      assert(spark.table("sess_bridge").count() == 0,
        "no session may emit before the watermark certifies it")
      input.addData(Event(1L, at(80), 4.0)) // in-watermark bridge
      query.processAllAvailable()
      // push the watermark far past 150s + gap via another user
      input.addData(Event(2L, at(1000), 1.0))
      query.processAllAvailable()
      input.addData(Event(2L, at(2000), 1.0))
      query.processAllAvailable()
      val u1 = spark.table("sess_bridge").as[Session].collect()
        .filter(_.user_id == 1L)
      assert(u1.length == 1, s"the bridge must yield ONE session: ${u1.toSeq}")
      assert(u1.head.start == at(0) && u1.head.end == at(150) &&
        u1.head.n_events == 3 && u1.head.sum_value == 7.0,
        s"bridged session wrong: ${u1.head}")
    } finally query.stop()
  }

  test("sessionize gap-merges an out-of-order batch into multiple sessions, not singletons") {
    // one micro-batch delivering a user's events OUT OF ORDER and
    // spanning more than one session: the sorted-timeline merge must
    // fold them into exactly two sessions (the per-event fold used to
    // close pre-gap events as their own singletons). Legal under the
    // delay<=gap precondition: nothing here is late — the disorder is
    // WITHIN the batch.
    val input = MemoryStream[Event](spark, 14)
    val sessions = EventStreams.sessionize(spark, input.toDS(),
      gapMillis = 4 * 60 * 1000L, watermarkDelayMillis = 4 * 60 * 1000L)
    val query = sessions.writeStream.format("memory").queryName("sess_gapm")
      .outputMode("append").start()
    try {
      // delivered newest-first: 60, then 52, 53 (7 and 8 min before —
      // beyond the 4-min gap, so a separate earlier session)
      input.addData(Event(1L, ts(60), 1.0), Event(1L, ts(52), 2.0),
        Event(1L, ts(53), 3.0))
      query.processAllAvailable()
      // close the main session by advancing the watermark via user 2
      input.addData(Event(2L, ts(600), 1.0))
      query.processAllAvailable()
      input.addData(Event(2L, ts(1200), 1.0))
      query.processAllAvailable()
      val u1 = spark.table("sess_gapm").as[Session].collect()
        .filter(_.user_id == 1L).sortBy(_.start.getTime)
      assert(u1.length == 2, s"two sessions expected (merged-early + main): ${u1.toSeq}")
      assert(u1(0).start == ts(52) && u1(0).end == ts(53) &&
        u1(0).n_events == 2 && u1(0).sum_value == 5.0,
        s"out-of-order events must gap-merge into one session: ${u1(0)}")
      assert(u1(1).start == ts(60) && u1(1).n_events == 1, s"main session: ${u1(1)}")
    } finally query.stop()
  }

  test("dedupEvents drops replayed ids incrementally across batches") {
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 2)
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val query = EventStreams.dedupEvents(events)
      .select("event_id", "event_type")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(nsRow(1, 10, "a"), nsRow(2, 11, "a"))
      query.processAllAvailable()
      // batch 2 replays id 1 (at-least-once delivery) and adds id 3
      input.addData(nsRow(1, 10, "a"), nsRow(3, 12, "b"))
      query.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"replayed id must appear once: ${ids.toSeq}")
    } finally query.stop()
  }

  test("enrichWithDim joins a stream against a static broadcast dim incrementally") {
    val dim = Seq((1L, "SEG_A"), (2L, "SEG_B"))
      .toDF("user_id", "segment")
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 3)
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val query = EventStreams.enrichWithDim(events, dim, "user_id")
      .select("event_id", "segment")
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      input.addData((10L, 0L, 1L, "a", 1.0, "{}"), (11L, 0L, 2L, "a", 1.0, "{}"))
      query.processAllAvailable()
      // user 3 has no dim row — inner join must drop it, later batches still flow
      input.addData((12L, 0L, 3L, "a", 1.0, "{}"), (13L, 0L, 1L, "b", 1.0, "{}"))
      query.processAllAvailable()
      val out = spark.table("enrich").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(10L -> "SEG_A", 11L -> "SEG_B", 13L -> "SEG_A"), out.toString)
    } finally query.stop()
  }

  /** Latest reported state-store row count for a running query (the
    * last progress entry that carries state operators — no-data
    * batches still report them).
    */
  private def stateRows(query: org.apache.spark.sql.streaming.StreamingQuery): Long =
    query.recentProgress.reverseIterator
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal)
      .getOrElse(fail("no progress with state operators"))

  /** Peak state-store row count across the query's progress history —
    * processAllAvailable runs a trailing no-data batch in which the
    * just-advanced watermark already evicts, so "state grew" is only
    * observable as the max over history, not the latest value.
    */
  private def peakStateRows(query: org.apache.spark.sql.streaming.StreamingQuery): Long =
    query.recentProgress
      .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
      .max

  test("windowedCounts state is EVICTED as the watermark advances (memory bounded)") {
    // The scale contract of the watermark: a long-running stream's
    // window state must not grow past the watermark horizon. 24 open
    // hourly windows go in; once the watermark passes them all, the
    // state store must shrink to just the still-open tail — if eviction
    // regressed (watermark dropped from the plan, wrong column), state
    // would stay >= 24 forever and a production stream would OOM.
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 4)
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val query = EventStreams.windowedCounts(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wc_evict").outputMode("append").start()
    try {
      // 24 events in 24 distinct hourly windows
      input.addData((0 until 24).map(h => nsRow(h.toLong, h * 60L + 5, "a")): _*)
      query.processAllAvailable()
      val grown = peakStateRows(query)
      assert(grown >= 24, s"expected >=24 open windows in state, got $grown")
      // advance the watermark far past every open window...
      input.addData(nsRow(100, 10000, "a"))
      query.processAllAvailable()
      // ...eviction lands in the batch that RUNS with the new watermark
      input.addData(nsRow(101, 10001, "a"))
      query.processAllAvailable()
      val evicted = stateRows(query)
      assert(evicted <= 2,
        s"state store still holds $evicted rows after the watermark " +
          s"passed all windows (was $grown) — eviction is not happening")
    } finally query.stop()
  }

  test("dedupEvents state is EVICTED as the watermark advances (replay horizon)") {
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 5)
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val query = EventStreams.dedupEvents(events)
      .select("event_id")
      .writeStream.format("memory").queryName("dedup_evict").outputMode("append").start()
    try {
      input.addData((0 until 50).map(i => nsRow(i.toLong, 10 + i, "a")): _*)
      query.processAllAvailable()
      val grown = peakStateRows(query)
      assert(grown >= 50, s"expected >=50 remembered ids in state, got $grown")
      input.addData(nsRow(1000, 10000, "a"))
      query.processAllAvailable()
      input.addData(nsRow(1001, 10001, "a"))
      query.processAllAvailable()
      val evicted = stateRows(query)
      assert(evicted <= 3,
        s"dedup state still holds $evicted ids after the watermark " +
          s"passed them (was $grown) — with no eviction a long-running " +
          "stream remembers every id forever and OOMs")
    } finally query.stop()
  }

  test("sessionWindows merges, closes at the exact gap boundary, and evicts state") {
    def row(id: Long, minutes: Long, user: Long): (Long, Long, Long, String, Double, String) =
      (id, minutes * 60L * 1000 * 1000 * 1000, user, "a", 1.0, "{}")
    val input = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 6)
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val query = EventStreams.sessionWindows(events, "30 minutes", "10 minutes")
      .select(col("user_id"), unix_timestamp(col("session_start")).as("start_s"),
        unix_timestamp(col("session_end")).as("end_s"), col("n_events"))
      .writeStream.format("memory").queryName("swin").outputMode("append").start()
    try {
      // user 1: 50, 60, 65 chain into ONE session [50, 95) (end = 65+30).
      // user 3: 100 then 130 — exactly the 30-min gap apart — still
      // MERGES (the native operator breaks only on a STRICTLY exceeded
      // gap): one session [100, 160). user 4: 100 then 131 — gap
      // exceeded by a minute — breaks into two sessions.
      input.addData(row(1, 50, 1), row(2, 60, 1), row(3, 65, 1),
        row(6, 100, 3), row(7, 130, 3), row(8, 100, 4), row(9, 131, 4))
      query.processAllAvailable()
      // user 2 far in the future closes everything and advances eviction
      input.addData(row(4, 600, 2))
      query.processAllAvailable()
      input.addData(row(5, 1200, 2))
      query.processAllAvailable()
      val out = spark.table("swin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 50 * 60L, 95 * 60L, 3L)),
        s"user-1 sessions: ${out.toSeq}")
      assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 100 * 60L, 160 * 60L, 2L)),
        s"user-3 exact-gap event must merge: ${out.toSeq}")
      assert(out.filter(_._1 == 4L).sortBy(_._2).toSeq ==
        Seq((4L, 100 * 60L, 130 * 60L, 1L), (4L, 131 * 60L, 161 * 60L, 1L)),
        s"user-4 exceeded gap must break: ${out.toSeq}")
      // closed sessions must leave the state store (only user 2's open
      // tail may remain) — otherwise session state grows forever
      val evicted = stateRows(query)
      assert(evicted <= 2,
        s"session state still holds $evicted rows after closing — not evicting")
    } finally query.stop()
  }

  test("intervalJoin (stream-stream) matches in-window, drops out-of-window, evicts state") {
    def row(id: Long, user: Long, minutes: Long, typ: String) =
      (id, minutes * 60L * 1000 * 1000 * 1000, user, typ, 1.0, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val views = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 11)
    val clicks = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 12)
    val joined = EventStreams.intervalJoin(
      views.toDF().toDF(cols: _*), clicks.toDF().toDF(cols: _*),
      watermark = "10 minutes", windowMin = 30)
    val query = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      views.addData(row(1, 7, 10, "view"))
      clicks.addData(
        row(2, 7, 25, "click"),  // 15 min after the view → match
        row(3, 7, 50, "click"),  // 40 min after → outside the window
        row(4, 8, 12, "click"))  // other user → no match
      query.processAllAvailable()
      val grown = stateRows(query)
      assert(grown >= 4, s"expected 4 buffered join rows, got $grown")
      // advance BOTH watermarks far ahead (disjoint users: no new match);
      // eviction lands in the batch that runs with the new watermark
      views.addData(row(100, 9, 1000, "view"))
      clicks.addData(row(101, 10, 1000, "click"))
      query.processAllAvailable()
      views.addData(row(102, 9, 1001, "view"))
      query.processAllAvailable()
      val out = spark.table("ivj")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((7L, 1L, 2L)), s"unexpected matches: $out")
      // only the 3 unexpired sentinel rows may remain; the phase-1 rows
      // (all older than the watermark + interval bound) must be gone
      val evicted = stateRows(query)
      assert(evicted < grown && evicted <= 3,
        s"join state still holds $evicted rows (was $grown) — watermark " +
          "eviction of buffered stream-stream state is not happening")
    } finally query.stop()
  }

  test("intervalJoin streaming replay of real events EQUALS the batch twin (st_interval_join)") {
    // Closes the loop the st_interval_join gate leaves open: the gate
    // hash-checks the batch twin against DuckDB; this replays the SAME
    // sf0.001 events through MemoryStreams and asserts the streaming
    // result is identical. Chunks are fed in event-time order so the
    // advancing watermark never drops a row the batch run would keep
    // (inner-join matches emit immediately; the watermark only bounds
    // state, which the eviction test above pins).
    val ev = Tables.t(spark, sf(), "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val views = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 13)
    val clicks = MemoryStream[(Long, Long, Long, String, Double, String)](spark, 14)
    val joined = EventStreams.intervalJoin(
      views.toDF().toDF(cols: _*), clicks.toDF().toDF(cols: _*))
    val query = joined.writeStream.format("memory").queryName("ivj_replay")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { chunk =>
        views.addData(chunk.filter(_._4 == "view"))
        clicks.addData(chunk.filter(_._4 == "click"))
        query.processAllAvailable()
      }
      val streamed = spark.table("ivj_replay")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batchDf = Tables.t(spark, sf(), "events")
      val batch = EventStreams.intervalJoin(
          batchDf.filter(col("event_type") === "view"),
          batchDf.filter(col("event_type") === "click"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty, "batch twin produced no matches — test data changed?")
      assert(streamed == batch,
        s"stream/batch divergence: only-stream=${(streamed -- batch).take(5)} " +
          s"only-batch=${(batch -- streamed).take(5)}")
    } finally query.stop()
  }

  test("the same windowedCounts program runs in batch mode (unified API)") {
    val batch = Seq(nsRow(1, 10, "a"), nsRow(2, 20, "a"), nsRow(3, 70, "b"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.windowedCounts(batch)
      .select(unix_timestamp(col("window_start")).as("start"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, "a") -> 2L, (3600L, "b") -> 1L))
  }
}
