package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Streaming extension (not reference-mandated — SURVEY §2.10 records
  * the reference has no streaming; this is the north-star extension over
  * the `events` table).
  *
  * The transforms are written once against a DataFrame and run
  * identically over a bounded batch frame or a `readStream` source —
  * Spark's batch/streaming unification is the design point. State
  * beyond windows (sessionization) uses flatMapGroupsWithState with an
  * event-time timeout, the scale-safe shape for per-key streaming state
  * (state store per key, watermark-driven eviction — no unbounded
  * driver or executor growth).
  */
object EventStreams {

  /** Normalize the testdata's nanosecond-long `ts` into an event-time
    * timestamp column.
    */
  def withEventTime(events: DataFrame): DataFrame =
    // `div`, not `/`: SQL division of longs is DOUBLE division, and
    // ~1.7e18 ns exceeds double's 53-bit mantissa (±128 ns error).
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling event-time window counts with a watermark: the canonical
    * readStream → window agg → writeStream pipeline. Late events beyond
    * 10 minutes are dropped by the watermark in streaming mode; in
    * batch mode the watermark is a no-op and results are exact.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      // moneySum, not a raw double sum: the float policy every other
      // aggregate follows — partial sums in DECIMAL are exact and
      // partition-order-free, so sum_value is hashable/comparable
      .agg(count(lit(1)).as("n"),
        graft.functions.Portable.moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** NATIVE session-window aggregation (`session_window`) — the
    * built-in counterpart of the hand-rolled [[sessionize]] /
    * st_sessionize_batch shapes. Merge rule (pinned by StreamingSpec's
    * boundary test): an event whose time is <= the session end (last
    * event + gap) still MERGES — a session breaks only when the gap is
    * STRICTLY exceeded, the same rule as the lag-based manual form.
    * Session end is last event + gap ([start, end) half-open). Runs
    * identically over batch or readStream; under streaming the
    * watermark both admits late data and drives state eviction of
    * closed sessions (StreamingSpec).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Portable.moneySum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop replayed events by (id, event time),
    * with a watermark bounding the dedup state. The event-time column
    * MUST be part of the dedup subset: streaming deduplication only
    * evicts state for keys whose watermarked column ages out — with
    * `dropDuplicates("event_id")` alone every id is remembered forever
    * and a long-running stream OOMs. A true at-least-once replay
    * carries the identical event time, so (id, time) deduping is the
    * replay guard with evictable state. In batch mode the watermark is
    * a no-op and the dedup is exact over the whole frame.
    */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicates("event_id", "event_time")

  /** Stream-stream interval join — view→click attribution: a click
    * joins the same user's views from the preceding `windowMin`
    * minutes. In streaming BOTH sides are watermarked and the interval
    * bound is what lets Spark evict buffered rows once no future match
    * is possible — an unbounded-condition stream-stream join would hold
    * state forever (StreamingSpec pins the eviction). In batch the same
    * program is an ordinary equi+range join, which the st_interval_join
    * gate hash-checks against DuckDB.
    */
  def intervalJoin(views: DataFrame, clicks: DataFrame,
                   watermark: String = "10 minutes",
                   windowMin: Int = 240): DataFrame = {
    val v = withEventTime(views)
      .select(col("user_id"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
      .withWatermark("view_time", watermark)
    val c = withEventTime(clicks)
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", watermark)
    v.join(c, col("user_id") === col("c_user_id") &&
        col("click_time") > col("view_time") &&
        col("click_time") <= col("view_time") + expr(s"INTERVAL $windowMin MINUTES"))
      .select("user_id", "view_id", "click_id")
  }

  /** Stream-static enrichment join: events against a broadcast
    * dimension. In a streaming query Spark re-plans the static side per
    * micro-batch, so a slowly-refreshing dim table is picked up without
    * restarting the query; the broadcast keeps the join stateless (no
    * stream-stream state store), which is why this is the canonical
    * enrichment shape at any event rate.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key))

  /** Checkpointed file-source → parquet-sink run: the PRODUCTION
    * streaming shape (MemoryStream is the spec harness; a real pipeline
    * tails a landing directory and owns a checkpoint). `AvailableNow`
    * processes everything present then stops — the incremental-batch
    * trigger a scheduled ingest job uses: every run resumes from the
    * checkpointed source offsets, so files are processed EXACTLY ONCE
    * across restarts (FileStreamSpec kills and re-runs against the
    * same checkpoint to prove no re-emission). The transform must be
    * append-capable; parquet is an append-only sink.
    *
    * Scale notes: the file source lists the landing dir per batch, so
    * `maxFilesPerTrigger` bounds per-batch work and the landing files
    * should be compacted (lake.Compaction) — a KB-file landing zone
    * makes listing, not data, the bottleneck.
    */
  /** SCALE-ADAPTIVE state/shuffle partition count for a NEW stateful
    * pipeline (r21, guide §2: derive partitioning from input size, not
    * from a constant tuned for local mode or the cluster). A stateful
    * stream's partition count is pinned by its FIRST batch into the
    * checkpoint forever — inheriting `spark.sql.shuffle.partitions`
    * (sized to cluster width) gives a tiny landing dir dozens of
    * near-empty state stores, each paying provider init + delta commit
    * + fsync per batch, and gives the SAME pipeline a different state
    * layout on every cluster size. Instead: ceil(landing bytes /
    * `graft.stream.stateTargetBytesPerPartition` [64 MB]), clamped to
    * [1, session shuffle partitions] — input-derived, identical at any
    * core count, and at 100 TB the clamp keeps today's width. An
    * EXISTING checkpoint is untouched: Spark replays the recorded
    * count from the offset log (set only when the checkpoint has no
    * offsets yet). */
  private def adaptiveStatePartitions(spark: SparkSession,
                                      srcDir: String): Option[Int] = {
    val target = spark.conf
      .getOption("graft.stream.stateTargetBytesPerPartition")
      .map(_.toLong).getOrElse(64L << 20)
    val p = new org.apache.hadoop.fs.Path(srcDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val bytes = fs.getContentSummary(p).getLength
    val cur = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Some((((bytes + target - 1) / target) max 1L).min(cur.toLong).toInt)
  }

  /** Guards the session-global conf mutation below: two streams
    * starting concurrently on one session could otherwise pin each
    * other's derived count into their checkpoints forever (ADVICE r21).
    * Per-session, so independent sessions never serialize on each
    * other. */
  private val confLocks =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Object]()

  /** Run `body` with `spark.sql.shuffle.partitions` set adaptively for
    * a stream STARTING at `checkpointDir` (restored after — the stream
    * clones the session state at start, so the scope only needs to
    * cover `.start()`). No-op when the checkpoint already has COMMITTED
    * offsets: its recorded count governs. Crash-left `.tmp`/hidden
    * files alone do not count as offsets (ADVICE r21): a retried first
    * run must still derive, not silently inherit the session count. */
  private def withAdaptiveStateConf[T](spark: SparkSession, srcDir: String,
                                       checkpointDir: String)(body: => T): T = {
    val offsets = new org.apache.hadoop.fs.Path(checkpointDir, "offsets")
    val fresh = {
      val fs = offsets.getFileSystem(spark.sparkContext.hadoopConfiguration)
      !fs.exists(offsets) || !fs.listStatus(offsets).exists { s =>
        val n = s.getPath.getName
        !n.startsWith(".") && !n.startsWith("_") && !n.endsWith(".tmp")
      }
    }
    adaptiveStatePartitions(spark, srcDir).filter(_ => fresh) match {
      case None => body
      case Some(n) =>
        val key = "spark.sql.shuffle.partitions"
        // serialize the set→start→restore window per session: .start()
        // clones the session state, so the lock is held only briefly
        confLocks.computeIfAbsent(spark, _ => new Object).synchronized {
          val prev = spark.conf.get(key)
          spark.conf.set(key, n.toString)
          try body finally spark.conf.set(key, prev)
        }
    }
  }

  def runFileToParquet(spark: SparkSession, srcDir: String,
                       schema: org.apache.spark.sql.types.StructType,
                       transform: DataFrame => DataFrame,
                       sinkDir: String, checkpointDir: String,
                       maxFilesPerTrigger: Int = 1000): Unit = {
    val q = withAdaptiveStateConf(spark, srcDir, checkpointDir) {
      transform(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", maxFilesPerTrigger)
            .parquet(srcDir))
        .writeStream.format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", checkpointDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
  }

  /** Streaming CDC-apply with SEQUENCE BY semantics: fold a stream of
    * keyed, versioned updates into a parquet table via `foreachBatch`.
    * Per micro-batch the current table and the batch are unioned and
    * the HIGHEST version per key wins — not a blind MERGE where "the
    * update always overwrites": the file source orders batches by file
    * modification time, so an out-of-order landing (an older version
    * file arriving after a newer one) would otherwise regress rows.
    * Version-resolve is what Delta's APPLY CHANGES … SEQUENCE BY does
    * for exactly this reason; FileStreamSpec pins the out-of-order
    * case. Replays are idempotent (re-applying a row loses the tie to
    * its identical self), which with the checkpointed source offsets
    * gives exactly-once table state.
    *
    * Batch ids and snapshot tags are one ledger. A genuine
    * crash-replay re-delivers exactly ONE batch — the last
    * uncommitted one, whose id EQUALS the published tag — and that
    * batch is skipped (idempotence). A batch id BELOW the published
    * tag can only mean a rewound/fresh checkpoint pointed at an
    * existing table (ids restart at 0), where skipping would silently
    * discard every update until ids catch up — that case THROWS:
    * clear the table root when starting a new pipeline, or resume the
    * matching checkpoint.
    *
    * Each batch's result is PUBLISHED through [[graft.lake.Snapshot]]:
    * a new immutable snapshot directory plus a single-file pointer
    * rename (the atomic primitive), so a reader always resolves a
    * complete table — no delete→rename no-table window, and in-flight
    * readers of the previous snapshot survive the publish (retention
    * keeps it). Read the table with `Snapshot.read(spark, tableRoot)`.
    * At 100 TB the full-table rewrite per batch is the plain-parquet
    * cost of this shape — table formats reduce it to touched-file
    * rewrites; with the base bucketed by the key (lake.Bucketing) the
    * union's table-side shuffle co-locates for free.
    */
  def streamingUpsert(spark: SparkSession, updates: DataFrame, key: String,
                      versionCol: String, tableRoot: String,
                      checkpointDir: String): Unit =
    runLedgeredUpsert(spark, updates, tableRoot, checkpointDir) {
      (batch, batchId) =>
        upsertBatch(batch, key, versionCol, tableRoot, batchId)
    }

  /** One full-rewrite upsert application — the per-batch body of
    * [[streamingUpsert]], exposed so batch-mode callers and the upsert
    * bench exercise the SHIPPED resolve semantics instead of a copy
    * that could drift. No ledger checks here: the streaming driver
    * guards tags via [[runLedgeredUpsert]]; direct callers own their
    * tag discipline (Snapshot.publish still enforces monotonicity).
    */
  def upsertBatch(batch: DataFrame, key: String, versionCol: String,
                  tableRoot: String, tag: Long): Unit = {
    val spark = batch.sparkSession
    val all = graft.lake.Snapshot.resolve(spark, tableRoot) match {
      case Some(cur) => spark.read.parquet(cur)
        .unionByName(batch, allowMissingColumns = true)
      case None => batch
    }
    val resolved = all
      .withColumn("graft_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(key)
          .orderBy(org.apache.spark.sql.functions.desc(versionCol))))
      .filter(col("graft_rn") === 1).drop("graft_rn")
    graft.lake.Snapshot.publish(resolved, tableRoot, tag)
  }

  /** [[streamingUpsert]] over a BUCKETED base
    * ([[graft.lake.BucketedUpsert]]): identical CDC semantics, ledger
    * contract, and read atomicity, but each batch rewrites only the
    * buckets its keys hash into instead of the whole table — the
    * touched-file-rewrite cost profile a table format's commit log
    * gives, here from the manifest-snapshot composition. Read the
    * table with `BucketedUpsert.read(spark, tableRoot)`. `nBuckets`
    * is fixed at table creation (enforced per batch).
    */
  def streamingUpsertBucketed(spark: SparkSession, updates: DataFrame,
                              key: String, versionCol: String,
                              tableRoot: String, checkpointDir: String,
                              nBuckets: Int): Unit =
    runLedgeredUpsert(spark, updates, tableRoot, checkpointDir) {
      (batch, batchId) =>
        graft.lake.BucketedUpsert.applyBatch(
          batch, tableRoot, key, versionCol, nBuckets, batchId)
    }

  /** [[streamingUpsertBucketed]]'s WRITE-CHEAP twin: each micro-batch
    * lands as per-bucket FRAGMENTS (O(batch) write, no bucket rewrite
    * — [[graft.lake.BucketedUpsert.appendFragment]]); readers resolve
    * versions with `readResolved`, and `mergeFragments` consolidates
    * from a maintenance window. Same exactly-once ledger. Choose this
    * regime when batches are small relative to buckets (the ingest-
    * bound shape); choose applyBatch when reads dominate writes. */
  def streamingAppendBucketed(spark: SparkSession, updates: DataFrame,
                              key: String, tableRoot: String,
                              checkpointDir: String, nBuckets: Int,
                              versionCol: String = ""): Unit =
    runLedgeredUpsert(spark, updates, tableRoot, checkpointDir) {
      (batch, batchId) =>
        graft.lake.BucketedUpsert.appendFragment(
          batch, tableRoot, key, nBuckets, batchId, versionCol = versionCol)
    }

  /** MAINTAINED streaming fragment ingest — the production posture of
    * the LSM regime: every micro-batch lands as O(batch) fragments
    * ([[streamingAppendBucketed]]'s write cost), and the SAME ledgered
    * sink runs the table's maintenance inside the stream's own
    * tag-space, so the out-of-band-maintenance hazard (`deleteKeys`'s
    * ownership contract — a foreign tag wedges or silently skips the
    * stream) never arises:
    *  - threshold compaction ([[graft.lake.BucketedUpsert.mergeFragmentsIfNeeded]])
    *    keeps the worst bucket's fragment count bounded, so
    *    merge-on-read latency stays FLAT at any batch count;
    *  - optional tombstone retention GC: every `purgeEvery` batches,
    *    fragments are FIRST fully merged (purging a fragmented table
    *    would resurrect superseded versions — fail-fast pinned in
    *    BucketedUpsert), then expired tombstones
    *    (`versionCol <= purgeHorizon(batchId)`) drop physically.
    *
    * Tag protocol: batch `b` OWNS the window [4b+1, 4b+3] — data lands
    * at 4b+1, compaction at 4b+2, purge at 4b+3 (a no-op consumes no
    * tag). Crash-replay: a replayed batch whose published tag is at or
    * beyond ITS window is skipped whole — skipped threshold compaction
    * self-heals on the NEXT batch (the threshold re-fires), but a
    * skipped PURGE defers a full `purgeEvery` cycle; size retention
    * horizons with one extra cycle of slack. A published tag beyond the
    * replayed batch's window is a rewound checkpoint → fail fast, as
    * [[streamingUpsert]] does.
    *
    * `keep` is the IN-FLIGHT-READER retention in units of BATCHES: a
    * maintenance batch publishes up to three manifests, so the
    * requested figure is internally scaled (+2) — without that, the
    * pre-batch manifest and its data dirs would be GC'd MID-BATCH and
    * a reader that resolved just before the batch would lose its files
    * under it.
    *
    * `purgeHorizon(batchId)` (REQUIRED when `tombstoneCol` is set with
    * `purgeEvery > 0`) gives the version at-or-below which an aged
    * tombstone may drop — the caller's out-of-order bound.
    */
  def streamingIngestMaintained(spark: SparkSession, updates: DataFrame,
                                key: String, versionCol: String,
                                tableRoot: String, checkpointDir: String,
                                nBuckets: Int, maxFragments: Int = 8,
                                tombstoneCol: Option[String] = None,
                                purgeEvery: Int = 16,
                                purgeHorizon: Long => Long = null,
                                keep: Int = 2): Unit = {
    require(tombstoneCol.isEmpty || purgeEvery <= 0 || purgeHorizon != null,
      "tombstoneCol is set with purgeEvery > 0 but no purgeHorizon — the " +
        "GC would be a silent no-op that still pays a FULL fragment merge " +
        "every cycle; pass the retention horizon, or purgeEvery = 0 to " +
        "disable the GC")
    runStreamShell(updates, checkpointDir) { (batch, batchId) =>
      maintainedBatch(spark, batch, batchId, key, versionCol, tableRoot,
        nBuckets, maxFragments, tombstoneCol, purgeEvery, purgeHorizon,
        keep)
    }
  }

  /** One maintained-ingest batch — the per-batch body of
    * [[streamingIngestMaintained]], exposed so the soak spec and
    * benches exercise the SHIPPED ledger+maintenance logic instead of
    * a copy that could drift. */
  private[graft] def maintainedBatch(spark: SparkSession, batch: DataFrame,
                                     batchId: Long, key: String,
                                     versionCol: String, tableRoot: String,
                                     nBuckets: Int, maxFragments: Int,
                                     tombstoneCol: Option[String],
                                     purgeEvery: Int,
                                     purgeHorizon: Long => Long,
                                     keep: Int = 2): Unit = {
    // `keep` is denominated in BATCHES; a maintenance batch publishes
    // up to THREE manifests, so retention is scaled here — otherwise
    // the pre-batch manifest (and the data dirs only it references)
    // would rotate out MID-BATCH under an in-flight reader
    val keepPub = keep + 2
    val dataTag = 4 * batchId + 1
    val published = graft.lake.Snapshot.currentTag(spark, tableRoot)
    published.filter(_ > 4 * batchId + 3).foreach(cur =>
      throw new IllegalStateException(
        s"batch $batchId arrived below the published snapshot v$cur of " +
          s"$tableRoot — the checkpoint was rewound or replaced; clear the " +
          "table root for a new pipeline or resume the matching checkpoint"))
    if (published.forall(_ < dataTag)) {
      graft.lake.BucketedUpsert.appendFragment(batch, tableRoot, key,
        nBuckets, dataTag, keep = keepPub, versionCol = versionCol)
      // maintenance only once the table exists (an empty FIRST batch
      // publishes nothing)
      if (graft.lake.Snapshot.currentTag(spark, tableRoot).nonEmpty) {
        val purgeDue = tombstoneCol.nonEmpty && purgeEvery > 0 &&
          (batchId + 1) % purgeEvery == 0
        if (purgeDue) {
          // purge requires raw == resolved: merge ALL fragments first
          graft.lake.BucketedUpsert.mergeFragments(spark, tableRoot, key,
            versionCol, 4 * batchId + 2, keepPub)
          graft.lake.BucketedUpsert.purgeTombstones(spark, tableRoot, key,
            versionCol, col(tombstoneCol.get), purgeHorizon(batchId),
            4 * batchId + 3, keepPub)
        } else
          graft.lake.BucketedUpsert.mergeFragmentsIfNeeded(spark, tableRoot,
            key, versionCol, 4 * batchId + 2, maxFragments, keepPub)
      }
    }
  }

  /** [[streamingUpsertBucketed]] with a CONTINUOUSLY-MAINTAINED
    * incremental aggregate ([[graft.lake.IncrAgg]]): each micro-batch
    * folds into the bucketed table and then refreshes the MV to the
    * table's new tag — recomputing only the buckets the batch touched,
    * so the standing aggregate is one bucket-churn refresh behind the
    * ingest at all times instead of a nightly rescan. Crash window:
    * if the process dies BETWEEN applyBatch and refresh, the restart's
    * ledger skips the already-applied batch (so the in-loop refresh
    * never fires for it) — the trailing heal refresh closes exactly
    * that window, and is a no-op otherwise; refresh itself is
    * idempotent catch-up by construction (it reads the change feed
    * from the MV's own tag). StreamingSpec pins the healed state.
    */
  def streamingUpsertWithAgg(spark: SparkSession, updates: DataFrame,
                             key: String, versionCol: String,
                             tableRoot: String, mvRoot: String,
                             checkpointDir: String, nBuckets: Int,
                             groupCols: Seq[String],
                             sumCols: Seq[String]): Unit = {
    runLedgeredUpsert(spark, updates, tableRoot, checkpointDir) {
      (batch, batchId) =>
        graft.lake.BucketedUpsert.applyBatch(
          batch, tableRoot, key, versionCol, nBuckets, batchId)
        // an empty FIRST batch creates no table (applyBatch no-op) —
        // nothing to refresh against yet
        if (graft.lake.Snapshot.currentTag(spark, tableRoot).nonEmpty)
          graft.lake.IncrAgg.refresh(spark, tableRoot, mvRoot, key,
            groupCols, sumCols)
    }
    // heal the apply-then-crash window (MV behind the table after a
    // replay skip); no-op when the in-loop refreshes kept pace
    if (graft.lake.Snapshot.currentTag(spark, tableRoot).nonEmpty)
      graft.lake.IncrAgg.refresh(spark, tableRoot, mvRoot, key,
        groupCols, sumCols)
  }

  /** Shared stream SHELL (foreachBatch + checkpoint + AvailableNow +
    * awaitTermination) for every ledgered sink — the ledger guard
    * itself stays in each sink's body (the exact-tag ledger and the
    * maintained tag-window ledger are deliberately different), but the
    * trigger/checkpoint plumbing must not fork: a review found the
    * skeleton copy-pasted three times and already drifting. */
  private[graft] def runStreamShell(updates: DataFrame,
                                    checkpointDir: String)(
      body: (DataFrame, Long) => Unit): Unit = {
    val q = updates.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => body(b, id); () }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Shared foreachBatch skeleton of the two upsert sinks: the
    * batch-id/snapshot-tag ledger (crash-replay skip at tag == id,
    * rewound-checkpoint fail-fast below it — see [[streamingUpsert]]'s
    * scaladoc for the full contract) around a per-batch apply.
    */
  private[graft] def runLedgeredUpsert(spark: SparkSession, updates: DataFrame,
                                tableRoot: String, checkpointDir: String)
                               (apply: (DataFrame, Long) => Unit): Unit = {
    runStreamShell(updates, checkpointDir) { (batch, batchId) =>
      // Crash-replay idempotence: the one batch a restart can
      // legitimately re-deliver is the last uncommitted one
      // (tag == batchId) — skipped, because re-running it would both
      // re-apply the data and make publish read v<batchId> through
      // the pointer while overwriting the same directory. A batchId
      // BELOW the tag is a rewound checkpoint — fail fast (see
      // scaladoc) rather than silently discarding updates.
      val published = graft.lake.Snapshot.currentTag(spark, tableRoot)
      published.filter(_ > batchId).foreach(cur =>
        throw new IllegalStateException(
          s"batch $batchId arrived below the published snapshot v$cur of " +
            s"$tableRoot — the checkpoint was rewound or replaced; clear the " +
            "table root for a new pipeline or resume the matching checkpoint"))
      if (!published.contains(batchId)) apply(batch, batchId)
    }
  }

  final case class Event(user_id: Long, event_time: java.sql.Timestamp, value: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  /** Internal per-key state (public: the state encoder codegens against it).
    * `sum` folds as raw Double — a DOCUMENTED deviation from the
    * moneySum DECIMAL policy the frame-level aggregates follow: state
    * encoders favor flat primitives, sessionize is spec-verified (not
    * cross-engine hash-gated), and per-session event counts are small
    * enough that the fold error stays in the last ulps. */
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  /** Per-key state: every session the watermark has not yet certified
    * FINAL, oldest first. More than one pends whenever the batch's
    * events span several gaps — emitting all-but-the-latest eagerly
    * was wrong: with gap=delay=100s, events {0s, 150s} then a later
    * batch's in-watermark 80s must bridge everything into ONE session
    * [0,150], but an eagerly-emitted [0,0] fragment cannot be
    * retracted (a review found the concrete split). */
  final case class SessionsState(pending: Seq[SessionState])

  /** Gap-based sessionization via flatMapGroupsWithState. Emits a
    * session exactly when the WATERMARK certifies it final:
    * `end + gap < watermark` — only then can no admissible event
    * (every future event time is >= watermark) merge into it or
    * bridge below it (an event below `start` that merges satisfies
    * time >= start - gap > end + gap - ... < watermark, inadmissible).
    * Everything not yet certified stays in state, and the event-time
    * timeout re-certifies at `min(end) + gap` so closed sessions emit
    * as soon as the watermark passes them, without waiting for the
    * key's next event.
    *
    * PRECONDITION (enforced): `watermarkDelayMillis <= gapMillis` —
    * with delay > gap an admissible event could land below an
    * ALREADY-FINAL session (end + gap < watermark <= time possible
    * when delay > gap), re-emitting it as a duplicate fragment.
    * Finality itself no longer leans on the precondition (pending
    * sessions are retained until certified), but uniqueness of
    * emission does.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapMillis: Long = 30 * 60 * 1000L,
                 watermarkDelayMillis: Long = 10 * 60 * 1000L): Dataset[Session] = {
    import spark.implicits._
    require(watermarkDelayMillis <= gapMillis,
      s"watermark delay ($watermarkDelayMillis ms) must not exceed the " +
        s"session gap ($gapMillis ms): an in-watermark event older than " +
        "the gap could attach below an already-FINAL emitted session and " +
        "re-emit it as a duplicate fragment")
    def toSession(userId: Long)(s: SessionState) =
      Session(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n, s.sum)
    events
      .withWatermark("event_time", s"$watermarkDelayMillis milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionsState]) =>
          val wm = state.getCurrentWatermarkMs()
          // gap-merge the retained sessions and the batch's events as
          // ONE sorted timeline (late in-watermark events must merge
          // with each other and may bridge retained sessions)
          val protos = scala.collection.mutable.ArrayBuffer[SessionState]()
          state.getOption.foreach(protos ++= _.pending)
          rows.foreach { e =>
            val t = e.event_time.getTime
            protos += SessionState(t, t, 1, e.value)
          }
          val merged = scala.collection.mutable.ArrayBuffer[SessionState]()
          for (p <- protos.sortBy(_.start)) {
            if (merged.nonEmpty && p.start - merged.last.end <= gapMillis) {
              val l = merged.last
              merged(merged.size - 1) = SessionState(l.start,
                math.max(l.end, p.end), l.n + p.n, l.sum + p.sum)
            } else merged += p
          }
          // FINAL iff the watermark has passed end + gap (an event at
          // exactly end + gap would still merge, so strict <)
          val (fin, pending) = merged.partition(_.end + gapMillis < wm)
          if (pending.isEmpty) state.remove()
          else {
            state.update(SessionsState(pending.toSeq))
            // re-certify when the watermark passes the EARLIEST pending
            // close; must sit strictly above the current watermark
            state.setTimeoutTimestamp(
              math.max(pending.map(_.end + gapMillis).min, wm + 1))
          }
          fin.iterator.map(toSession(userId))
      }
  }
}
