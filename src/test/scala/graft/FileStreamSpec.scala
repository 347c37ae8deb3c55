package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The production file-source streaming shape: checkpointed
  * readStream(dir) → transform → parquet sink under AvailableNow, and
  * the foreachBatch CDC-apply. What the MemoryStream specs cannot
  * cover: exactly-once across RESTARTS of the same checkpoint, and the
  * atomic table swap under the streaming upsert.
  */
class FileStreamSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def eventsDf: DataFrame =
    spark.read.parquet(s"${sf()}/events.parquet")

  private val eventsSchema: StructType = eventsDf.schema

  private def enrich(df: DataFrame): DataFrame =
    // stateless stream-static shape → append emits every row exactly
    // once; the dim covers every type present so the inner join is total
    EventStreams.enrichWithDim(
      df.select("event_id", "user_id", "event_type"),
      eventsDf.select("event_type").distinct()
        .withColumn("weight", length(col("event_type")).cast("double")),
      "event_type")

  test("file source → parquet sink equals the batch twin (AvailableNow)") {
    val src = tmp("fs-src"); val sink = tmp("fs-sink"); val ckp = tmp("fs-ckp")
    eventsDf.limit(2000).write.mode("overwrite").parquet(src)
    EventStreams.runFileToParquet(spark, src, eventsSchema, enrich, sink, ckp)
    val streamed = spark.read.parquet(sink).orderBy("event_id").collect().toSeq
    val batch = enrich(spark.read.parquet(src)).orderBy("event_id").collect().toSeq
    assert(streamed == batch, "streamed result must equal the batch twin")
  }

  test("restart on the same checkpoint processes new files exactly once") {
    val src = tmp("fs2-src"); val sink = tmp("fs2-sink"); val ckp = tmp("fs2-ckp")
    val all = eventsDf.limit(3000).cache()
    all.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    EventStreams.runFileToParquet(spark, src, eventsSchema, enrich, sink, ckp)
    val afterFirst = spark.read.parquet(sink).count()
    // land MORE files, then re-run the same checkpoint: only the new
    // files may be processed — no re-emission of the first batch
    all.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    EventStreams.runFileToParquet(spark, src, eventsSchema, enrich, sink, ckp)
    val ids = spark.read.parquet(sink).select("event_id").collect().map(_.getLong(0))
    assert(ids.length > afterFirst, "second run must process the new files")
    assert(ids.length == ids.distinct.length,
      "restart must not re-emit checkpointed files (exactly-once)")
    assert(ids.sorted.toSeq ==
      all.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
    all.unpersist()
  }

  test("streaming upsert folds update batches into the table (CDC apply)") {
    val src = tmp("up-src"); val table = tmp("up-table") + "/t"; val ckp = tmp("up-ckp")
    // two landed update files; several versions of some keys across them
    val v1 = spark.range(0, 100)
      .select(col("id").as("k"), lit(1L).as("version"), (col("id") * 10).as("v"))
    val v2 = spark.range(50, 150)
      .select(col("id").as("k"), lit(2L).as("version"), (col("id") * 100).as("v"))
    v1.write.mode("append").parquet(src)
    v2.write.mode("append").parquet(src)
    val updates = spark.readStream.schema(v1.schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(src)
    EventStreams.streamingUpsert(spark, updates, "k", "version", table, ckp)
    val got = graft.lake.Snapshot.read(spark, table)
      .select("k", "version", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // batch twin: last version per key over the union
    val want = v1.unionAll(v2)
      .withColumn("rn", expr("row_number() OVER (PARTITION BY k ORDER BY version DESC)"))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "final table must equal last-version-per-key of all updates")
  }

  test("out-of-order update files cannot regress rows (SEQUENCE BY)") {
    val src = tmp("oo-src"); val table = tmp("oo-table") + "/t"; val ckp = tmp("oo-ckp")
    val v2 = spark.range(0, 50)
      .select(col("id").as("k"), lit(2L).as("version"), lit(200L).as("v"))
    val v1 = spark.range(0, 50)
      .select(col("id").as("k"), lit(1L).as("version"), lit(100L).as("v"))
    // the NEWER version lands FIRST: a blind merge would let the late
    // old file overwrite it
    graft.queries.writeOrderedBatches(src, Seq(v2, v1))
    val updates = spark.readStream.schema(v2.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    EventStreams.streamingUpsert(spark, updates, "k", "version", table, ckp)
    val versions = graft.lake.Snapshot.read(spark, table)
      .select("version").distinct().collect().map(_.getLong(0)).toSeq
    assert(versions == Seq(2L), s"stale version resurfaced: $versions")
  }

  test("a replayed batch whose snapshot is already published is skipped") {
    // crash model: batch 0's pointer swap landed but the checkpoint
    // commit did not — on restart the source replays batch 0, which
    // must be a no-op (re-applying would double-fold and wedge publish
    // on reading v0 while overwriting it)
    val src = tmp("rp-src"); val table = tmp("rp-table") + "/t"; val ckp = tmp("rp-ckp")
    val f1 = spark.range(0, 40)
      .select(col("id").as("k"), lit(1L).as("version"), (col("id") * 10).as("v"))
    val f2 = spark.range(20, 60)
      .select(col("id").as("k"), lit(2L).as("version"), (col("id") * 100).as("v"))
    // one file per landing so batch boundaries are exactly f1 then f2
    graft.queries.writeOrderedBatches(src, Seq(f1, f2))
    // simulate the already-published batch 0 (exactly what the sink
    // would have written for f1)
    graft.lake.Snapshot.publish(f1, table, 0)
    val updates = spark.readStream.schema(f1.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    EventStreams.streamingUpsert(spark, updates, "k", "version", table, ckp)
    assert(graft.lake.Snapshot.currentTag(spark, table).contains(1L),
      "batch 0 must be skipped, batch 1 published")
    val got = graft.lake.Snapshot.read(spark, table)
      .select("k", "version", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = f1.unionAll(f2)
      .withColumn("rn", expr("row_number() OVER (PARTITION BY k ORDER BY version DESC)"))
      .filter(col("rn") === 1).drop("rn").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "replay must not double-apply")
  }

  test("maintained ingest: restart is exactly-once, mid-window replays skip, rewinds fail fast") {
    val src = tmp("mi-src"); val table = tmp("mi-table") + "/t"; val ckp = tmp("mi-ckp")
    val f1 = spark.range(0, 40)
      .select(col("id").as("k"), lit(1L).as("ver"), lit(false).as("del"))
    val f2 = spark.range(0, 20)
      .select(col("id").as("k"), lit(2L).as("ver"),
        (col("id") % 10 === 7).as("del"))
    graft.queries.writeOrderedBatches(src, Seq(f1, f2))
    def stream() = spark.readStream.schema(f1.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    def run(): Unit = EventStreams.streamingIngestMaintained(spark, stream(),
      "k", "ver", table, ckp, nBuckets = 4, maxFragments = 2,
      tombstoneCol = Some("del"), purgeEvery = 0)
    run()
    def liveKeys() = graft.lake.BucketedUpsert
      .readLive(spark, table, col("del"))
      .select("k").collect().map(_.getLong(0)).toSet
    // f2 tombstoned k=7,17; everything else live at its latest version
    val want12 = (0L until 40L).toSet -- Set(7L, 17L)
    assert(liveKeys() == want12, s"after run 1: ${liveKeys().size}")
    // maintenance ran inside the stream: threshold 2 forces a merge, so
    // the table is fragment-free after the run
    assert(graft.lake.BucketedUpsert.fragmentCounts(spark, table)
      .values.max == 1, "in-stream compaction must have fired")
    // RESTART with a new file: batch 2 processes exactly once
    val f3 = spark.range(7, 8)
      .select(col("id").as("k"), lit(3L).as("ver"), lit(false).as("del"))
    f3.coalesce(1).write.mode("append").parquet(src)
    run()
    assert(liveKeys() == (0L until 40L).toSet - 17L,
      "k=7 must resurrect via its NEWER live version, k=17 stay deleted")
    // an idle restart processes nothing and moves no tag
    val tagBefore = graft.lake.Snapshot.currentTag(spark, table)
    run()
    assert(graft.lake.Snapshot.currentTag(spark, table) == tagBefore,
      "idle restart must not advance the ledger")

    // MID-WINDOW replay: batch 0's data landed (tag 4·0+1) but the
    // checkpoint never committed — the replayed batch must be skipped
    // WHOLE (no double-append), later batches apply normally
    val table2 = tmp("mi-table2") + "/t"; val ckp2 = tmp("mi-ckp2")
    graft.lake.BucketedUpsert.appendFragment(f1, table2, "k", 4, tag = 1,
      versionCol = "ver")
    EventStreams.streamingIngestMaintained(spark, stream(), "k", "ver",
      table2, ckp2, nBuckets = 4, maxFragments = 8,
      tombstoneCol = Some("del"), purgeEvery = 0)
    // RAW row count distinguishes (resolved would hide a double-apply):
    // k=3 appears once in f1 and once in f2 — a replayed f1 would add a
    // third physical row
    val rows2 = graft.lake.BucketedUpsert.read(spark, table2)
      .filter(col("k") === 3L).count()
    assert(rows2 == 2L,
      s"a mid-window replayed batch must not double-apply (raw rows: $rows2)")

    // REWOUND checkpoint: published tag beyond batch 0's window → loud
    val table3 = tmp("mi-table3") + "/t"; val ckp3 = tmp("mi-ckp3")
    graft.lake.BucketedUpsert.appendFragment(f1, table3, "k", 4, tag = 40,
      versionCol = "ver")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      EventStreams.streamingIngestMaintained(spark, stream(), "k", "ver",
        table3, ckp3, nBuckets = 4, maxFragments = 8))
    def anyCauseSays(t: Throwable, s: String): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains(s)) ||
        anyCauseSays(t.getCause, s))
    assert(anyCauseSays(ex, "rewound"),
      s"rewind must fail fast: ${ex.getMessage}")
  }

  test("streaming MV sink: apply-then-crash window is healed on restart") {
    // crash model: batch 0's applyBatch landed (table at tag 0) but the
    // refresh never ran and the checkpoint never committed — on restart
    // the ledger SKIPS batch 0, so the in-loop refresh won't fire for
    // it; the trailing heal refresh must bring the MV to the table
    val src = tmp("mvheal-src"); val base = tmp("mvheal")
    val table = s"$base/t"; val mv = s"$base/mv"; val ckp = tmp("mvheal-ckp")
    val f1 = spark.range(0, 60)
      .select(col("id").as("k"), lit("g").as("g"),
        (col("id").cast("double")).as("v"), lit(1L).as("ver"))
    f1.coalesce(1).write.mode("append").parquet(src)
    // simulate the already-applied batch 0 (exactly what the sink would
    // have written), MV untouched
    graft.lake.BucketedUpsert.applyBatch(f1, table, "k", "ver",
      nBuckets = 4, tag = 0)
    val updates = spark.readStream.schema(spark.read.parquet(src).schema)
      .parquet(src)
    EventStreams.streamingUpsertWithAgg(spark, updates, "k", "ver",
      table, mv, ckp, nBuckets = 4, Seq("g"), Seq("v"))
    val got = graft.lake.IncrAgg.read(spark, mv, Seq("g"), Seq("v")).head
    assert(got.getLong(1) == 60L && got.getDouble(2) == (0 until 60).sum.toDouble,
      s"healed MV wrong: $got")
    assert(graft.lake.Snapshot.currentTag(spark, mv).contains(0L))
  }

  test("streaming MV sink survives an empty leading micro-batch") {
    // a zero-row first batch publishes an EMPTY manifest; the refresh
    // must treat it as nothing-to-do (not die on entries.head) and the
    // first real batch's refresh catches the MV up from the change feed
    val src = tmp("mvempty-src"); val base = tmp("mvempty")
    val table = s"$base/t"; val mv = s"$base/mv"; val ckp = tmp("mvempty-ckp")
    val rows = spark.range(0, 40)
      .select(col("id").as("k"), lit("g").as("g"),
        col("id").cast("double").as("v"), lit(1L).as("ver"))
    graft.queries.writeOrderedBatches(src, Seq(rows.limit(0), rows))
    val updates = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    EventStreams.streamingUpsertWithAgg(spark, updates, "k", "ver",
      table, mv, ckp, nBuckets = 4, Seq("g"), Seq("v"))
    val got = graft.lake.IncrAgg.read(spark, mv, Seq("g"), Seq("v")).head
    assert(got.getLong(1) == 40L && got.getDouble(2) == (0 until 40).sum.toDouble,
      s"MV wrong after empty leading batch: $got")
  }

  test("a rewound checkpoint below the published tag fails fast, not silently") {
    val src = tmp("rw-src"); val table = tmp("rw-table") + "/t"; val ckp = tmp("rw-ckp")
    val f1 = spark.range(0, 10)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    f1.coalesce(1).write.mode("append").parquet(src)
    // table already published far ahead — a fresh checkpoint's batch 0
    // is NOT a crash replay (that would be batch 5) and must throw
    graft.lake.Snapshot.publish(f1, table, 5)
    val updates = spark.readStream.schema(f1.schema).parquet(src)
    val ex = intercept[Exception] {
      EventStreams.streamingUpsert(spark, updates, "k", "version", table, ckp)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rewound")),
      s"expected the rewind error, got: ${messages(ex).mkString(" | ")}")
  }

  test("publish rejects a non-increasing tag instead of corrupting the table") {
    val root = tmp("mono") + "/t"
    graft.lake.Snapshot.publish(spark.range(5).toDF("x"), root, 5)
    val ex = intercept[IllegalArgumentException] {
      graft.lake.Snapshot.publish(spark.range(9).toDF("x"), root, 3)
    }
    assert(ex.getMessage.contains("not above"), ex.getMessage)
    assert(graft.lake.Snapshot.read(spark, root).count() == 5,
      "the published table must be untouched after the rejected publish")
  }

  test("snapshot publish: pointer always resolves, retention keeps a reader alive") {
    val root = tmp("snap") + "/t"
    val d1 = spark.range(10).toDF("x")
    val d2 = spark.range(20).toDF("x")
    val d3 = spark.range(30).toDF("x")
    graft.lake.Snapshot.publish(d1, root, 0)
    val firstPath = graft.lake.Snapshot.resolve(spark, root).get
    graft.lake.Snapshot.publish(d2, root, 1)
    // a reader that resolved v0 BEFORE the publish still reads it
    // (retention keep=2), while new readers resolve v1
    assert(spark.read.parquet(firstPath).count() == 10)
    assert(graft.lake.Snapshot.read(spark, root).count() == 20)
    graft.lake.Snapshot.publish(d3, root, 2)
    assert(graft.lake.Snapshot.read(spark, root).count() == 30)
    // GC: v0 is gone, v1+v2 retained
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val snaps = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
    assert(snaps == Seq("v1", "v2"), s"retention should keep newest 2: $snaps")
  }
}
