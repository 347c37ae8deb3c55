package graft

import graft.lake.{BucketedUpsert, Snapshot}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Bucketed streaming upsert: equality with the full-rewrite sink,
  * touched-bucket-only rewrite (the point of the layout — measured in
  * bytes), checkpointed exactly-once across restart, the fixed-bucket-
  * count contract, and data GC bounded by manifest retention.
  */
class BucketedUpsertSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def dirBytes(dir: String): Long = {
    val root = new java.io.File(dir)
    if (!root.exists) 0L
    else {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(root)
    }
  }

  private def snap(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("k", "version", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("bucketed sink equals the full-rewrite sink on the same update stream") {
    val src = tmp("bu-src")
    val v1 = spark.range(0, 300)
      .select(col("id").as("k"), lit(1L).as("version"), (col("id") * 10).as("v"))
    val v2 = spark.range(100, 400)
      .select(col("id").as("k"), lit(2L).as("version"), (col("id") * 100).as("v"))
    graft.queries.writeOrderedBatches(src, Seq(v1, v2))
    def stream() = spark.readStream.schema(v1.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val flat = tmp("bu-flat") + "/t"
    EventStreams.streamingUpsert(spark, stream(), "k", "version", flat, tmp("bu-ck1"))
    val bucketed = tmp("bu-bkt") + "/t"
    EventStreams.streamingUpsertBucketed(
      spark, stream(), "k", "version", bucketed, tmp("bu-ck2"), nBuckets = 8)
    assert(snap(BucketedUpsert.read(spark, bucketed)) ==
      snap(Snapshot.read(spark, flat)),
      "bucketed and full-rewrite sinks must converge to the same table")
  }

  test("a batch rewrites only its touched buckets; untouched entries keep old paths") {
    val root = tmp("bu-touch") + "/t"
    val base = spark.range(0, 800)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 8, tag = 0)
    val manifest0 = Snapshot.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(manifest0.size == 8, "800 keys over 8 buckets must fill every bucket")
    val tableBytes = dirBytes(s"$root/data/v0")
    // one hot key → exactly one touched bucket
    val batch = spark.range(7, 8)
      .select(col("id").as("k"), lit(2L).as("version"), lit(999L).as("v"))
    BucketedUpsert.applyBatch(batch, root, "k", "version", nBuckets = 8, tag = 1)
    val manifest1 = Snapshot.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val changed = manifest1.filter { case (b, p) => manifest0(b) != p }
    assert(changed.size == 1,
      s"one-key batch must rewrite exactly one bucket, rewrote ${changed.keySet}")
    assert(changed.values.forall(_.contains("/data/v1/")))
    assert(manifest1.filterNot(e => changed.contains(e._1)) ==
      manifest0.filterNot(e => changed.contains(e._1)),
      "untouched buckets must keep their previous data paths verbatim")
    val batchBytes = dirBytes(s"$root/data/v1")
    assert(batchBytes * 4 < tableBytes,
      s"touched-bucket rewrite ($batchBytes B) must be far below the " +
        s"table ($tableBytes B)")
    info(s"full table v0: $tableBytes B; one-bucket batch v1: $batchBytes B " +
      f"(${batchBytes.toDouble / tableBytes * 100}%.1f%% of a full rewrite)")
    // and the contents are the resolved union
    val got = snap(BucketedUpsert.read(spark, root))
    assert(got.count(_._2 == 2L) == 1 && got.size == 800)
    assert(got.find(_._1 == 7L).get == ((7L, 2L, 999L)))
  }

  test("streamingAppendBucketed: fragment sink converges to the upsert sink, exactly once across restarts") {
    val src = tmp("frag-src"); val root = tmp("frag-t") + "/t"; val ckp = tmp("frag-ck")
    val v1 = spark.range(0, 300)
      .select(col("id").as("k"), lit(1L).as("version"), (col("id") * 10).as("v"))
    val v2 = spark.range(100, 400)
      .select(col("id").as("k"), lit(2L).as("version"), (col("id") * 100).as("v"))
    graft.queries.writeOrderedBatches(src, Seq(v1, v2))
    def stream() = spark.readStream.schema(v1.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    EventStreams.streamingAppendBucketed(spark, stream(), "k", root, ckp, 8)
    // the fragment sink's RESOLVED view equals the rewrite sink's table
    val flat = tmp("frag-flat") + "/t"
    EventStreams.streamingUpsert(spark, stream(), "k", "version", flat,
      tmp("frag-ck2"))
    assert(snap(BucketedUpsert.readResolved(spark, root, "k", "version")) ==
      snap(Snapshot.read(spark, flat)),
      "fragment and rewrite streaming sinks must converge")
    // each batch landed as fragments: overlap keys hold BOTH versions raw
    assert(BucketedUpsert.read(spark, root).count() == 600,
      "raw fragment rows must be batch-cumulative")
    // restart with one new file: exactly-once, fragments only grow by it
    val v3 = spark.range(0, 10)
      .select(col("id").as("k"), lit(3L).as("version"), lit(7L).as("v"))
    Thread.sleep(1100)
    v3.coalesce(1).write.mode("append").parquet(src)
    EventStreams.streamingAppendBucketed(spark, stream(), "k", root, ckp, 8)
    assert(BucketedUpsert.read(spark, root).count() == 610)
    val got = snap(BucketedUpsert.readResolved(spark, root, "k", "version"))
    assert(got.size == 400 && got.count(_._2 == 3L) == 10)
    // replay with NO new data must be a clean no-op (ledger skip)
    EventStreams.streamingAppendBucketed(spark, stream(), "k", root, ckp, 8)
    assert(BucketedUpsert.read(spark, root).count() == 610,
      "a no-data restart must not duplicate fragments")
  }

  test("restart on the same checkpoint applies new files exactly once") {
    val src = tmp("bu2-src"); val root = tmp("bu2-table") + "/t"; val ckp = tmp("bu2-ckp")
    val f1 = spark.range(0, 50)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    f1.coalesce(1).write.mode("append").parquet(src)
    def stream() = spark.readStream.schema(f1.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    EventStreams.streamingUpsertBucketed(spark, stream(), "k", "version", root, ckp, 4)
    assert(Snapshot.currentTag(spark, root).contains(0L))
    val f2 = spark.range(20, 60)
      .select(col("id").as("k"), lit(2L).as("version"), (col("id") * 7).as("v"))
    Thread.sleep(1100)
    f2.coalesce(1).write.mode("append").parquet(src)
    EventStreams.streamingUpsertBucketed(spark, stream(), "k", "version", root, ckp, 4)
    assert(Snapshot.currentTag(spark, root).contains(1L),
      "restart must process exactly the new file as batch 1")
    val got = snap(BucketedUpsert.read(spark, root))
    assert(got.size == 60 && got.count(_._2 == 2L) == 40,
      "second run must fold exactly the new file's updates")
  }

  test("out-of-order batches cannot regress rows (bucketed SEQUENCE BY)") {
    // the bucketed path runs its own resolve window (not streamingUpsert's)
    // — pin the same out-of-order guarantee on it directly: the NEWER
    // version lands first, the late old batch must lose every key
    val root = tmp("bu-oo") + "/t"
    val v2 = spark.range(0, 60)
      .select(col("id").as("k"), lit(2L).as("version"), lit(200L).as("v"))
    val v1 = spark.range(0, 60)
      .select(col("id").as("k"), lit(1L).as("version"), lit(100L).as("v"))
    BucketedUpsert.applyBatch(v2, root, "k", "version", nBuckets = 4, tag = 0)
    BucketedUpsert.applyBatch(v1, root, "k", "version", nBuckets = 4, tag = 1)
    val versions = BucketedUpsert.read(spark, root)
      .select("version").distinct().collect().map(_.getLong(0)).toSeq
    assert(versions == Seq(2L), s"stale version resurfaced: $versions")
  }

  test("a different bucket count against an existing table fails fast") {
    val root = tmp("bu3-table") + "/t"
    val base = spark.range(0, 20)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 4, tag = 0)
    val ex = intercept[IllegalArgumentException] {
      BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 8, tag = 1)
    }
    assert(ex.getMessage.contains("bucket count"))
  }

  test("changesSince reads only the buckets rewritten after the tag") {
    val root = tmp("bu-cf") + "/t"
    val base = spark.range(0, 400)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 8, tag = 0)
    val batch = spark.range(3, 4)
      .select(col("id").as("k"), lit(2L).as("version"), lit(777L).as("v"))
    BucketedUpsert.applyBatch(batch, root, "k", "version", nBuckets = 8, tag = 1)
    val feed = BucketedUpsert.changesSince(spark, root, sinceTag = 0)
    val feedRows = snap(feed)
    // bucket-granularity over-approximation: the one rewritten bucket's
    // rows, nothing from the other seven
    assert(feedRows.exists(_ == ((3L, 2L, 777L))), "the updated row must appear")
    assert(feedRows.size < 400 / 4,
      s"feed must be bucket-sized, not table-sized: ${feedRows.size} rows")
    // row-exact delta = the documented version filter on the feed
    assert(snap(feed.filter(col("version") > 1)) == Seq((3L, 2L, 777L)))
    // nothing changed since the latest tag → empty frame, table schema
    val none = BucketedUpsert.changesSince(spark, root, sinceTag = 1)
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("k", "version", "v"))
  }

  test("deleteKeys rewrites only the keys' buckets and drops fully-emptied buckets") {
    val root = tmp("bu-del") + "/t"
    val base = spark.range(0, 800)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 8, tag = 0)
    val manifest0 = Snapshot.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

    // one key → exactly one touched bucket; 7 untouched paths verbatim
    val one = spark.range(7, 8).toDF("k")
    val d1 = BucketedUpsert.deleteKeys(spark, root, "k", one, tag = 1)
    assert(d1 == 1L)
    val manifest1 = Snapshot.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val changed = manifest1.filter { case (b, p) => manifest0(b) != p }
    assert(changed.size == 1,
      s"one-key delete must rewrite exactly one bucket, rewrote ${changed.keySet}")
    assert(manifest1.filterNot(e => changed.contains(e._1)) ==
      manifest0.filterNot(e => changed.contains(e._1)),
      "untouched buckets must keep their previous data paths verbatim")
    val got = snap(BucketedUpsert.read(spark, root))
    assert(got.size == 799 && !got.exists(_._1 == 7L))

    // deleting EVERY key of one bucket: the bucket must drop out of the
    // manifest (absent = empty), and reads must keep working
    import spark.implicits._
    val b0keys = BucketedUpsert.read(spark, root)
      .withColumn("b", BucketedUpsert.bucketOf(col("k"), 8))
      .filter(col("b") === 0).select("k")
    val n0 = b0keys.count()
    assert(n0 > 0)
    val d2 = BucketedUpsert.deleteKeys(spark, root, "k", b0keys, tag = 2)
    assert(d2 == n0)
    val manifest2 = Snapshot.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(!manifest2.contains(0), s"emptied bucket must leave the manifest: $manifest2")
    assert(BucketedUpsert.read(spark, root).count() == 799 - n0)

    // deleting keys that do not exist is a published no-op on rows
    val d3 = BucketedUpsert.deleteKeys(spark, root, "k",
      Seq(100000L, 100001L).toDF("k"), tag = 3)
    assert(d3 == 0L)
    assert(BucketedUpsert.read(spark, root).count() == 799 - n0)
  }

  test("stored tombstones survive late old updates; purge drops only expired ones") {
    val root = tmp("bu-cdc") + "/t"
    def row(k: Long, ver: Long, op: String, v: Long) = {
      import spark.implicits._
      Seq((k, ver, op, v)).toDF("k", "version", "op", "v")
    }
    val isTomb = col("op") === "D"
    val base = spark.range(0, 40)
      .select(col("id").as("k"), lit(1L).as("version"), lit("U").as("op"),
        col("id").as("v"))
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 4, tag = 1)

    // tombstone k=7 at version 10: leaves the live view, stays stored
    BucketedUpsert.applyBatch(row(7L, 10L, "D", 0L), root, "k", "version", 4, tag = 2)
    assert(BucketedUpsert.readLive(spark, root, isTomb)
      .filter(col("k") === 7).count() == 0)
    assert(BucketedUpsert.read(spark, root)
      .filter(col("k") === 7 && isTomb).count() == 1,
      "the tombstone row must be STORED, not applied-and-dropped")

    // THE point: a late OLDER update (version 5 < 10) arrives after the
    // delete — it must lose the resolve to the stored tombstone, not
    // resurrect the key
    BucketedUpsert.applyBatch(row(7L, 5L, "U", 777L), root, "k", "version", 4, tag = 3)
    assert(BucketedUpsert.readLive(spark, root, isTomb)
      .filter(col("k") === 7).count() == 0,
      "a late old update must never resurrect a deleted key")

    // purge below the horizon: version-10 tombstone survives horizon 9…
    assert(BucketedUpsert.purgeTombstones(spark, root, "k", "version",
      isTomb, horizon = 9L, tag = 4) == 0L)
    assert(BucketedUpsert.read(spark, root)
      .filter(col("k") === 7).count() == 1)
    // …and is dropped at horizon 10; only its bucket rewrites
    val manifestBefore = Snapshot.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(BucketedUpsert.purgeTombstones(spark, root, "k", "version",
      isTomb, horizon = 10L, tag = 5) == 1L)
    val manifestAfter = Snapshot.read(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val changed = manifestAfter.filter { case (b, p) => manifestBefore(b) != p }
    assert(changed.size == 1,
      s"purge must rewrite only the tombstone's bucket, rewrote ${changed.keySet}")
    assert(BucketedUpsert.read(spark, root).filter(col("k") === 7).count() == 0)
    assert(BucketedUpsert.read(spark, root).count() == 39)
  }

  test("a reused tag fails BEFORE any write — the live version dir survives") {
    val root = tmp("bu-tagguard") + "/t"
    val base = spark.range(0, 50)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 4, tag = 3)
    import spark.implicits._
    // deleteKeys at the PUBLISHED tag: must reject before touching
    // data/v3 (mode overwrite would otherwise destroy the live dir the
    // manifest references, long before publish could object)
    intercept[IllegalArgumentException](
      BucketedUpsert.deleteKeys(spark, root, "k", Seq(1L).toDF("k"), tag = 3))
    intercept[IllegalArgumentException](
      BucketedUpsert.applyBatch(base, root, "k", "version", 4, tag = 3))
    assert(BucketedUpsert.read(spark, root).count() == 50,
      "the table must be intact after the rejected rewrite")
  }

  test("a NULL-version tombstone is never purged (horizon cannot certify it)") {
    val root = tmp("bu-nullver") + "/t"
    import spark.implicits._
    val rows = Seq[(Long, java.lang.Long, String, Long)](
      (1L, 1L, "U", 10L), (2L, 5L, "D", 0L), (3L, null, "D", 0L)
    ).toDF("k", "version", "op", "v")
    // route all three keys into a table; version NULL sorts last in the
    // SEQUENCE-BY desc resolve, which is fine — it is the purge that
    // must not misread it
    BucketedUpsert.applyBatch(rows, root, "k", "version", nBuckets = 2, tag = 1)
    val dropped = BucketedUpsert.purgeTombstones(spark, root, "k", "version",
      col("op") === "D", horizon = 100L, tag = 2)
    assert(dropped == 1L, s"only the version-5 tombstone may expire, dropped $dropped")
    val left = BucketedUpsert.read(spark, root)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(left.sameElements(Array(1L, 3L)),
      "the NULL-version tombstone must survive every horizon")
  }

  test("an empty FIRST batch creates no table; the first real batch does") {
    val root = tmp("bu-empty1") + "/t"
    val rows = spark.range(0, 30)
      .select(col("id").as("k"), lit(1L).as("version"), col("id").as("v"))
    // a zero-entry manifest would make the table "exist" with no schema
    // and no bucket count — every consumer that resolves it would wedge
    BucketedUpsert.applyBatch(rows.limit(0), root, "k", "version",
      nBuckets = 4, tag = 1)
    assert(Snapshot.currentTag(spark, root).isEmpty,
      "empty first batch must not publish")
    BucketedUpsert.applyBatch(rows, root, "k", "version", nBuckets = 4, tag = 2)
    assert(BucketedUpsert.read(spark, root).count() == 30)
    // an empty LATER batch still advances the tag (the streaming
    // ledger's replay skip depends on it)
    BucketedUpsert.applyBatch(rows.limit(0), root, "k", "version",
      nBuckets = 4, tag = 3)
    assert(Snapshot.currentTag(spark, root).contains(3L))
    assert(BucketedUpsert.read(spark, root).count() == 30)
  }

  test("an added column evolves the table: legacy rows read NULL, history is not rewritten") {
    val root = tmp("bu-evolve") + "/t"
    import spark.implicits._
    val base = spark.range(0, 100)
      .select(col("id").as("k"), lit(1L).as("version"), (col("id") * 10).as("v"))
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 8, tag = 1)
    // ONE key's bucket evolves; every other bucket keeps old-schema files
    val evolved = Seq((7L, 2L, 777L, "extra7")).toDF("k", "version", "v", "note")
    BucketedUpsert.applyBatch(evolved, root, "k", "version", nBuckets = 8, tag = 2)
    val got = BucketedUpsert.read(spark, root)
    assert(got.columns.toSet == Set("k", "version", "v", "note"),
      "the read schema must carry the added column across generations")
    assert(got.filter(col("note").isNotNull).select("k").collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
    assert(got.filter(col("k") === 7L).select("v").head.getLong(0) == 777L)
    assert(got.count() == 100)
    // and the change feed merge-schemas too
    assert(BucketedUpsert.changesSince(spark, root, 1L)
      .columns.contains("note"))
  }

  test("the upsert contract is whole-row: a batch omitting a column nulls it") {
    val root = tmp("bu-wholerow") + "/t"
    import spark.implicits._
    val base = Seq((1L, 1L, 10L, "keep-me"), (2L, 1L, 20L, "other"))
      .toDF("k", "version", "v", "note")
    BucketedUpsert.applyBatch(base, root, "k", "version", nBuckets = 2, tag = 1)
    // the narrower batch REPLACES key 1's row; note becomes NULL, not
    // carried over — patch semantics would need the column in the feed
    val narrow = Seq((1L, 2L, 11L)).toDF("k", "version", "v")
    BucketedUpsert.applyBatch(narrow, root, "k", "version", nBuckets = 2, tag = 2)
    val byK = BucketedUpsert.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), Option(r.getString(3)))).toMap
    assert(byK(1L) == (11L, None), "whole-row replace must null the omitted column")
    assert(byK(2L) == (20L, Some("other")), "untouched keys keep their values")
  }

  test("data versions fall out of GC once no retained manifest references them") {
    val root = tmp("bu4-table") + "/t"
    def batchAt(tag: Long) = {
      // every batch touches ALL buckets so each publish supersedes every
      // prior data dir; with keep=2 manifests, data older than two tags
      // back is unreachable and must be collected
      val b = spark.range(0, 100)
        .select(col("id").as("k"), lit(tag).as("version"), col("id").as("v"))
      BucketedUpsert.applyBatch(b, root, "k", "version", nBuckets = 4, tag = tag)
    }
    (0L to 3L).foreach(batchAt)
    val dataDirs = new java.io.File(s"$root/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dataDirs == Set("v2", "v3"),
      s"only the retained manifests' data may survive GC, found $dataDirs")
    val got = snap(BucketedUpsert.read(spark, root))
    assert(got.size == 100 && got.forall(_._2 == 3L))
  }
}
