package graft

import graft.lake.{DeleteWhere, FileStats, ZOrder}
import org.apache.spark.sql.functions._

/** The delete must be priced by touched files (most files referenced
  * verbatim, never rewritten), must equal the full-scan delete exactly,
  * must maintain the zone-map stats incrementally so deletes CHAIN, and
  * must never let three-valued logic drop NULL-keyed rows.
  */
class DeleteWhereSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("delete-spec").toString

  test("range delete rewrites only intersecting files and matches the full-scan delete") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))

    val res = DeleteWhere.deleteRange(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    assert(res.filesTotal >= 8, s"expected a fragmented tree, got ${res.filesTotal}")
    // a within-quarter range on the 16-file z layout touches about half
    // the files; allow drift slack (file ranges vary run to run — the
    // range partitioner's sampling is seeded by RDD id, which moves
    // within a shared session; observed 7-9 of 16 across suite runs)
    assert(res.filesRewritten > 0 && res.filesRewritten <= res.filesTotal * 5 / 8,
      s"delete must touch a minority: ${res.filesRewritten} of ${res.filesTotal}")
    assert(res.rowsDeleted > 0)

    // kept files are referenced verbatim: every untouched original path
    // appears in the new manifest unchanged
    val touched = FileStats.prunedFiles(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L)).toSet
    val originals = spark.read.parquet(
      graft.lake.FileStats.resolveManifest(spark, s"$base/stats"))
      .select("path").collect().map(_.getString(0)).toSet
    val manifest = spark.read.parquet(s"$base/v2/manifest")
      .select("path").collect().map(_.getString(0)).toSet
    assert((originals -- touched).subsetOf(manifest),
      "every kept original path must be referenced by the new version")
    assert(manifest.intersect(touched).isEmpty,
      "no touched (pre-delete) file may leak into the new version")

    // content equality with the full-scan delete
    val got = DeleteWhere.read(spark, s"$base/v2")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "delete must equal the full-scan delete")
    assert(res.rowsDeleted == ev.count() - want.length)
  }

  test("deletes chain through the maintained stats manifest at touched-file cost") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))

    val r1 = DeleteWhere.deleteRange(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    // second delete consumes v2's MAINTAINED stats — no rebuild
    val r2 = DeleteWhere.deleteRange(spark, DeleteWhere.statsDirOf(s"$base/v2"),
      "user_id", lit(10L), lit(25L), s"$base/v3")
    // the maintained stats must still prune (strictly fewer than all
    // files rewritten); the tight minority bound is asserted on the
    // first, cleanly-z-ordered version in the test above — after one
    // delete the layout legitimately degrades toward range slop
    assert(r2.filesRewritten > 0 && r2.filesRewritten < r2.filesTotal,
      s"chained delete must still prune: ${r2.filesRewritten} of ${r2.filesTotal}")

    val got = DeleteWhere.read(spark, s"$base/v3")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L) && !col("user_id").between(10L, 25L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "chained deletes must equal the composed full-scan delete")

    // the maintained stats describe exactly the version's rows: total
    // n_rows in v3's stats equals the surviving row count
    val statRows = spark.read.parquet(graft.lake.FileStats
      .resolveManifest(spark, DeleteWhere.statsDirOf(s"$base/v3")))
      .agg(sum("n_rows")).head.getLong(0)
    assert(statRows == want.length,
      s"maintained stats row count $statRows != surviving rows ${want.length}")
    // and the staging dir is gone
    assert(!new java.io.File(s"$base/v3/stats-new").exists())
  }

  test("deleteVectors rewrites NOTHING, masks exactly the range, and equals the full-scan delete") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))

    val res = DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    assert(res.filesRewritten == 0, "a DV delete must rewrite no file")
    assert(res.rowsDeleted > 0)
    // no rewritten-files dir exists — bytes written are sidecar-sized
    assert(!new java.io.File(s"$base/v2/files").exists(),
      "DV delete must not write data files")
    // every original path referenced verbatim
    val originals = spark.read.parquet(
      graft.lake.FileStats.resolveManifest(spark, s"$base/stats"))
      .select("path").collect().map(_.getString(0)).toSet
    val manifest = spark.read.parquet(s"$base/v2/manifest")
      .select("path").collect().map(_.getString(0)).toSet
    assert(manifest == originals, "DV version must reference every file verbatim")

    val got = DeleteWhere.read(spark, s"$base/v2")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "DV mask must equal the full-scan delete")
    assert(res.rowsDeleted == ev.count() - want.length)
  }

  test("an over-bound DV degrades to a shuffle anti-join with identical results") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")

    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    // normal regime: broadcast mask, ZERO shuffle over the table
    val fast = DeleteWhere.read(spark, s"$base/v2").select("event_id")
    assert(fast.collect().map(_.getLong(0)).sorted.sameElements(want))
    assert(graft.plans.PlanInspect.shuffles(
      fast.queryExecution.executedPlan).isEmpty,
      "the in-bound DV mask must broadcast (no table shuffle)")
    // force the over-bound regime: mask must NOT broadcast (an
    // unbounded broadcast of a table-scale DV would OOM the driver);
    // the shuffle anti-join is slower but memory-safe and IDENTICAL
    spark.conf.set("graft.dv.maxBroadcastRows", "1")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // AQE must not re-broadcast
    try {
      val safe = DeleteWhere.read(spark, s"$base/v2").select("event_id")
      assert(safe.collect().map(_.getLong(0)).sorted.sameElements(want),
        "the shuffle-regime mask must equal the broadcast-regime result")
      assert(graft.plans.PlanInspect.shuffles(
        safe.queryExecution.executedPlan).nonEmpty,
        "over-bound DV must take the shuffle anti-join, not broadcast")
    } finally {
      spark.conf.unset("graft.dv.maxBroadcastRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }
  }

  test("DV deletes chain, and a later rewrite FOLDS touched files' vectors") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))

    // two DV deletes chain: v3's sidecar is the union
    DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    val r2 = DeleteWhere.deleteVectors(spark,
      DeleteWhere.statsDirOf(s"$base/v2"), "user_id", lit(10L), lit(25L),
      s"$base/v3")
    assert(r2.filesRewritten == 0 && r2.rowsDeleted > 0)
    val got3 = DeleteWhere.read(spark, s"$base/v3")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want3 = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L) &&
        !col("user_id").between(10L, 25L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got3.sameElements(want3), "chained DV deletes must compose")

    // a REWRITING delete folds: files it rewrites lose their DV entries
    // (mask applied in the rewrite), kept files carry theirs forward
    val r3 = DeleteWhere.deleteRange(spark,
      DeleteWhere.statsDirOf(s"$base/v3"), "user_id", lit(100L), lit(130L),
      s"$base/v4")
    assert(r3.filesRewritten > 0)
    val got4 = DeleteWhere.read(spark, s"$base/v4")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want4 = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L) &&
        !col("user_id").between(10L, 25L) &&
        !col("user_id").between(100L, 130L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got4.sameElements(want4),
      "rewrite after DV deletes must apply the mask before rewriting")
    // the folded version's sidecar (if any) names NO rewritten file:
    // v4's files dir holds the rewrites; surviving DV paths must all be
    // kept originals
    val dvDir = new java.io.File(s"$base/v4/dv")
    if (dvDir.exists()) {
      val dvPaths = spark.read.parquet(s"$base/v4/dv")
        .select("path").distinct().collect().map(_.getString(0))
      assert(dvPaths.forall(!_.contains("/v4/files")),
        "folded files must not retain DV entries")
    }
    // rowsDeleted accounting never double-counts DV-hidden rows
    assert(r3.rowsDeleted == want3.length - want4.length,
      s"rewrite deleted ${r3.rowsDeleted}, expected ${want3.length - want4.length}")
  }

  test("compactVersion folds all vectors physically and the result chains cleanly") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    DeleteWhere.deleteVectors(spark, DeleteWhere.statsDirOf(s"$base/v2"),
      "user_id", lit(10L), lit(25L), s"$base/v3")
    val (before, after, folded) =
      DeleteWhere.compactVersion(spark, s"$base/v3", s"$base/v4",
        targetBytes = 256L << 10)
    assert(folded > 0, "the accumulated vectors must fold")
    assert(after < before, s"compaction must merge files: $before -> $after")
    // no sidecar survives; the masked rows are PHYSICALLY gone
    assert(!new java.io.File(s"$base/v4/dv").exists())
    val got = DeleteWhere.read(spark, s"$base/v4")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L) &&
        !col("user_id").between(10L, 25L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "compaction must not change visible rows")
    // maintained stats describe exactly the surviving rows and CHAIN:
    // a further delete consumes the compacted version's stats
    assert(spark.read.parquet(graft.lake.FileStats
        .resolveManifest(spark, DeleteWhere.statsDirOf(s"$base/v4")))
      .agg(sum("n_rows")).head.getLong(0) == want.length)
    val r = DeleteWhere.deleteRange(spark, DeleteWhere.statsDirOf(s"$base/v4"),
      "user_id", lit(130L), lit(140L), s"$base/v5")
    assert(r.rowsDeleted > 0)
    val got5 = DeleteWhere.read(spark, s"$base/v5").count()
    assert(got5 == want.length - r.rowsDeleted)
  }

  test("a range touching nothing rewrites zero files and keeps the table byte-identical") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf(), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 4, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    val res = DeleteWhere.deleteRange(spark, s"$base/stats",
      "user_id", lit(1000000L), lit(2000000L), s"$base/v2")
    assert(res.filesRewritten == 0 && res.rowsDeleted == 0)
    assert(DeleteWhere.read(spark, s"$base/v2").count() ==
      spark.read.parquet(s"$base/data").count())
  }

  test("NULL keys survive a range delete (three-valued-logic guard)") {
    val base = tmp()
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (5L, "b"), (null, "null-keyed"), (9L, "c"), (null, "also-null")
    ).toDF("k", "v").repartition(2)
    df.write.parquet(s"$base/data")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("k"))
    val res = DeleteWhere.deleteRange(spark, s"$base/stats",
      "k", lit(4L), lit(6L), s"$base/v2")
    val left = DeleteWhere.read(spark, s"$base/v2")
      .select("v").collect().map(_.getString(0)).sorted
    assert(left.sameElements(Array("a", "also-null", "c", "null-keyed")),
      s"only k=5 may be deleted, got ${left.mkString(",")}")
    assert(res.rowsDeleted == 1)
  }

  test("an unindexed predicate column fails loudly") {
    val base = tmp()
    import spark.implicits._
    Seq((1L, 2L)).toDF("a", "b").write.parquet(s"$base/data")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("a"))
    val e = intercept[IllegalArgumentException] {
      DeleteWhere.deleteRange(spark, s"$base/stats", "b", lit(0L), lit(9L), s"$base/v2")
    }
    assert(e.getMessage.contains("does not index"))
  }
}
