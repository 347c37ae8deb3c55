package graft

import graft.lake.{BloomIndex, BucketedUpsert, FileStats, Routing, ZOrder}
import org.apache.spark.sql.functions._

/** Unified index routing: results are ALWAYS the plain filtered scan
  * (transparency on every predicate class), and the files opened match
  * the best manual route through each index API.
  */
class RoutingSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("route-spec").toString

  /** events tree z-ordered on user_id with stats(user_id) + bloom(event_id). */
  private def buildTree(): String = {
    val root = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type", "value")
    ZOrder.writeZOrdered(ev, s"$root/data", 16, "user_id", "event_id")
    Routing.indexStats(spark, root, Seq("user_id"))
    Routing.indexBloom(spark, root, "event_id")
    root
  }

  private def plain(root: String) = spark.read.parquet(s"$root/data")

  private def sameAs(root: String, pred: org.apache.spark.sql.Column): Unit = {
    val got = Routing.readWhere(spark, root, pred)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = plain(root).filter(pred)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want),
      s"routing changed results for $pred: ${got.length} vs ${want.length}")
  }

  test("every predicate class is result-transparent") {
    val root = buildTree()
    sameAs(root, col("user_id").between(100L, 140L))          // closed range
    sameAs(root, col("user_id") >= lit(100L) && col("user_id") <= lit(140L))
    sameAs(root, col("event_id") === lit(4217L))              // bloom eq
    sameAs(root, col("event_id").isin(17L, 4217L, 999999L))   // bloom IN + misses
    sameAs(root, col("user_id").between(100L, 140L) &&
      col("event_id") === lit(4217L))                         // intersection
    sameAs(root, col("event_type") === lit("click") &&
      col("user_id").between(50L, 60L))                       // routable + opaque-ish
    sameAs(root, upper(col("event_type")) === lit("CLICK"))   // fully opaque
    sameAs(root, col("user_id").between(99999L, 100001L))     // empty result
  }

  test("files opened match the best manual route per index") {
    val root = buildTree()
    // range → exactly the zone-map prune
    val r1 = Routing.route(spark, root, col("user_id").between(100L, 140L))
    val manual1 = FileStats.prunedFiles(spark, s"$root/ix/stats",
      "user_id", lit(100L), lit(140L))
    assert(r1.files.toSet == manual1.toSet && r1.via.exists(_.startsWith("stats")),
      s"stats route mismatch: ${r1.via}")
    assert(r1.files.size < plain(root).inputFiles.length,
      "the route must actually prune")
    // eq → exactly the bloom survivors
    val r2 = Routing.route(spark, root, col("event_id") === lit(4217L))
    val manual2 = BloomIndex.survivors(spark, s"$root/ix/bloom/event_id",
      Seq("4217"))
    assert(r2.files.toSet == manual2.toSet && r2.via.exists(_.startsWith("bloom")),
      s"bloom route mismatch: ${r2.via}")
    // combined → the intersection (never more than either alone)
    val r3 = Routing.route(spark, root,
      col("user_id").between(100L, 140L) && col("event_id") === lit(4217L))
    assert(r3.files.toSet == manual1.toSet.intersect(manual2.toSet),
      "combined route must intersect the index verdicts")
    assert(r3.via.size == 2)
    // opaque → the TREE ROOT, never a collected manifest path list
    // (VERDICT r19 #7: the fallback scan doesn't need a driver-side
    // file list, and at million-file trees collecting one is pure cost)
    val r4 = Routing.route(spark, root, upper(col("event_type")) === lit("X"))
    assert(r4.via == Seq("full-scan") && r4.files == Seq(s"$root/data"),
      s"fallback must return the tree root, not a path list: ${r4.files.size}")
    // an IN list on the zone-mapped column prunes by its [min,max]
    // ENVELOPE (files outside it cannot hold any listed value)
    val r5 = Routing.route(spark, root, col("user_id").isin(101L, 103L, 108L))
    val manual5 = FileStats.prunedFiles(spark, s"$root/ix/stats",
      "user_id", lit(101L), lit(108L))
    assert(r5.files.toSet == manual5.toSet && r5.via.exists(_.startsWith("stats")),
      s"IN-envelope route mismatch: ${r5.via}")
    sameAs(root, col("user_id").isin(101L, 103L, 108L))
  }

  test("one-sided ranges route through the zone maps (VERDICT r17 #1)") {
    val root = buildTree()
    val total = plain(root).inputFiles.length
    // >= lo prunes exactly the files with max_user_id < lo
    val r = Routing.route(spark, root, col("user_id") >= lit(120L))
    val manual = spark.read.parquet(
      FileStats.resolveManifest(spark, s"$root/ix/stats"))
      .filter(col("max_user_id") >= 120L)
      .select("path").collect().map(_.getString(0)).toSet
    assert(r.files.toSet == manual && r.via.exists(_.startsWith("stats")),
      s"one-sided >= route mismatch: ${r.via}")
    assert(r.files.size < total, "the >= route must actually prune")
    sameAs(root, col("user_id") >= lit(120L))
    // <= hi prunes exactly the files with min_user_id > hi
    val r2 = Routing.route(spark, root, col("user_id") <= lit(10L))
    val manual2 = spark.read.parquet(
      FileStats.resolveManifest(spark, s"$root/ix/stats"))
      .filter(col("min_user_id") <= 10L)
      .select("path").collect().map(_.getString(0)).toSet
    assert(r2.files.toSet == manual2 && r2.files.size < total,
      s"one-sided <= route mismatch: ${r2.via}")
    sameAs(root, col("user_id") <= lit(10L))
    // strict bounds prune through the same inclusive-safe path
    val r3 = Routing.route(spark, root, col("user_id") > lit(140L))
    assert(r3.via.exists(_.startsWith("stats")) && r3.files.size < total)
    sameAs(root, col("user_id") > lit(140L))
    // a one-sided bound INTERSECTS with other routed conjuncts
    val r4 = Routing.route(spark, root,
      col("user_id") >= lit(120L) && col("event_id") === lit(4217L))
    assert(r4.files.toSet.subsetOf(manual) && r4.via.size == 2)
    sameAs(root, col("user_id") >= lit(120L) && col("event_id") === lit(4217L))
    // redundant bounds on one column merge to the TIGHTEST (review
    // r18: keeping the last-seen bound pruned `>= 120 AND >= 10` with
    // 10 — valid but most of the tree)
    val r5 = Routing.route(spark, root,
      col("user_id") >= lit(10L) && col("user_id") >= lit(120L))
    assert(r5.files.toSet == manual,
      s"redundant bounds must prune with the tightest: ${r5.files.size} " +
        s"vs ${manual.size}")
    sameAs(root, col("user_id") >= lit(10L) && col("user_id") >= lit(120L))
  }

  test("one-sided ranges prune a delete version's maintained stats") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type")
    graft.lake.ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "event_id")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    graft.lake.DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    val pred = col("user_id") >= lit(100L)
    val got = Routing.readWhere(spark, s"$base/v2", pred)
    val gotIds = got.select("event_id").collect().map(_.getLong(0)).sorted
    val wantIds = spark.read.parquet(s"$base/data")
      .filter(pred && !col("user_id").between(80L, 110L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(gotIds.sameElements(wantIds) && wantIds.nonEmpty,
      s"one-sided DV routing changed results: ${gotIds.length} vs ${wantIds.length}")
    // files-opened pinned to the manual one-sided prune, a strict subset
    val manual = FileStats.prunedFilesOpt(spark,
      graft.lake.DeleteWhere.statsDirOf(s"$base/v2"),
      Seq(("user_id", Some(lit(100L)), None))).toSet
    val opened = got.inputFiles.filter(_.contains("/data/")).toSet
    assert(opened.size == manual.size,
      s"DV one-sided route must open exactly the pruned set: " +
        s"${opened.size} vs ${manual.size}")
    assert(opened.size < spark.read.parquet(s"$base/data").inputFiles.length,
      "the DV one-sided route must actually prune")
  }

  test("OR of routable disjuncts opens the union; an opaque disjunct poisons it") {
    val root = buildTree()
    val total = plain(root).inputFiles.length
    // range OR bloom-eq → union of the two manual routes
    val pred = col("user_id").between(100L, 140L) ||
      col("event_id") === lit(4217L)
    val r = Routing.route(spark, root, pred)
    val m1 = FileStats.prunedFiles(spark, s"$root/ix/stats",
      "user_id", lit(100L), lit(140L)).toSet
    val m2 = BloomIndex.survivors(spark, s"$root/ix/bloom/event_id",
      Seq("4217")).toSet
    assert(r.files.toSet == (m1 ++ m2),
      s"OR route must union the disjunct verdicts: ${r.via}")
    assert(r.via.size == 1 && r.via.head.startsWith("or["), r.via.toString)
    assert(r.files.size < total, "the OR union must still prune")
    sameAs(root, pred)
    // one-sided tails: <= lo OR >= hi (the anti-range shape)
    val tails = col("user_id") <= lit(10L) || col("user_id") >= lit(140L)
    val rt = Routing.route(spark, root, tails)
    val stats = spark.read.parquet(
      FileStats.resolveManifest(spark, s"$root/ix/stats"))
    val mt = stats.filter(col("min_user_id") <= 10L)
      .select("path").collect().map(_.getString(0)).toSet ++
      stats.filter(col("max_user_id") >= 140L)
        .select("path").collect().map(_.getString(0)).toSet
    assert(rt.files.toSet == mt && rt.files.size < total,
      s"tails OR route mismatch: ${rt.via}")
    sameAs(root, tails)
    // a disjunct with an AND inside routes through its own conjuncts
    val mixed = (col("user_id").between(100L, 140L) &&
      col("event_id") === lit(4217L)) || col("user_id") <= lit(5L)
    val rm = Routing.route(spark, root, mixed)
    assert(rm.via.head.startsWith("or[") && rm.files.size < total)
    sameAs(root, mixed)
    // one unroutable disjunct poisons the union → full scan
    val poisoned = col("user_id").between(100L, 140L) ||
      upper(col("event_type")) === lit("CLICK")
    val rp = Routing.route(spark, root, poisoned)
    assert(rp.via == Seq("full-scan") && rp.files == Seq(s"$root/data"),
      s"opaque disjunct must poison the OR: ${rp.via}")
    sameAs(root, poisoned)
  }

  test("a date-typed predicate never routes through a string-hashed index") {
    import spark.implicits._
    val root = tmp()
    // a Bloom index on a DATE column: the literal's internal days-int
    // toString differs from the cast-string the index hashed — routing
    // it would silently false-negate, so it must stay full-scan
    (1 to 500).map(i => (i.toLong, java.sql.Date.valueOf(
      f"2024-01-${i % 28 + 1}%02d")))
      .toDF("id", "d").repartition(8).write.parquet(s"$root/data")
    Routing.indexBloom(spark, root, "d")
    val pred = col("d") === lit(java.sql.Date.valueOf("2024-01-15"))
    val r = Routing.route(spark, root, pred)
    assert(r.via == Seq("full-scan"),
      s"date eq must not trust the string-hashed index: ${r.via}")
    val got = Routing.readWhere(spark, root, pred).count()
    val want = spark.read.parquet(s"$root/data").filter(pred).count()
    assert(got == want && want > 0, s"date transparency broke: $got vs $want")
  }

  test("a stale manifest fails fast instead of silently missing rows") {
    import spark.implicits._
    val root = buildTree()
    // land a new file AFTER the index build — rows the stale manifests
    // don't know about and would silently exclude (even from the
    // manifest-derived full-scan fallback)
    Seq((999999L, 42L, "click", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    val ex = intercept[IllegalStateException](
      Routing.route(spark, root, col("user_id").between(100L, 140L)))
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    val ex2 = intercept[IllegalStateException](
      Routing.readWhere(spark, root,
        upper(col("event_type")) === lit("X")).count())
    assert(ex2.getMessage.contains("STALE"), ex2.getMessage)
    // rebuilding the indexes restores routing — and the new row routes
    Routing.indexStats(spark, root, Seq("user_id"))
    Routing.indexBloom(spark, root, "event_id")
    sameAs(root, col("user_id").between(100L, 140L))
    assert(Routing.readWhere(spark, root,
      col("event_id") === lit(999999L)).count() == 1L)
    // a manifest with no fingerprint (predating the sidecar) is
    // unknowable-freshness — loud too, naming the rebuild
    val fp = new org.apache.hadoop.fs.Path(
      FileStats.resolveManifest(spark, s"$root/ix/stats") + "/_tree_fp")
    fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fp, false)
    val ex3 = intercept[IllegalStateException](
      Routing.route(spark, root, col("user_id").between(100L, 140L)))
    assert(ex3.getMessage.contains("no tree fingerprint"), ex3.getMessage)
  }

  test("refreshIndexes re-validates routing at delta cost after appends and deletions") {
    import spark.implicits._
    val root = buildTree()
    val originals = plain(root).inputFiles
    // land TWO new files and remove one ORIGINAL file — the exact churn
    // an ingest cycle produces
    Seq((999999L, 42L, "click", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    Seq((999998L, 77000L, "view", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    val victimPath = originals.min // deterministic ORIGINAL pick
    val victimRows = spark.read.parquet(victimPath)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(new java.io.File(new java.net.URI(victimPath).getPath).delete())
    // stale → loud (the fail-fast), then ONE delta refresh restores it
    intercept[IllegalStateException](
      Routing.route(spark, root, col("user_id").between(100L, 140L)))
    val (scanned, droppedRows) = Routing.refreshIndexes(spark, root)
    // delta cost: 2 new files scanned per manifest (stats + 1 bloom),
    // the vanished file's rows dropped from both
    assert(scanned == 4, s"refresh must scan only the delta: $scanned")
    assert(droppedRows >= 2, s"vanished file must leave both manifests: $droppedRows")
    // routing is live again and sees EXACTLY the post-churn truth
    sameAs(root, col("user_id").between(100L, 140L))
    assert(Routing.readWhere(spark, root,
      col("event_id") === lit(999999L)).count() == 1)
    assert(Routing.readWhere(spark, root,
      col("event_id").isin(victimRows.take(3).toSeq: _*)).count() == 0,
      "rows of the deleted file must be gone from routed reads")
    // the full-scan fallback reads the tree root (no manifest collect),
    // so it tracks churn by construction — and the read proves it
    val r = Routing.route(spark, root, upper(col("event_type")) === lit("X"))
    assert(r.files == Seq(s"$root/data"),
      s"fallback must be the tree root: ${r.files}")
    assert(Routing.readWhere(spark, root,
        upper(col("event_type")) === lit("CLICK")).count() ==
      plain(root).filter(upper(col("event_type")) === lit("CLICK")).count(),
      "fallback read must see the post-churn tree")
    // metadata-only agg behind the SAME gate: exact post-churn counts
    // from the manifest alone, and stale → loud (not a wrong number)
    val agg = Routing.aggStats(spark, root, Seq("user_id")).head()
    assert(agg.getLong(0) == plain(root).count(),
      s"aggStats must equal the live count: $agg")
    Seq((999997L, 1L, "x", 0.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    intercept[IllegalStateException](
      Routing.aggStats(spark, root, Seq("user_id")))
  }

  test("an in-place content change is rescanned by refresh, never healed") {
    import spark.implicits._
    val root = buildTree()
    // overwrite one original file IN PLACE (same path, different rows):
    // the path-set delta is empty, so a path-only refresh would restamp
    // the fingerprint while keeping the old file's bounds — silently
    // wrong pruning; the recorded per-file (len, mtime) must catch it
    val victim = plain(root).inputFiles.min
    val vFile = java.nio.file.Paths.get(new java.net.URI(victim).getPath)
    val stage = tmp() + "/stage"
    (1 to 500).map(i => (888000L + i, 42L, "click", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(stage)
    val newPart = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    java.nio.file.Files.copy(newPart, vFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // the raw copy leaves Hadoop's local-FS .crc sidecar stale — drop it
    // (a real writer would rewrite it with the file)
    java.nio.file.Files.deleteIfExists(
      vFile.getParent.resolve("." + vFile.getFileName.toString + ".crc"))
    spark.catalog.refreshByPath(s"$root/data") // drop cached file statuses
    intercept[IllegalStateException](
      Routing.route(spark, root, col("user_id").between(100L, 140L)))
    val (scanned, dropped) = Routing.refreshIndexes(spark, root)
    // the changed file rescans in BOTH manifests (stats + bloom)
    assert(scanned == 2 && dropped == 2,
      s"in-place change must rescan, got scanned=$scanned dropped=$dropped")
    // the new content routes, and routing equals the plain scan again
    assert(Routing.readWhere(spark, root,
      col("event_id") === lit(888001L)).count() == 1,
      "refreshed index must see the overwritten file's NEW rows")
    sameAs(root, col("user_id").between(30L, 60L))
    sameAs(root, col("event_id").isin(888100L, 17L))
  }

  test("a metadata-preserving rename is caught by the per-file fingerprint") {
    val root = buildTree()
    // rename one data file: count, total bytes, and max mtime all
    // survive — the old aggregate fingerprint passed this as fresh and
    // stale bounds then silently excluded the file from routed reads
    val victim = plain(root).inputFiles.min
    val vPath = java.nio.file.Paths.get(new java.net.URI(victim).getPath)
    val renamed = vPath.getParent.resolve("zz-" + vPath.getFileName)
    val crc = vPath.getParent.resolve("." + vPath.getFileName + ".crc")
    java.nio.file.Files.move(vPath, renamed)
    if (java.nio.file.Files.exists(crc))
      java.nio.file.Files.move(crc,
        vPath.getParent.resolve("." + renamed.getFileName + ".crc"))
    spark.catalog.refreshByPath(s"$root/data")
    val ex = intercept[IllegalStateException](
      Routing.route(spark, root, col("user_id").between(100L, 140L)))
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    // one delta refresh heals it: the rename is one drop + one rescan
    // per manifest, and routing equals the plain scan again
    val (scanned, dropped) = Routing.refreshIndexes(spark, root)
    assert(scanned == 2 && dropped == 2,
      s"rename must rescan under the new name: scanned=$scanned dropped=$dropped")
    sameAs(root, col("user_id").between(100L, 140L))
  }

  test("zero-contribution files certify as kept instead of rescanning forever") {
    import spark.implicits._
    val root = tmp()
    // one real file + one zero-row file + one all-NULL-column file:
    // neither of the latter two yields a stats/bloom row, so without
    // meta-only markers every refresh would classify them as 'added'
    Seq[(Long, java.lang.Long)]((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k", "v").coalesce(1).write.mode("append").parquet(s"$root/data")
    Seq.empty[(Long, java.lang.Long)]
      .toDF("k", "v").coalesce(1).write.mode("append").parquet(s"$root/data")
    Seq[(Long, java.lang.Long)]((4L, null), (5L, null))
      .toDF("k", "v").coalesce(1).write.mode("append").parquet(s"$root/data")
    Routing.indexStats(spark, root, Seq("v"))
    Routing.indexBloom(spark, root, "v")
    // no churn → a refresh must scan NOTHING (the markers certify)
    val (scanned, dropped) = Routing.refreshIndexes(spark, root)
    assert(scanned == 0 && dropped == 0,
      s"marker rows must certify no-row files as kept: $scanned/$dropped")
    // routing still works and the all-NULL file never matches a probe
    val r = Routing.route(spark, root, col("v") === lit(10L))
    assert(r.files.size == 1, s"probe must open only the real file: ${r.files}")
    sameAs2(root, col("v") === lit(10L))
    // real churn still registers at delta cost
    Seq[(Long, java.lang.Long)]((6L, 60L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(s"$root/data")
    val (s2, d2) = Routing.refreshIndexes(spark, root)
    assert(s2 == 2 && d2 == 0, s"churn must scan only the new file: $s2/$d2")
    sameAs2(root, col("v") >= lit(20L))
  }

  /** sameAs over the (k, v) mini-table. */
  private def sameAs2(root: String, pred: org.apache.spark.sql.Column): Unit = {
    val got = Routing.readWhere(spark, root, pred)
      .select("k").collect().map(_.getLong(0)).sorted
    val want = plain(root).filter(pred)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want),
      s"routing changed results for $pred: ${got.length} vs ${want.length}")
  }

  test("manifests are pointer-published from day one, refreshes flip atomically with retention") {
    import spark.implicits._
    val root = buildTree()
    // NO flat layout ever exists (review r18: a flat first build made
    // the first refresh a mixed-depth transition window): the BUILD
    // itself lands a pointer-resolved version dir
    val resolved0 = FileStats.resolveManifest(spark, s"$root/ix/stats")
    assert(resolved0 != s"$root/ix/stats",
      "the initial build must already resolve through the pointer")
    assert(new java.io.File(s"$root/ix/stats/_mp").exists())
    assert(!new java.io.File(s"$root/ix/stats").listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "no flat parquet may ever sit in the manifest root")
    val originals = plain(root).inputFiles // BEFORE the append: the
    // victim must be an original file, not the batch we just landed
    // churn that forces BOTH refresh regimes: a new file (append) and a
    // vanished file (staged rewrite of the dropped rows)
    Seq((999999L, 42L, "click", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    val victim = originals.min
    assert(new java.io.File(new java.net.URI(victim).getPath).delete())
    Routing.refreshIndexes(spark, root)
    val resolved = FileStats.resolveManifest(spark, s"$root/ix/stats")
    assert(resolved != resolved0, "a refresh must land a NEW version")
    assert(new java.io.File(resolved0).exists(),
      "the build's version must survive one publish for in-flight readers")
    sameAs(root, col("user_id").between(100L, 140L))
    // a second refresh cycle flips to the next version, retains only
    // the previous one, and sweeps the oldest
    Seq((999998L, 43L, "view", 2.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    Routing.refreshIndexes(spark, root)
    val resolved2 = FileStats.resolveManifest(spark, s"$root/ix/stats")
    assert(resolved2 != resolved, "second rewrite must land a NEW version")
    assert(new java.io.File(resolved).exists(),
      "the previous version must survive one publish for in-flight readers")
    assert(!new java.io.File(resolved0).exists(),
      "the oldest version must be swept after a full retention cycle")
    sameAs(root, col("user_id").between(100L, 140L))
    sameAs(root, col("event_id").isin(999999L, 999998L))
    assert(Routing.readWhere(spark, root,
      col("event_id").isin(999999L, 999998L)).count() == 2)
  }

  test("the DSv2 scan opens the same file set as Routing.route (VERDICT r18 #1)") {
    val root = buildTree()
    def norm(s: String) = normPath(s)
    /** files the executed DSv2 plan's parquet scan reads
      * ([[SparkSpec.scannedFiles]] — one shared helper). */
    def dsv2Files(pred: org.apache.spark.sql.Column): Set[String] = {
      val df = spark.read.format("graft").load(root).filter(pred)
      df.collect()
      scannedFiles(df)
    }
    val total = plain(root).inputFiles.length
    // eq on the Bloom-indexed column
    val eq = col("event_id") === lit(4217L)
    val rEq = Routing.route(spark, root, eq).files.map(norm).toSet
    assert(dsv2Files(eq) == rEq && rEq.size < total,
      "DSv2 eq scan must open exactly the routed set")
    // one-sided range on the zone-mapped column
    val oneSided = col("user_id") >= lit(120L)
    val rOs = Routing.route(spark, root, oneSided).files.map(norm).toSet
    assert(dsv2Files(oneSided) == rOs && rOs.size < total,
      "DSv2 one-sided scan must open exactly the routed set")
    // OR of routable disjuncts
    val or = col("user_id").between(100L, 140L) || col("event_id") === lit(4217L)
    val rOr = Routing.route(spark, root, or).files.map(norm).toSet
    assert(dsv2Files(or) == rOr && rOr.size < total,
      "DSv2 OR scan must open exactly the routed union")
    // and the pushed-filter list is visible in the physical plan
    val plan = spark.read.format("graft").load(root).filter(oneSided)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(user_id,120)"), plan.take(1500))
  }

  test("merge-on-read: a fragmented table resolves through its recorded version column") {
    import spark.implicits._
    val root = tmp() + "/t"
    val b1 = (1L to 2000L).map(k => (k, s"v1-$k", 1L)).toDF("k", "s", "ver")
    val b2 = (1L to 2000L by 10).map(k => (k, s"v2-$k", 2L)).toDF("k", "s", "ver")
    BucketedUpsert.appendFragment(b1, root, "k", 16, tag = 1, versionCol = "ver")
    BucketedUpsert.appendFragment(b2, root, "k", 16, tag = 2, versionCol = "ver")
    // bucket-key probe: only the probed buckets open, and the resolve
    // window runs BEFORE the filter — k=11 was updated, k=12 was not
    val probe = Routing.readWhere(spark, root, col("k").isin(11L, 12L))
    val rows = probe.select("k", "s").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(11L -> "v2-11", 12L -> "v1-12"), s"probe: $rows")
    assert(probe.inputFiles.length <
      graft.lake.BucketedUpsert.read(spark, root).inputFiles.length,
      "the key probe must open a bucket subset")
    // a probe matching only a SUPERSEDED value must return nothing —
    // filtering before resolution would resurrect the old row
    assert(Routing.readWhere(spark, root, col("s") === lit("v1-21")).count() == 0,
      "superseded row resurrected: the resolve must run before the filter")
    // same property through the secondary-index route
    Routing.indexSecondary(spark, root, "k", "s")
    assert(Routing.readWhere(spark, root, col("s") === lit("v1-31")).count() == 0,
      "six route resurrected a superseded row")
    assert(Routing.readWhere(spark, root, col("s") === lit("v2-31"))
      .select("k").head().getLong(0) == 31L)
    // an unroutable predicate: full resolved table, equals readResolved
    val all = Routing.readWhere(spark, root, col("k") % 2 === 1)
      .select("k", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = BucketedUpsert.readResolved(spark, root, "k", "ver")
      .filter(col("k") % 2 === 1)
      .select("k", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all == want)
  }

  test("merge-on-read: a fragmented table with NO recorded version column fails fast") {
    import spark.implicits._
    val root = tmp() + "/t"
    val b1 = (1L to 100L).map(k => (k, 1L)).toDF("k", "ver")
    BucketedUpsert.appendFragment(b1, root, "k", 4, tag = 1) // no versionCol
    BucketedUpsert.appendFragment(b1, root, "k", 4, tag = 2)
    val ex = intercept[IllegalStateException](
      Routing.readWhere(spark, root, col("k") === lit(7L)).count())
    assert(ex.getMessage.contains("no version column"), ex.getMessage)
  }

  test("merge-on-read: a delete version routes through its maintained stats and applies the DV") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type")
    graft.lake.ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "event_id")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    graft.lake.DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    val pred = col("user_id").between(100L, 140L)
    val got = Routing.readWhere(spark, s"$base/v2", pred)
    val gotIds = got.select("event_id").collect().map(_.getLong(0)).sorted
    val wantIds = spark.read.parquet(s"$base/data")
      .filter(pred && !col("user_id").between(80L, 110L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(gotIds.sameElements(wantIds) && wantIds.nonEmpty,
      s"DV-version routing changed results: ${gotIds.length} vs ${wantIds.length}")
    // files-opened pinned: exactly the zone-pruned set, a strict subset
    val manual = FileStats.prunedFiles(spark,
      graft.lake.DeleteWhere.statsDirOf(s"$base/v2"),
      "user_id", lit(100L), lit(140L)).toSet
    val opened = got.inputFiles.filter(_.contains("/data/")).toSet
    assert(opened.size == manual.size,
      s"DV-version route must open exactly the pruned set: ${opened.size} vs ${manual.size}")
    assert(opened.size < spark.read.parquet(s"$base/data").inputFiles.length,
      "the DV-version route must actually prune")
  }

  test("bucketed tables route ranges through the bucket-stats zone maps") {
    import spark.implicits._
    val root = tmp() + "/t"
    // a value column CORRELATED with buckets (v = bucket*100 + jitter):
    // the shape zone maps exist for — each bucket's v-range is narrow
    val keys = spark.range(1, 4001).select(col("id").as("k"))
    val batch = keys.select(col("k"),
      (BucketedUpsert.bucketOf(col("k"), 8) * 100L + col("k") % 50L).as("v"),
      lit(1L).as("ver"))
    BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets = 8, tag = 1)
    Routing.indexBucketStats(spark, root, "k", Seq("v"))
    def sameAsB(pred: org.apache.spark.sql.Column): Unit = {
      val got = Routing.readWhere(spark, root, pred)
        .select("k").collect().map(_.getLong(0)).sorted
      val want = BucketedUpsert.read(spark, root).filter(pred)
        .select("k").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want) && want.nonEmpty,
        s"bucket-stats routing changed results for $pred")
    }
    val total = BucketedUpsert.read(spark, root).inputFiles.length
    // closed range inside ONE bucket's band → only that bucket opens
    val probe = Routing.readWhere(spark, root, col("v").between(210L, 240L))
    assert(probe.inputFiles.length < total,
      s"value range must open a bucket subset: ${probe.inputFiles.length} of $total")
    sameAsB(col("v").between(210L, 240L))
    // one-sided bound routes too (the retention shape)
    val hi = Routing.readWhere(spark, root, col("v") >= lit(700L))
    assert(hi.inputFiles.length < total, "one-sided bound must prune buckets")
    sameAsB(col("v") >= lit(700L))
    // stale index fails fast after a new batch, refresh heals
    BucketedUpsert.applyBatch(
      Seq((1L, 9999L, 2L)).toDF("k", "v", "ver"), root, "k", "ver", 8, tag = 2)
    val ex = intercept[IllegalArgumentException](
      Routing.readWhere(spark, root, col("v").between(210L, 240L)).count())
    assert(ex.getMessage.contains("refresh"), ex.getMessage)
    Routing.indexBucketStats(spark, root, "k", Seq("v"))
    sameAsB(col("v").between(210L, 240L))
    // resolution safety on a FRAGMENTED table: k=5's latest version
    // moves v OUT of the probed range — the superseded in-range row
    // must NOT resurrect (stats are over RESOLVED rows; admitted
    // buckets are read whole and resolved before the filter)
    val froot = tmp() + "/f"
    BucketedUpsert.appendFragment(
      Seq((5L, 100L, 1L), (6L, 110L, 1L)).toDF("k", "v", "ver"),
      froot, "k", 4, tag = 1, versionCol = "ver")
    BucketedUpsert.appendFragment(
      Seq((5L, 900L, 2L)).toDF("k", "v", "ver"),
      froot, "k", 4, tag = 2, versionCol = "ver")
    Routing.indexBucketStats(spark, froot, "k", Seq("v"))
    assert(Routing.readWhere(spark, froot, col("v") === lit(100L)).count() == 0,
      "superseded in-range row resurrected through the bucket-stats route")
    assert(Routing.readWhere(spark, froot, col("v") === lit(110L))
      .select("k").head.getLong(0) == 6L)
    // metadata-only aggregate: exact over resolved rows, tag-gated
    val agg = Routing.aggStats(spark, froot, Seq("v")).head
    assert(agg.getLong(0) == 2L && agg.getLong(1) == 110L &&
      agg.getLong(2) == 900L, s"bucketed aggStats wrong: $agg")
    BucketedUpsert.appendFragment(
      Seq((7L, 1L, 3L)).toDF("k", "v", "ver"),
      froot, "k", 4, tag = 3, versionCol = "ver")
    intercept[IllegalArgumentException](
      Routing.aggStats(spark, froot, Seq("v")))
  }

  test("a delete version routes equality through its per-version Bloom index") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type")
    graft.lake.ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "event_id")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    graft.lake.DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    graft.lake.DeleteWhere.indexBloom(spark, s"$base/v2", "event_id")
    // a present id opens only the Bloom survivors
    val anId = graft.lake.DeleteWhere.read(spark, s"$base/v2")
      .select("event_id").head.getLong(0)
    val got = Routing.readWhere(spark, s"$base/v2",
      col("event_id") === lit(anId))
    assert(got.count() == 1)
    val survivors = BloomIndex.survivors(spark, s"$base/v2/bloom/event_id",
      Seq(anId.toString)).toSet
    val opened = got.inputFiles.filter(_.contains("/data/")).toSet
    assert(opened.size == survivors.size && opened.size <
      spark.read.parquet(s"$base/data").inputFiles.length,
      s"DV bloom route must open exactly the survivors: " +
        s"${opened.size} vs ${survivors.size}")
    // a DV-MASKED row's id: the Bloom admits its file, the mask hides
    // the row — composition must return nothing
    val maskedId = spark.read.parquet(s"$base/data")
      .filter(col("user_id").between(80L, 110L))
      .select("event_id").head.getLong(0)
    assert(Routing.readWhere(spark, s"$base/v2",
      col("event_id") === lit(maskedId)).count() == 0,
      "the DV mask must still hide rows the Bloom admits")
    // metadata-only aggregate on the version: count EXACT (mask
    // subtracted), min/max conservative bounds containing the truth
    val agg = Routing.aggStats(spark, s"$base/v2", Seq("user_id")).head
    val truth = graft.lake.DeleteWhere.read(spark, s"$base/v2")
      .agg(count(lit(1)), min("user_id"), max("user_id")).head
    assert(agg.getLong(0) == truth.getLong(0),
      s"DV aggStats count must be exact: ${agg.getLong(0)} vs ${truth.getLong(0)}")
    assert(agg.getLong(1) <= truth.getLong(1) && agg.getLong(2) >= truth.getLong(2),
      "DV aggStats bounds must contain the true extrema")
  }

  test("a torn per-version Bloom build is never consulted (ADVICE r18)") {
    import spark.implicits._
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type")
    graft.lake.ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "event_id")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    graft.lake.DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    val anId = graft.lake.DeleteWhere.read(spark, s"$base/v2")
      .select("event_id").head.getLong(0)
    // simulate a CRASH MID-BUILD: the bloom dir exists and even holds
    // plausible-looking parquet, but the publish never completed (no
    // pointer). Word rows for the needle's file may be missing — the
    // old existence gate consulted it and silently dropped the file;
    // the pointer gate must fail LOUD naming the rebuild (silently
    // treating it as absent would drop the pruning the operator
    // believes exists).
    Seq(("/nonexistent/file.parquet", 0, 0L, 16, 3))
      .toDF("path", "w", "bits", "m_log2", "k")
      .write.parquet(s"$base/v2/bloom/event_id")
    assert(!new java.io.File(s"$base/v2/bloom/event_id/_mp").exists(),
      "precondition: the torn build must have no pointer")
    val ex = intercept[IllegalArgumentException](
      Routing.readWhere(spark, s"$base/v2",
        col("event_id") === lit(anId)).count())
    assert(ex.getMessage.contains("rebuild"), ex.getMessage)
    // predicates that never consult the Bloom still read fine
    assert(Routing.readWhere(spark, s"$base/v2",
      col("user_id") >= lit(0L)).count() > 0)
    // a COMPLETED build is pointer-published and then consulted
    graft.lake.DeleteWhere.indexBloom(spark, s"$base/v2", "event_id")
    assert(new java.io.File(s"$base/v2/bloom/event_id/_mp").exists(),
      "indexBloom must pointer-publish")
    val routed = Routing.readWhere(spark, s"$base/v2",
      col("event_id") === lit(anId))
    assert(routed.count() == 1)
    assert(routed.inputFiles.count(_.contains("/data/")) <
      spark.read.parquet(s"$base/data").inputFiles.length,
      "the completed Bloom must actually prune")
  }

  test("bucketed tables route equality through the secondary index") {
    import spark.implicits._
    val root = tmp()
    val batch = (1L to 2000L).map(k => (k, s"name-$k", 1L)).toDF("k", "s", "ver")
    BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets = 16, tag = 1)
    Routing.indexSecondary(spark, root, "k", "s")
    val got = Routing.readWhere(spark, root,
      col("s").isin("name-17", "name-999", "absent"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == Set(17L, 999L))
    // a second conjunct post-filters on top of the index route
    val got2 = Routing.readWhere(spark, root,
      col("s").isin("name-17", "name-999") && col("k") > lit(500L))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got2 == Set(999L))
    // eq on the BUCKET KEY routes without any index at all: the key
    // hashes to its bucket, and only that bucket's files open
    val keyProbe = Routing.readWhere(spark, root, col("k") === lit(42L))
    assert(keyProbe.select("s").head.getString(0) == "name-42")
    val opened = keyProbe.inputFiles.length
    val total = BucketedUpsert.read(spark, root).inputFiles.length
    assert(opened < total,
      s"key point-lookup must open a bucket subset: $opened of $total")
    // IN on the key: the union of the probed buckets, still a subset
    val multi = Routing.readWhere(spark, root, col("k").isin(1L, 2L, 777L))
    assert(multi.select("k").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 777L))
    // OR-of-equalities on the key IS an IN (review r18 normalization):
    // the most natural point-lookup spelling must route identically
    val orEq = Routing.readWhere(spark, root,
      col("k") === lit(1L) || col("k") === lit(777L))
    assert(orEq.select("k").collect().map(_.getLong(0)).toSet ==
      Set(1L, 777L))
    assert(orEq.inputFiles.length < total,
      "OR-of-key-equalities must open a bucket subset, not full-scan")
    // ...including under a conjunction with an opaque residual
    val orEq2 = Routing.readWhere(spark, root,
      (col("k") === lit(1L) || col("k") === lit(777L)) && col("k") > lit(10L))
    assert(orEq2.select("k").collect().map(_.getLong(0)).toSet == Set(777L))
    assert(orEq2.inputFiles.length < total)
    // a mis-typed direct probe fails fast instead of silently missing
    val ex = intercept[IllegalArgumentException](
      BucketedUpsert.readKeyBuckets(spark, root, "k",
        Seq(lit(42))).count()) // INT probe into a LONG-keyed table
    assert(ex.getMessage.contains("type-sensitive"), ex.getMessage)
  }
}
