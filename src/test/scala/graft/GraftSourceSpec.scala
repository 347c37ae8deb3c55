package graft

import graft.lake.{BucketedUpsert, FileStats, Routing, ZOrder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The DSv2 face of the routed lake ([[graft.sources.GraftSource]]):
  * `spark.read.format("graft")` / plain `spark.sql` must get the SAME
  * index pruning as the `Routing.readWhere` library call, with
  * identical results, loud shape guards, and the pushed-filter list
  * visible in the physical plan.
  */
class GraftSourceSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("gsrc-spec").toString

  private def norm(s: String): String = normPath(s)

  /** events tree z-ordered on user_id with stats(user_id) +
    * bloom(event_id) — the RoutingSpec fixture shape. */
  private def buildTree(): String = {
    val root = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type", "value")
    ZOrder.writeZOrdered(ev, s"$root/data", 16, "user_id", "event_id")
    Routing.indexStats(spark, root, Seq("user_id"))
    Routing.indexBloom(spark, root, "event_id")
    root
  }

  // scannedFiles comes from SparkSpec (shared with RoutingSpec)

  private def load(root: String): DataFrame =
    spark.read.format("graft").load(root)

  test("results equal the plain filtered scan on every predicate class") {
    val root = buildTree()
    val plain = spark.read.parquet(s"$root/data")
    for (pred <- Seq(
        col("user_id").between(100L, 140L),
        col("event_id") === lit(4217L),
        col("user_id") >= lit(120L),
        col("user_id") <= lit(10L) || col("user_id") >= lit(140L),
        col("event_type") === lit("click") && col("user_id") <= lit(30L),
        upper(col("event_type")) === lit("CLICK"), // opaque: full scan
        col("user_id").between(99999L, 100001L))) { // empty result
      val got = load(root).filter(pred)
        .select("event_id").collect().map(_.getLong(0)).sorted
      val want = plain.filter(pred)
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want),
        s"DSv2 changed results for $pred: ${got.length} vs ${want.length}")
    }
    // no filter at all, ROW read: the full tree through the plain
    // unfiltered scan branch (collect() cannot push as an aggregate —
    // count() now can, and is covered by the agg-pushdown test)
    assert(load(root).select("event_id").collect().length ==
      plain.count().toInt)
  }

  test("plain spark.sql over a graft view gets index pruning") {
    val root = buildTree()
    val total = spark.read.parquet(s"$root/data").inputFiles.length
    load(root).createOrReplaceTempView("g_events")
    val df = spark.sql(
      "SELECT event_id, user_id FROM g_events WHERE user_id >= 120")
    val want = spark.read.parquet(s"$root/data")
      .filter(col("user_id") >= 120L).count()
    assert(df.count() == want && want > 0)
    val opened = scannedFiles(df)
    assert(opened.nonEmpty && opened.size < total,
      s"SQL over the view must prune: ${opened.size} of $total files")
    // and the routed set IS Routing.route's
    val r = Routing.route(spark, root, col("user_id") >= lit(120L))
    assert(opened == r.files.map(norm).toSet,
      "SQL pruning must equal the library route")
  }

  test("column pruning reaches the parquet scan") {
    val root = buildTree()
    val df = load(root).filter(col("user_id") >= lit(120L))
      .select("event_id")
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collect { case b: BatchScanExec => b }.head.scan
    val read = scan.readSchema().fieldNames.toSet
    assert(read.subsetOf(Set("event_id", "user_id")) && read("event_id"),
      s"scan must read only the needed columns, got $read")
    assert(!read("value") && !read("event_type"),
      "unused columns must be pruned from the parquet read")
  }

  test("the pushed-filter list is visible in the physical plan") {
    val root = buildTree()
    val df = load(root).filter(col("user_id") >= lit(120L) &&
      col("event_id") === lit(4217L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(user_id,120)") &&
      plan.contains("EqualTo(event_id,4217)"),
      s"both pushed filters must show in the plan:\n${plan.take(2000)}")
  }

  test("a hive-partitioned tree keeps its partition columns and routes data filters") {
    import spark.implicits._
    val root = tmp()
    (1 to 2000).map(i => (i.toLong, i.toLong % 500L, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "uid", "part")
      .write.partitionBy("part").parquet(s"$root/data")
    val schema = load(root).schema
    assert(schema.fieldNames.contains("part"),
      s"partition column must survive: ${schema.fieldNames.mkString(",")}")
    val got = load(root).filter(col("part") === "a" && col("uid") <= 5L)
      .select("id", "part").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = spark.read.parquet(s"$root/data")
      .filter(col("part") === "a" && col("uid") <= 5L)
      .select("id", "part").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.sameElements(want.sorted) && want.nonEmpty,
      s"partitioned read mismatch: ${got.length} vs ${want.length}")
  }

  test("bucketed tables route key probes, six lookups, and bucket-stats ranges at file level") {
    import spark.implicits._
    val root = tmp() + "/t"
    val batch = (1L to 4000L).map(k => (k, s"name-$k", 1L))
      .toDF("k", "s", "ver")
      // value column CORRELATED with buckets so zone maps have ranges
      .select(col("k"), col("s"),
        (BucketedUpsert.bucketOf(col("k"), 16) * 100L + col("k") % 50L)
          .cast("long").as("v"), col("ver"))
    BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets = 16, tag = 1)
    Routing.indexSecondary(spark, root, "k", "s")
    Routing.indexBucketStats(spark, root, "k", Seq("v"))
    val total = BucketedUpsert.read(spark, root).inputFiles.length
    def opened(df: DataFrame): Int = scannedFiles(df).size
    // key probe: only the probed buckets
    val kp = load(root).filter(col("k").isin(42L, 777L))
    assert(kp.select("s").collect().map(_.getString(0)).toSet ==
      Set("name-42", "name-777"))
    assert(opened(kp) < total, s"key probe must prune: ${opened(kp)}/$total")
    assert(opened(kp) == Routing.routeBucketed(spark, root,
      col("k").isin(42L, 777L)).files.size)
    // secondary-index route on a non-key column
    val six = load(root).filter(col("s") === "name-99")
    assert(six.select("k").head.getLong(0) == 99L)
    assert(opened(six) < total, "six route must prune")
    // bucket-stats range on the value column
    val bs = load(root).filter(col("v").between(210L, 240L))
    val want = BucketedUpsert.read(spark, root)
      .filter(col("v").between(210L, 240L)).count()
    assert(bs.count() == want && want > 0)
    assert(opened(bs) < total, "bucket-stats route must prune")
    // plain SQL through a view routes the same way
    load(root).createOrReplaceTempView("g_bucketed")
    val sq = spark.sql("SELECT s FROM g_bucketed WHERE k = 1234")
    assert(sq.head.getString(0) == "name-1234")
    assert(opened(sq) < total, "SQL key probe must prune")
    // a FRAGMENTING batch flips the table to loud refusal at scan build
    BucketedUpsert.appendFragment(
      Seq((1L, "x", 0L, 2L)).toDF("k", "s", "v", "ver"),
      root, "k", 16, tag = 2, versionCol = "ver")
    val ex = intercept[IllegalArgumentException](load(root).count())
    assert(ex.getMessage.contains("FRAGMENTED") &&
      ex.getMessage.contains("readWhere"), ex.getMessage)
  }

  test("unfiltered count/min/max answer from the stats manifest — zero data files opened") {
    import spark.implicits._
    val root = buildTree()
    val plain = spark.read.parquet(s"$root/data")
    load(root).createOrReplaceTempView("g_agg")
    val df = spark.sql(
      "SELECT count(*) AS n, min(user_id) AS mn, max(user_id) AS mx FROM g_agg")
    val want = plain.agg(count(lit(1)), min("user_id"), max("user_id")).head
    val got = df.head
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1)
      && got.getLong(2) == want.getLong(2), s"agg pushdown wrong: $got vs $want")
    assert(scannedFiles(df).isEmpty,
      "a manifest-served aggregate must open no data files")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      df.queryExecution.executedPlan.toString.take(800))
    // a FILTERED aggregate falls back to the (routed) scan, exact
    val f = spark.sql("SELECT count(*) AS n FROM g_agg WHERE user_id >= 120")
    assert(f.head.getLong(0) ==
      plain.filter(col("user_id") >= 120L).count())
    assert(scannedFiles(f).nonEmpty, "filtered aggregates must scan")
    // min/max on an UNINDEXED column falls back, exact
    val u = spark.sql("SELECT min(event_id) AS m FROM g_agg")
    assert(u.head.getLong(0) == plain.agg(min("event_id")).head.getLong(0))
    assert(scannedFiles(u).nonEmpty, "unindexed aggregates must scan")
    // STALE manifest → silent fallback to the full scan (which is
    // always correct — unlike routed reads, a skipped pushdown costs
    // only speed, so no loud gate here)
    Seq((999999L, 424242L, "click", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    spark.catalog.refreshByPath(s"$root/data")
    val s = spark.sql("SELECT count(*) AS n, max(user_id) AS mx FROM g_agg")
    assert(s.head.getLong(0) == spark.read.parquet(s"$root/data").count() &&
      s.head.getLong(1) == 424242L,
      "a stale manifest must fall back to the scan, never serve old stats")
    assert(scannedFiles(s).nonEmpty)
  }

  test("delete versions serve natively: DV mask in the readers, library-equal file admission") {
    // r20 (VERDICT r19 #3): the shape that used to refuse at the DSv2
    // door now scans — files admitted by the SAME routeDeleteVersion
    // the library uses, DV mask applied inside per-file readers.
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type")
    ZOrder.writeZOrdered(ev, s"$base/data", 8, "user_id", "event_id")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    graft.lake.DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    graft.lake.DeleteWhere.indexBloom(spark, s"$base/v2", "event_id")
    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L))
    // full read equals the full-scan delete
    assert(load(s"$base/v2").select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(want.select("event_id").collect().map(_.getLong(0)).sorted))
    // count() is metadata-only: manifest n_rows minus the DV mask
    val cnt = load(s"$base/v2").groupBy().count()
    assert(cnt.head.getLong(0) == want.count())
    assert(scannedFiles(cnt).isEmpty,
      "DV count must answer from the maintained manifest, zero files")
    // min/max on a DV version must NOT push (manifest bounds are
    // conservative once a row may be masked) — scans, and is exact
    val mm = load(s"$base/v2").agg(min("user_id"), max("user_id"))
    assert(scannedFiles(mm).nonEmpty, "DV min/max must fall back to the scan")
    val mmr = mm.head
    val wantMm = want.agg(min("user_id"), max("user_id")).head
    assert(mmr.getLong(0) == wantMm.getLong(0) &&
      mmr.getLong(1) == wantMm.getLong(1))
    // an indexed point probe opens exactly the library route's files
    // (zone maps + per-version Bloom), fewer than the version holds
    val pred = col("event_id").isin(17L, 4217L)
    val df = load(s"$base/v2").filter(pred)
    assert(df.select("event_id").collect().map(_.getLong(0)).sorted
      .sameElements(want.filter(pred).select("event_id").collect()
        .map(_.getLong(0)).sorted))
    val (routeFiles, _, via) =
      Routing.routeDeleteVersion(spark, s"$base/v2", pred)
    assert(scannedFiles(df) == routeFiles.map(norm).toSet,
      "DSv2 DV admission must equal the library route")
    assert(via.exists(_.startsWith("dv-bloom")), via.mkString(","))
    assert(routeFiles.size <
      graft.lake.DeleteWhere.manifestPaths(spark, s"$base/v2").size,
      "the probe must actually prune")
    // past the broadcast regime the scan refuses loudly, naming both
    // the degraded read and the fix
    spark.conf.set("graft.dv.maxBroadcastRows", "1")
    try {
      val ex = intercept[IllegalArgumentException](
        load(s"$base/v2").select("event_id").collect())
      assert(ex.getMessage.contains("readWhere") &&
        ex.getMessage.contains("compactVersion"), ex.getMessage)
    } finally spark.conf.unset("graft.dv.maxBroadcastRows")
    // not a graft root at all still refuses
    val ex3 = intercept[IllegalArgumentException](load(tmp()).count())
    assert(ex3.getMessage.contains("data"), ex3.getMessage)
  }

  test("a mask-free delete version (deleteRange) pushes min/max too — its bounds are exact") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type")
    ZOrder.writeZOrdered(ev, s"$base/data", 8, "user_id", "event_id")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    // PHYSICAL delete: the new version carries maintained stats and NO
    // DV sidecar, so min/max over live rows are exact from metadata
    graft.lake.DeleteWhere.deleteRange(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L))
      .agg(count(lit(1)), min("user_id"), max("user_id")).head
    val df = load(s"$base/v2").groupBy()
      .agg(count(lit(1)).as("n"), min("user_id").as("mn"),
        max("user_id").as("mx"))
    val got = df.head
    assert(got.getLong(0) == want.getLong(0) &&
      got.getLong(1) == want.getLong(1) && got.getLong(2) == want.getLong(2),
      s"$got vs $want")
    assert(scannedFiles(df).isEmpty,
      "a mask-free version's min/max must answer from the maintained " +
        "manifest, zero files")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("bucketed aggregates push to the BucketStats manifest — zero files, resolved-exact") {
    import spark.implicits._
    val root = tmp() + "/t"
    val batch = (1L to 3000L).map(k => (k, k * 7L, 1L)).toDF("k", "v", "ver")
    BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets = 8, tag = 1)
    Routing.indexBucketStats(spark, root, "k", Seq("v"))
    val df = load(root).groupBy()
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
    val got = df.head
    assert(got.getLong(0) == 3000L && got.getLong(1) == 7L &&
      got.getLong(2) == 21000L, got.toString)
    assert(scannedFiles(df).isEmpty,
      "bucketed aggregate must answer from BucketStats, zero files")
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // an upsert WITHOUT a bstats refresh → tag parity breaks → silent
    // fallback to the scan, still exact over resolved rows
    BucketedUpsert.applyBatch(
      Seq((1L, 999999L, 2L)).toDF("k", "v", "ver"),
      root, "k", "ver", nBuckets = 8, tag = 2)
    val stale = load(root).groupBy().agg(max("v").as("mx"))
    assert(stale.head.getLong(0) == 999999L,
      "a stale bstats index must fall back to the scan, never serve old stats")
    assert(scannedFiles(stale).nonEmpty)
  }

  test("GraftSql.registerView picks the strongest face per shape") {
    import spark.implicits._
    val root = tmp() + "/t"
    val base = (1L to 500L).map(k => (k, k * 2L, 1L)).toDF("k", "v", "ver")
    BucketedUpsert.appendFragment(base, root, "k", nBuckets = 4, tag = 1,
      versionCol = "ver")
    // unfragmented (one fragment per bucket) → the DSv2 face
    assert(graft.sources.GraftSql.registerView(spark, root, "gsql_v") ==
      "graft")
    // an overlay fragment → the resolved library plan, correct rows
    BucketedUpsert.appendFragment(
      (1L to 100L).map(k => (k, -k, 2L)).toDF("k", "v", "ver"),
      root, "k", nBuckets = 4, tag = 2, versionCol = "ver")
    assert(graft.sources.GraftSql.registerView(spark, root, "gsql_v") ==
      "resolved")
    val got = spark.sql("SELECT sum(v) AS s FROM gsql_v").head.getLong(0)
    val wantSum = (101L to 500L).map(_ * 2L).sum + (1L to 100L).map(-_).sum
    assert(got == wantSum, s"resolution through the view drifted: $got")
  }

  test("a stale manifest fails fast through the DSv2 path too") {
    import spark.implicits._
    val root = buildTree()
    val df = load(root) // table resolves against the CURRENT tree
    Seq((999999L, 42L, "click", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("append").parquet(s"$root/data")
    // a routed predicate consults the stats manifest → loud
    val ex = intercept[IllegalStateException](
      df.filter(col("user_id") >= lit(120L)).count())
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    // an unfiltered read consults NO manifest → plain scan, sees all
    // rows including the new one (exactly spark.read.parquet semantics)
    assert(load(root).count() ==
      spark.read.parquet(s"$root/data").count())
  }
}
