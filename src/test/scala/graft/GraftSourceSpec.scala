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

  test("merge-on-read shapes refuse loudly, naming the API that serves them") {
    import spark.implicits._
    // delete version → the DV mask cannot be a scan
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .select("event_id", "user_id", "event_type")
    ZOrder.writeZOrdered(ev, s"$base/data", 8, "user_id", "event_id")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    graft.lake.DeleteWhere.deleteVectors(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    val ex2 = intercept[IllegalArgumentException](load(s"$base/v2").count())
    assert(ex2.getMessage.contains("readWhere"), ex2.getMessage)
    // not a graft root at all
    val ex3 = intercept[IllegalArgumentException](load(tmp()).count())
    assert(ex3.getMessage.contains("data"), ex3.getMessage)
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
