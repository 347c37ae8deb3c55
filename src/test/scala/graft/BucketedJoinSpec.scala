package graft

import graft.lake.BucketedUpsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-bucketed shuffle-free join: result equality with a plain join
  * (the correctness law), ZERO ShuffleExchange in the executed plan
  * (the point of the operator), survival across upsert/delete
  * generations (the manifest spans version dirs), and fail-fast on
  * mismatched bucket counts (co-location would be a lie).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("bjoin-spec").toString

  // PlanInspect recurses through AQE's QueryStage leaf wrappers — a
  // naive collect over the adaptive plan would see NO exchanges and the
  // zero-shuffle asserts below would pass vacuously
  private def shuffles(df: DataFrame) = graft.plans.PlanInspect.shufflesOf(df)

  test("the naive (non-bucketed) shape of the same join DOES shuffle — the collector is not blind") {
    val base = tmp()
    val l = s"$base/left"; val r = s"$base/right"
    BucketedUpsert.applyBatch(
      (1L to 500L).map(k => (k, 1L)).toDF("k", "ver"), l, "k", "ver", 4, 1)
    BucketedUpsert.applyBatch(
      (1L to 500L).map(k => (k, 1L)).toDF("k", "ver"), r, "k", "ver", 4, 1)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val naive = BucketedUpsert.read(spark, l)
        .join(BucketedUpsert.read(spark, r), Seq("k"))
      assert(shuffles(naive).nonEmpty,
        "control: the plain join must show its exchanges, else every " +
          "zero-shuffle assert in this suite is vacuous")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketedJoin equals the plain join and runs with ZERO exchange") {
    val base = tmp()
    val l = s"$base/left"; val r = s"$base/right"
    val left = (1L to 3000L).map(k => (k, s"l-$k", 1L)).toDF("k", "lv", "ver")
    val right = (1500L to 4500L).map(k => (k, k * 2.0, 1L)).toDF("k", "rv", "ver")
    BucketedUpsert.applyBatch(left, l, "k", "ver", nBuckets = 8, tag = 1)
    BucketedUpsert.applyBatch(right, r, "k", "ver", nBuckets = 8, tag = 1)
    // disable broadcast so the test exercises the big-big (SMJ) path —
    // the one where the shuffle elision matters at 100 TB
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedUpsert.bucketedJoin(spark, l, r, "k")
      val got = joined.select("k", "lv", "rv").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSet
      val want = BucketedUpsert.read(spark, l)
        .join(BucketedUpsert.read(spark, r), Seq("k"))
        .select("k", "lv", "rv").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSet
      assert(got == want && got.size == 1501, s"join result wrong: ${got.size}")
      val sh = shuffles(joined.select("k", "lv", "rv"))
      assert(sh.isEmpty,
        s"co-bucketed join must add NO exchange, found ${sh.map(_.nodeName)}")
      // outer flavors ride the same machinery
      val lo = BucketedUpsert.bucketedJoin(spark, l, r, "k", "left_outer")
      assert(lo.count() == 3000L)
      assert(shuffles(lo).isEmpty, "left_outer must stay exchange-free")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketedJoin stays correct and exchange-free across upsert and delete generations") {
    val base = tmp()
    val l = s"$base/left"; val r = s"$base/right"
    BucketedUpsert.applyBatch(
      (1L to 1000L).map(k => (k, s"l-$k", 1L)).toDF("k", "lv", "ver"),
      l, "k", "ver", nBuckets = 4, tag = 1)
    BucketedUpsert.applyBatch(
      (1L to 1000L).map(k => (k, k * 1.0, 1L)).toDF("k", "rv", "ver"),
      r, "k", "ver", nBuckets = 4, tag = 1)
    // generation 2: rename a key on the left, delete a key on the right
    BucketedUpsert.applyBatch(Seq((7L, "renamed-7", 2L)).toDF("k", "lv", "ver"),
      l, "k", "ver", nBuckets = 4, tag = 2)
    BucketedUpsert.deleteKeys(spark, r, "k", Seq(13L).toDF("k"), tag = 2)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedUpsert.bucketedJoin(spark, l, r, "k")
      val rows = joined.select("k", "lv").collect()
        .map(x => (x.getLong(0), x.getString(1))).toMap
      assert(rows.size == 999 && rows(7L) == "renamed-7" && !rows.contains(13L),
        s"generation-spanning join wrong: ${rows.size}")
      assert(shuffles(joined.select("k", "lv")).isEmpty,
        "multi-generation manifest must still join exchange-free")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mismatched bucket counts rebucket ONLY the smaller side (one exchange); unstamped legacy files fail fast") {
    val base = tmp()
    val l = s"$base/left"; val r = s"$base/right"
    BucketedUpsert.applyBatch(
      (1L to 100L).map(k => (k, s"l-$k", 1L)).toDF("k", "lv", "ver"),
      l, "k", "ver", nBuckets = 4, tag = 1)
    BucketedUpsert.applyBatch(
      (2L to 200L).map(k => (k, k * 7, 1L)).toDF("k", "rv", "ver"),
      r, "k", "ver", nBuckets = 8, tag = 1)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedUpsert.bucketedJoin(spark, l, r, "k")
        .select("k", "lv", "rv")
      val got = joined.collect().map(x => (x.getLong(0),
        (x.getString(1), x.getLong(2)))).toMap
      assert(got.size == 99 && got(42L) == (("l-42", 294L)),
        s"rebucket join wrong: ${got.size}")
      // exactly ONE exchange, and it moves the SMALLER (4-bucket) side
      // into the larger side's bucketing — the 8-bucket side stays
      // zero-shuffle (the caller-level fallback shuffled BOTH sides)
      val sh = graft.plans.PlanInspect.shuffles(
        joined.queryExecution.executedPlan)
      assert(sh.size == 1, s"expected exactly one exchange, got ${sh.size}")
      val shuffledRoots = graft.plans.PlanInspect.fileScans(sh.head)
        .flatMap(_.relation.location.rootPaths.map(_.toString))
      assert(shuffledRoots.nonEmpty && shuffledRoots.forall(_.contains("/left/")),
        s"the exchange must carry only the smaller side's scan: $shuffledRoots")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    // strip the stamps from one file → bucketedRead must refuse, not
    // silently mis-bucket
    val dir = new java.io.File(l)
    val stamped = java.nio.file.Files.walk(dir.toPath).iterator()
    var renamed = false
    stamped.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (!renamed && !n.startsWith(".") && n.endsWith(".parquet") &&
          n.matches(".*_\\d{5}\\..*")) {
        java.nio.file.Files.move(p, p.resolveSibling(n.replaceFirst("_\\d{5}", "")))
        renamed = true
      }
    }
    assert(renamed, "expected at least one stamped file to strip")
    val ex2 = intercept[IllegalArgumentException](
      BucketedUpsert.bucketedRead(spark, l, "k"))
    assert(ex2.getMessage.contains("no bucket stamp"))
  }

  test("single-file sorted buckets elide the join's SortExec too") {
    val base = tmp()
    val l = s"$base/left"; val r = s"$base/right"
    BucketedUpsert.applyBatch(
      (1L to 2000L).map(k => (k, s"l-$k", 1L)).toDF("k", "lv", "ver"),
      l, "k", "ver", nBuckets = 8, tag = 1)
    BucketedUpsert.applyBatch(
      (1L to 2000L).map(k => (k, k * 3, 1L)).toDF("k", "rv", "ver"),
      r, "k", "ver", nBuckets = 8, tag = 1)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // honoring per-bucket file order forbids file SPLITTING, so Spark
    // gates the ordering claim behind this opt-in (the user's trade:
    // sort-free SMJ vs intra-file scan parallelism)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = BucketedUpsert.bucketedJoin(spark, l, r, "k")
        .select("k", "lv", "rv")
      val got = joined.collect().map(x => (x.getLong(0), x.getString(1))).toMap
      assert(got.size == 2000 && got(42L) == "l-42")
      // files are key-sorted and the manifest certifies it, so the
      // scan claims the ordering and SMJ needs neither Exchange NOR Sort
      def sorts(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            sorts(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            sorts(q.plan)
          case s: org.apache.spark.sql.execution.SortExec => Seq(s.nodeName)
        }.flatten
      assert(graft.plans.PlanInspect.shuffles(
        joined.queryExecution.executedPlan).isEmpty)
      assert(sorts(joined.queryExecution.executedPlan).isEmpty,
        "sorted single-file buckets must elide the SMJ sorts")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("bucketedRead also elides the exchange under a groupBy on the key") {
    val base = tmp()
    val l = s"$base/t"
    BucketedUpsert.applyBatch(
      (1L to 2000L).map(k => (k, k % 97, 1L)).toDF("k", "v", "ver"),
      l, "k", "ver", nBuckets = 8, tag = 1)
    val agg = BucketedUpsert.bucketedRead(spark, l, "k")
      .groupBy("k").agg(sum("v").as("sv"))
    assert(agg.count() == 2000L)
    assert(shuffles(agg).isEmpty,
      "aggregation on the bucket key must be exchange-free")
  }
}
