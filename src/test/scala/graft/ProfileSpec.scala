package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Profile must count nulls and distincts exactly, render bounds
  * post-aggregate, stay a single scan however many columns are
  * profiled, and degrade to sketch NDV on request.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiles nulls, distincts, and bounds exactly") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (2L, "a"), (null, "a"), (3L, null)
    ).toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = p("k"); val s = p("s")
    assert(k.getLong(1) == 5 && k.getLong(2) == 1 && k.getLong(3) == 3)
    assert(k.getString(4) == "1" && k.getString(5) == "3")
    assert(s.getLong(2) == 2 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
  }

  test("bounded scans no matter how many columns; approx mode is one scan, no Expand") {
    val base = java.nio.file.Files.createTempDirectory("profile-spec").toString
    graft.Tables.t(spark, sf("sf0.001"), "lineitem").write.parquet(s"$base/li")
    val df = spark.read.parquet(s"$base/li")

    // exact: TWO scans however many columns — the plain pass and the
    // multi-distinct Expand pass (fusing them forces sort-based
    // aggregation; see Profile scaladoc)
    val exact = Profile.profile(df, Seq("l_orderkey", "l_suppkey", "l_returnflag"))
    val planE = exact.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(planE).size == 2,
      s"exact profile must be exactly two scans:\n$planE")
    assert(planE.contains("Expand"), "multi-distinct compiles through Expand")
    // the point of the split: the EXPANDED (data × #cols) stream goes
    // through hash aggregation — the fused plan sort-aggregates it.
    // (The plain pass's global min(string) agg is legitimately
    // sort-based: partials reduce each partition to one row first.)
    assert(planE.contains("HashAggregate"),
      s"the NDV pass over the Expand must hash-aggregate:\n$planE")
    val expandBlock = planE.split("Expand").head
    assert(expandBlock.linesIterator.toSeq.reverse.take(3)
      .exists(_.contains("HashAggregate")),
      s"the aggregate directly above Expand must be hash-based:\n$planE")

    val approx = Profile.profile(df, Seq("l_orderkey", "l_suppkey"), exact = false)
    val planA = approx.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(planA).size == 1)
    assert(!planA.contains("Expand"),
      s"approx profile must be plain partial aggregation:\n$planA")
    // HLL at default rsd is exact-adjacent at this cardinality scale
    val nd = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val ex = exact.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    Seq("l_orderkey", "l_suppkey").foreach { c =>
      assert(math.abs(nd(c) - ex(c)).toDouble / ex(c) < 0.1,
        s"approx NDV for $c off: ${nd(c)} vs ${ex(c)}")
    }
  }

  test("unknown columns fail loudly") {
    val df = Seq((1L, "x")).toDF("a", "b")
    val e = intercept[IllegalArgumentException](Profile.profile(df, Seq("a", "zz")))
    assert(e.getMessage.contains("zz"))
  }
}
