package graft

import graft.functions.TextSketches
import graft.queries.{DedupQueries, SimQueries}

/** Scale-shape guards for the LLM-pipeline ops: the dedup/ANN plans must
  * never contain an unconstrained cartesian product (all-pairs is the
  * 100 TB killer); the brute-force ANN is allowed its *broadcast*
  * nested loop (tiny query side) but nothing else is. Plus SimHash
  * kernel sanity.
  */
class ExtOpsSpec extends SparkSpec {

  private def plan(name: String): String = {
    val defs = DedupQueries.defs ++ SimQueries.defs
    defs(name)(spark, sf()).queryExecution.executedPlan.toString
  }

  test("dedup plans contain no cartesian product") {
    for (q <- Seq("d_ngram_jaccard", "d_minhash_lsh", "d_simhash", "d_embed_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product:\n${p.take(800)}")
    }
  }

  test("brute-force ANN uses a broadcast nested loop, not a shuffled cartesian") {
    val p = plan("ann_topk_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("IVF ANN is an equi-join on the cell, no nested loop at all") {
    val p = plan("ann_ivf_bucketed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("approx_count_distinct stays within the 5% gate tolerance") {
    val rows = graft.queries.WindowQueries.defs("a9_approx_distinct")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) > 0)
      assert(r.getBoolean(2),
        s"${r.getString(0)}: HLL estimate strayed beyond 5% of ${r.getLong(1)}")
    }
  }

  test("KMV estimate stays within 30% of exact distinct per group") {
    // k=64 gives ~1/sqrt(62) ≈ 12.7% expected relative error; 30% is a
    // generous determinism-safe bound (the estimate is md5-derived, so
    // this can never flake — it either holds forever or the kernel
    // changed)
    import org.apache.spark.sql.functions._
    val kmv = graft.queries.WindowQueries.defs("a11_kmv_distinct")(spark, sf())
      .select("l_returnflag", "kmv_estimate")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(kmv.keySet == exact.keySet)
    for ((g, est) <- kmv) {
      assert(math.abs(est - exact(g)) / exact(g) < 0.30,
        s"$g: kmv $est vs exact ${exact(g)}")
    }
  }

  test("simhash: identical token lists → distance 0; disjoint → large") {
    val a = TextSketches.simhash(Seq("spark", "scan", "shuffle", "agg"))
    val b = TextSketches.simhash(Seq("spark", "scan", "shuffle", "agg"))
    assert(java.lang.Long.bitCount(a ^ b) == 0)
    val c = TextSketches.simhash(Seq("completely", "different", "words", "here"))
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }

  test("simhash: near-identical docs land within a small hamming ball") {
    val base = (1 to 50).map(i => s"tok$i")
    val a = TextSketches.simhash(base)
    val b = TextSketches.simhash(base.updated(10, "changed"))
    assert(java.lang.Long.bitCount(a ^ b) <= 12,
      s"one-token change moved ${java.lang.Long.bitCount(a ^ b)} bits")
  }
}
