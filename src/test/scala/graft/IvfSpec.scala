package graft

import graft.ext.Ivf
import org.apache.spark.sql.functions._

/** IVF ANN against the brute-force ground truth on real embeddings:
  * structure (cells partition the corpus), recall improves with nProbe,
  * and nProbe = k (search everything) reproduces brute force exactly.
  */
class IvfSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private val K = 8

  private def centroids = Ivf.seedCentroids(emb, K)
  private def corpus = Ivf.assign(spark, emb, centroids)
  private def queries = emb.filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qemb"))

  private def bruteTop(k: Int): Set[(Long, Long)] = {
    graft.plans.GraftFunctions.register(spark)
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("graft_dot(qemb, embedding)") /
        (expr("graft_norm(qemb)") * expr("graft_norm(embedding)")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def ivfTop(k: Int, nProbe: Int): Set[(Long, Long)] =
    Ivf.search(spark, corpus, queries, centroids, k, nProbe)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cells partition the corpus exhaustively") {
    val c = corpus
    assert(c.count() == emb.count())
    assert(c.select("cell").distinct().count() <= K)
    assert(c.filter(col("cell").isNull || col("cell") < 0 || col("cell") >= K).count() == 0)
  }

  test("Lloyd refinement keeps a valid quantizer and does not hurt recall") {
    val refined = Ivf.lloyd(spark, emb, centroids, iters = 2)
    val k2 = refined.count()
    assert(k2 > 0 && k2 <= K, s"Lloyd produced $k2 cells")
    val corpus2 = Ivf.assign(spark, emb, refined)
    assert(corpus2.count() == emb.count(), "assignment must cover the corpus")
    val truth = bruteTop(5)
    val seedRecall = ivfTop(5, 2).intersect(truth).size.toDouble / truth.size
    val lloydRecall = Ivf.search(spark, corpus2, queries, refined, 5, 2)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(truth).size.toDouble / truth.size
    assert(lloydRecall >= seedRecall - 0.05,
      s"Lloyd recall regressed: seed=$seedRecall lloyd=$lloydRecall")
  }

  test("lloyd over an empty corpus returns the seeds unchanged") {
    val seeds = graft.ext.Ivf.seedCentroids(emb, 4)
    val got = graft.ext.Ivf.lloyd(spark, emb.limit(0), seeds, iters = 3)
    val want = seeds.collect().map(r => r.getInt(0)).sorted
    assert(got.collect().map(r => r.getInt(0)).sorted.sameElements(want),
      "empty-corpus lloyd must return the seed cells, not crash")
  }

  test("assign stays O(1)-plan-size and correct at k=256") {
    // 256 synthetic centroids: far beyond the literal-inlining cliff of
    // the former one-column-per-centroid form. The plan must stay a
    // single flat projection (no crossJoin/window/exchange) whose size
    // does not grow with k, and the picked cell must equal a driver-side
    // brute-force argmax with the same tie rule (max cos, lowest cell).
    import spark.implicits._
    val dim = 8
    val k = 256
    val cents = (0 until k)
      .map(c => (c, (0 until dim).map(j => ((c * 31 + j * 7) % 97 - 48) / 16.0f)))
      .toDF("cell", "centroid")
    val vecs = (0 until 500)
      .map(v => (v.toLong, (0 until dim).map(j => ((v * 13 + j * 5) % 89 - 44) / 8.0f)))
      .toDF("vec_id", "embedding")
    val assigned = Ivf.assign(spark, vecs, cents)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window") && !plan.contains("Exchange"),
      s"assign plan must be a flat projection:\n$plan")
    assert(plan.length < 4000, s"plan size grew with k (${plan.length} chars)")
    val cmat = cents.collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def brute(v: Array[Float]): Int = {
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      var bi = 0; var best = Double.NegativeInfinity
      for (((_, c), i) <- cmat.zipWithIndex) {
        val dot = v.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val s = dot / (nv * math.sqrt(c.map(x => x.toDouble * x).sum))
        if (s > best) { best = s; bi = i }
      }
      cmat(bi)._1
    }
    assigned.collect().foreach { r =>
      val v = r.getSeq[Float](1).toArray
      assert(r.getInt(2) == brute(v), s"vec ${r.getLong(0)} assigned to wrong cell")
    }
  }

  test("k=4096 centroids ride a broadcast, not a plan literal") {
    // 4096 × dim-16 centroids = 256 KB of floats — above
    // Ivf.CentroidLiteralMaxBytes, so the matrix must travel as a
    // broadcast variable: the plan carries only the handle (flat size),
    // never a quarter-megabyte literal re-serialized into every task
    // binary. Correctness is pinned against a driver-side brute-force
    // argmax with the same tie rule, with codegen fallback disabled so
    // the generated kernel must actually compile.
    import spark.implicits._
    val dim = 16
    val k = 4096
    val cents = (0 until k)
      .map(c => (c, (0 until dim).map(j => ((c * 31 + j * 7) % 97 - 48) / 16.0f)))
      .toDF("cell", "centroid")
    val vecs = (0 until 200)
      .map(v => (v.toLong, (0 until dim).map(j => ((v * 13 + j * 5) % 89 - 44) / 8.0f)))
      .toDF("vec_id", "embedding")
      .repartition(4) // defeat local-relation constant folding
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val assigned = Ivf.assign(spark, vecs, cents)
      val plan = assigned.queryExecution.executedPlan.toString
      assert(plan.contains("graft_nearest_cell_bcast"),
        s"large k must take the broadcast tier:\n${plan.take(1500)}")
      assert(plan.length < 4000, s"plan size grew with k (${plan.length} chars)")
      assert(!plan.contains("Join") && !plan.contains("Window"),
        s"assign must stay a flat projection:\n${plan.take(1500)}")
      val cmat = cents.collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      def brute(v: Array[Float]): Int = {
        val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
        var bi = 0; var best = Double.NegativeInfinity
        for (((_, c), i) <- cmat.zipWithIndex) {
          val dot = v.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum
          val s = dot / (nv * math.sqrt(c.map(x => x.toDouble * x).sum))
          if (s > best) { best = s; bi = i }
        }
        cmat(bi)._1
      }
      assigned.collect().foreach { r =>
        val v = r.getSeq[Float](1).toArray
        assert(r.getInt(2) == brute(v), s"vec ${r.getLong(0)} assigned to wrong cell")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("graft_nearest_cell whole-stage codegen compiles (no interpreted fallback)") {
    // A parquet-backed scan (a LocalRelation input is constant-folded
    // before any codegen happens) with fallback disabled: if the
    // generated Java fails Janino, the action throws here instead of
    // silently degrading the whole stage to interpreted eval. Guards
    // the stripMargin-eaten `||` regression in NearestCellF.doGenCode —
    // gate results stayed green through that failure, only the
    // execution mode (and throughput) degraded.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val assigned = Ivf.assign(spark, emb, centroids)
      assert(assigned.select("cell").distinct().count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("residualCodes quantizes residuals deterministically (zero residual → zero codes)") {
    import spark.implicits._
    val cents = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("cell", "centroid")
    val vecs = Seq(
      (10L, Seq(1f, 0f)),     // equals its centroid → residual exactly 0
      (11L, Seq(0.8f, 0.1f)), // cell 0; residual (≈-0.2, 0.1) → rmx at idx 0
      (12L, Seq(0f, 2f))      // cell 1; residual (0, 1)
    ).toDF("vec_id", "embedding")
    val coded = Ivf.residualCodes(Ivf.assign(spark, vecs, cents), cents)
      .collect().map(r => r.getLong(r.fieldIndex("vec_id")) ->
        (r.getDouble(r.fieldIndex("rscale")), r.getSeq[Int](r.fieldIndex("rq8")).toList))
      .toMap
    assert(coded(10L) == (0.0, List(0, 0)), s"zero residual: ${coded(10L)}")
    // |res_0| = rmx → code -127 exactly; res_1/(rmx/127) = 63.5000…→ 64
    assert(coded(11L)._2 == List(-127, 64), s"codes: ${coded(11L)}")
    assert(coded(12L)._2 == List(0, 127), s"codes: ${coded(12L)}")
    assert(coded.values.forall(_._2.forall(c => c >= -127 && c <= 127)))
  }

  test("searchPq with an exhaustive shortlist reproduces exact IVF search") {
    // With every probed candidate surviving to the exact re-rank stage,
    // the int8 approximation only orders the shortlist, never prunes —
    // the final top-k (including rank) must be IDENTICAL to Ivf.search
    // over the same probes.
    val coded = Ivf.residualCodes(corpus, centroids)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = rows(Ivf.search(spark, corpus, queries, centroids, 3, 2))
    val pq = rows(Ivf.searchPq(spark, coded, emb, queries, centroids, 3, 2, Int.MaxValue))
    assert(pq == exact, s"diff: ${(pq -- exact).take(5)} / ${(exact -- pq).take(5)}")
  }

  test("int8 residual shortlist keeps high recall vs exact IVF top-3") {
    val coded = Ivf.residualCodes(corpus, centroids)
    val exact = Ivf.search(spark, corpus, queries, centroids, 3, 2)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Ivf.searchPq(spark, coded, emb, queries, centroids, 3, 2, 8)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.85,
      s"int8 shortlist recall $recall — residual quantization is losing neighbors")
  }

  test("recall is monotone in nProbe and hits 100% at nProbe = k") {
    val truth = bruteTop(5)
    val r1 = ivfTop(5, 1).intersect(truth).size.toDouble / truth.size
    val r4 = ivfTop(5, 4).intersect(truth).size.toDouble / truth.size
    val rAll = ivfTop(5, K).intersect(truth).size.toDouble / truth.size
    assert(r1 <= r4 + 1e-9 && r4 <= rAll + 1e-9, s"recall not monotone: $r1 $r4 $rAll")
    assert(rAll == 1.0, s"full probe must equal brute force, got $rAll")
    assert(r1 > 0.0, "nProbe=1 found nothing — cells are broken")
  }
}
