package graft

import graft.operators.BigStar
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame

/** Big-star connected components (Kiveris et al., SoCC 2014) against
  * three independent references: an in-test union-find on seeded random
  * graphs, the repo's propagation-based `clustersOf` on the same pair
  * frames, and the `d_dup_clusters` gate on real sf0.001 LSH pairs.
  * Plus the property that justifies the operator's existence: round
  * count grows ~log(diameter), not linearly, on a long chain.
  */
class BigStarSpec extends SparkSpec {

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("da", "db")
  }

  /** Reference labels via union-find with min-root union. */
  private def expectedClusters(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    pairs.filter(p => p._1 != p._2).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = pairs.filter(p => p._1 != p._2).flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs match union-find labels") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val pairs = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter(p => p._1 != p._2)
      val got = labelsOf(BigStar.clusters(pairsDf(pairs)))
      assert(got == expectedClusters(pairs), s"trial $trial diverged")
    }
  }

  test("chain graph collapses to node 0 in O(log n) rounds") {
    val n = 512 // diameter 511 — propagation would need ~511 rounds
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val rounds = BigStar.roundsToConverge(pairsDf(chain))
    assert(rounds <= 16, s"expected O(log n) rounds for a $n-chain, took $rounds")
    val got = labelsOf(BigStar.clusters(pairsDf(chain)))
    assert(got.size == n && got.values.forall(_ == 0L),
      "chain must collapse to a single component rooted at 0")
  }

  test("intermediate checkpoint blocks are freed on exit") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val chain = (0L until 255L).map(i => (i, i + 1))
    BigStar.clusters(pairsDf(chain)).collect()
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 1,
      s"only the final round's checkpoint may remain, found ${added.size}")
  }

  test("self-loops are ignored; isolated loops produce no labels") {
    val got = labelsOf(BigStar.clusters(pairsDf(Seq((7L, 7L), (1L, 2L)))))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("agrees with clustersOf's driver union-find on the same pair frame") {
    // (clustersOf's distributed branch IS BigStar since round 14, so
    // comparing against driverMax=0 would test BigStar against itself;
    // the independent references are the union-find here, the in-test
    // union-find above, the CcFuzz sweep, and the DuckDB oracle.)
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    val df = pairsDf(pairs)
    val viaStar = labelsOf(BigStar.clusters(df))
    val viaUf = labelsOf(DedupQueries.clustersOf(df))
    graft.operators.SeqIds.releaseAll()
    assert(viaStar == viaUf, "big-star vs driver union-find")
  }

  test("d_cc_bigstar gate equals d_dup_clusters gate on sf0.001 LSH pairs") {
    val a = DedupQueries.defs("d_cc_bigstar")(spark, sf()).collect().toSeq
    val b = DedupQueries.defs("d_dup_clusters")(spark, sf()).collect().toSeq
    graft.operators.SeqIds.releaseAll()
    assert(a.nonEmpty, "LSH pairs at sf0.001 must produce components")
    assert(a == b, "the two CC implementations must label identically")
  }
}
