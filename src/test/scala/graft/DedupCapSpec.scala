package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame

/** The stop-shingle / LSH-bucket cap (DedupQueries.MaxBucket) on a
  * deliberately skewed corpus: a bucket hotter than the cap must produce
  * ZERO pairs (bounded fan-out — the 100 TB OOM-key guard), while the
  * same duplicate group under the cap must produce exactly its C(n,2)
  * pairs (the cap does not break ordinary dedup).
  */
class DedupCapSpec extends SparkSpec {

  /** nDup identical docs (ids 0..nDup-1) + 50 unique-token docs. */
  private def corpus(nDup: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("dedup-cap").toString
    val dup = (0 until nDup).map(i => (i.toLong, "alpha beta gamma delta epsilon"))
    val uniq = (0 until 50).map(i => ((1000 + i).toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e"))
    import spark.implicits._
    (dup ++ uniq).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairs(q: String, dir: String): Set[(Long, Long)] =
    DedupQueries.defs(q)(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def expectedDupPairs(n: Int): Set[(Long, Long)] =
    (for (a <- 0 until n; b <- a + 1 until n) yield (a.toLong, b.toLong)).toSet

  private val over = DedupQueries.MaxBucket + 8   // hot bucket, above cap
  private val under = 10                          // ordinary dup group

  for (q <- Seq("d_ngram_jaccard", "d_minhash_lsh", "d_simhash")) {
    test(s"$q: a bucket hotter than MaxBucket yields no pairs") {
      val p = pairs(q, corpus(over))
      val fromHot = p.filter { case (a, b) => a < over && b < over }
      assert(fromHot.isEmpty,
        s"capped bucket still produced ${fromHot.size} pairs")
    }

    test(s"$q: a duplicate group under the cap pairs fully") {
      val p = pairs(q, corpus(under))
      assert(expectedDupPairs(under).subsetOf(p),
        s"missing dup pairs: got ${p.size}")
    }
  }

  test("d_dup_clusters collapses each dup group to its lowest doc_id") {
    val p = DedupQueries.defs("d_dup_clusters")(spark, corpus(under))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the `under`-sized identical group forms one component rooted at 0
    val grp = p.filter(_._1 < under)
    assert(grp.length == under && grp.forall(_._2 == 0L),
      s"expected all $under dup docs clustered at 0, got ${grp.toSeq}")
    // unique docs never appear (no pairs → no cluster membership)
    assert(p.forall(_._1 < under))
  }

  test("distributed propagation path equals the driver union-find path") {
    import spark.implicits._
    // a chain 1-2, 2-3, 3-4 plus a separate pair 10-11: diameter > 1
    // forces multiple propagation rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("da", "db")
    val driver = DedupQueries.clustersOf(pairs, driverMax = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = DedupQueries.clustersOf(pairs, driverMax = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L))
    assert(driver == expected, s"driver path: $driver")
    assert(dist == expected, s"distributed path: $dist")
  }

  test("pair fan-out is bounded by C(MaxBucket, 2) per bucket") {
    // with every doc identical, the uncapped candidate count would be
    // C(over, 2) = 780+; the cap admits none of them
    val p = pairs("d_minhash_lsh", corpus(over))
    assert(p.size <= DedupQueries.MaxBucket * (DedupQueries.MaxBucket - 1) / 2)
  }

  test("d_embed_neardup derives its cell count from the corpus size") {
    // The scale contract: k = max(1, min(ceil(n/256), ceil(√n))) —
    // cell size stays O(EmbedCellTarget) as the corpus grows (no fixed
    // k going quadratic within cells) while the √n bound keeps the
    // assignment stage n·k and the centroid broadcast sub-quadratic /
    // bounded. Checked structurally on the real sf0.001 corpus
    // (n=500 → k=2: at most k distinct dense cells materialize).
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val n = emb.count()
    val expectedK = DedupQueries.embedCellCount(n)
    assert(expectedK == math.max(1L, math.min((n + 255) / 256,
      math.ceil(math.sqrt(n.toDouble)).toLong)))
    val out = DedupQueries.defs("d_embed_neardup")(spark, sf())
    val cells = out.select("cell").distinct().collect().map(_.getInt(0))
    assert(cells.nonEmpty && cells.length <= expectedK,
      s"expected <= $expectedK cells for n=$n, saw ${cells.length}")
    assert(cells.forall(c => c >= 0 && c < expectedK),
      s"cell ids must be dense below k=$expectedK: ${cells.toSeq.sorted}")
    // the scaling law: n/256 governs small corpora, √n the large ones,
    // so k never exceeds either bound
    for (m <- Seq(100L, 100000L, 1000000000L)) {
      val k = DedupQueries.embedCellCount(m).toLong
      assert(k <= math.max((m + 255) / 256, 1L))
      assert(k <= math.max(math.ceil(math.sqrt(m.toDouble)).toLong, 1L))
    }
  }
}
