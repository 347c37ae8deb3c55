package graft

import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** IVF skew stress — the embedding analogue of DedupCapSpec: the √n
  * cell law bounds the AVERAGE cell, but a mass-duplicated embedding
  * can pull an arbitrary fraction of the corpus into one cell, where
  * the within-cell self-join degenerates to C(n,2). The EmbedMaxCell
  * guard must drop pair generation for such cells while leaving
  * ordinary cells fully paired.
  */
class IvfSkewSpec extends SparkSpec {
  import spark.implicits._

  /** 5 near-orthogonal seed vectors (ids 0-4 become the IVF seed
    * centroids), a 10-member duplicate mini-cluster aligned with seed
    * 2 (ids 10-19), and `hot` copies of one vector aligned with seed 0
    * (ids 100+). n is sized so k = 5 cells.
    */
  private def corpus(hot: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("ivf-skew").toString
    val seeds = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f)), (3L, Seq(0f, 0f, 0f, 1f)),
      (4L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
    val mini = (10 until 20).map(i => (i.toLong, Seq(0.05f, 0f, 0.95f, 0f)))
    val hotRows = (0 until hot).map(i => ((100 + i).toLong, Seq(0.9f, 0.1f, 0f, 0f)))
    (seeds ++ mini ++ hotRows).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def pairs(dir: String): Set[(Long, Long)] =
    DedupQueries.defs("d_embed_neardup")(spark, dir)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val miniPairs =
    (for (a <- 10 until 20; b <- a + 1 until 20) yield (a.toLong, b.toLong)).toSet

  test("a cell hotter than EmbedMaxCell yields no pairs; others pair fully") {
    // 1100 identical-direction vectors + 15 others → k = 5 cells; the
    // hot cell holds ~1101 members (> EmbedMaxCell = 1024) and must be
    // dropped — without the cap it alone would emit ~605k pairs
    val p = pairs(corpus(1100))
    val fromHot = p.filter { case (a, b) => a >= 100 || b >= 100 }
    assert(fromHot.isEmpty,
      s"overfull cell still produced ${fromHot.size} pairs")
    assert(miniPairs.subsetOf(p),
      s"ordinary cell lost pairs: ${(miniPairs -- p).take(5)}")
  }

  test("a duplicate cluster under the cap pairs fully") {
    // 200 hot rows keep every cell under EmbedMaxCell → the hot
    // cluster itself must pair completely (C(200,2) pairs)
    val p = pairs(corpus(200))
    val hotPairs = p.filter { case (a, b) => a >= 100 && b >= 100 }
    assert(hotPairs.size == 200 * 199 / 2,
      s"expected full pairing under the cap, got ${hotPairs.size}")
    assert(miniPairs.subsetOf(p))
  }
}
