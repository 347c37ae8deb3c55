package graft

import graft.ext.Ivf
import graft.lake.{BucketedUpsert, Snapshot}
import org.apache.spark.sql.functions._

/** Quantizer drift + atomic retrain: the retrained generation equals a
  * from-scratch rebuild, the pointer swap is atomic (a failed retrain
  * leaves the old generation fully live), both directions of the
  * append/retrain race fail fast, and the drift detector runs at
  * O(churn) through the incremental cell-stats MV.
  */
class IvfRetrainSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ivfrt-spec").toString + "/idx"

  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")

  private def q = emb.filter(col("vec_id") % 25 === 0).limit(8)
    .select(col("vec_id").as("qid"), col("embedding").as("qemb"))

  private def results(root: String) =
    Ivf.searchIndex(spark, root, q, topK = 3, nProbe = 2)
      .select("qid", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq

  test("retrain is deterministic: two retrains over the same corpus are search-identical") {
    val root = tmp()
    Ivf.buildIndex(spark, root, emb, k = 4, nBuckets = 8, tag = 1)
    Ivf.retrainIndex(spark, root, k = 4, tag = 2)
    val first = results(root)
    Ivf.retrainIndex(spark, root, k = 4, tag = 3)
    assert(results(root) == first,
      "the sampled seed rule is deterministic — retrains must reproduce")
  }

  test("retrained generation equals a from-scratch rebuild over the current corpus") {
    val rootA = tmp()
    // lifecycle on A: build a slice, append the rest, retrain bigger
    Ivf.buildIndex(spark, rootA, emb.filter(col("vec_id") % 3 =!= 0),
      k = 4, nBuckets = 8, tag = 1)
    Ivf.appendToIndex(spark, rootA, emb.filter(col("vec_id") % 3 === 0), tag = 2)
    Ivf.retrainIndex(spark, rootA, k = 6, tag = 3)
    // the reference: an in-memory rebuild with the SAME sampled rule
    // over the same final corpus
    val cents = Ivf.sampleCentroids(emb, 6)
    val inMem = Ivf.search(spark, Ivf.assign(spark, emb, cents), q, cents,
        topK = 3, nProbe = 2)
      .select("qid", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(results(rootA) == inMem,
      "retrain must be indistinguishable from a full rebuild")
  }

  test("a concurrent append FAILS the retrain and the old generation stays fully live") {
    val root = tmp()
    Ivf.buildIndex(spark, root, emb.filter(col("vec_id") % 2 === 0),
      k = 4, nBuckets = 8, tag = 1)
    val before = results(root)
    val late = emb.filter(col("vec_id") % 2 =!= 0)
    val ex = intercept[IllegalStateException] {
      Ivf.retrainIndexHooked(spark, root, k = 6, tag = 2,
        () => Ivf.appendToIndex(spark, root, late, tag = 5))
    }
    assert(ex.getMessage.contains("concurrent append"))
    // ATOMICITY: the pointer never swapped — the live index is the old
    // generation WITH the concurrent append applied, nothing lost
    val after = results(root)
    assert(after != before, "the concurrent append must be visible")
    assert(BucketedUpsert.read(spark, s"$root/corpus").count() == emb.count(),
      "the appended batch must survive the failed retrain")
    // re-running the retrain from the new state succeeds
    Ivf.retrainIndex(spark, root, k = 6, tag = 7)
    assert(results(root).nonEmpty)
  }

  test("an append overlapped by a retrain fails fast instead of landing in a retired generation") {
    val root = tmp()
    Ivf.buildIndex(spark, root, emb.filter(col("vec_id") % 2 === 0),
      k = 4, nBuckets = 8, tag = 1)
    val late = emb.filter(col("vec_id") % 2 =!= 0)
    val ex = intercept[IllegalStateException] {
      Ivf.appendToIndexHooked(spark, root, late, tag = 2,
        () => Ivf.retrainIndex(spark, root, k = 4, tag = 3))
    }
    assert(ex.getMessage.contains("concurrent retrain"),
      s"append into a retired generation must fail: ${ex.getMessage}")
  }

  test("cell stats maintain incrementally and drift triggers the retrain that repairs it") {
    import spark.implicits._
    val root = tmp()
    // a balanced synthetic corpus: 4 well-separated directions
    def vec(axis: Int, i: Long): Array[Float] = {
      val a = Array.fill(8)(0.01f * ((i % 7).toInt + 1))
      a(axis) = 10f + (i % 3); a
    }
    val base = (0L until 400L).map(i => (i, vec((i % 4).toInt, i), 0))
      .toDF("vec_id", "embedding", "label")
    Ivf.buildIndex(spark, root, base, k = 4, nBuckets = 8, tag = 1)
    val n1 = Ivf.refreshCellStats(spark, root)
    assert(n1 > 0)
    val d1 = Ivf.drift(spark, root)
    assert(d1.nVectors == 400L && d1.ratio < 3.0,
      s"the balanced corpus must not report drift: $d1")
    // drift: a hot batch concentrated in ONE direction
    val hot = (1000L until 2200L).map(i => (i, vec(5, i), 0))
      .toDF("vec_id", "embedding", "label")
    Ivf.appendToIndex(spark, root, hot, tag = 2)
    val n2 = Ivf.refreshCellStats(spark, root)
    assert(n2 > 0 && n2 <= 8, s"stats refresh must be bucket-granular: $n2")
    val d2 = Ivf.drift(spark, root)
    assert(d2.nVectors == 1600L)
    assert(d2.ratio > d1.ratio && Ivf.needsRetrain(spark, root, threshold = 2.0),
      s"the hot direction must register as drift: $d2")
    // the repair: retrain with more cells over the drifted corpus
    Ivf.retrainIndex(spark, root, k = 8, tag = 3)
    Ivf.refreshCellStats(spark, root)
    val d3 = Ivf.drift(spark, root)
    assert(d3.k == 8 && d3.nVectors == 1600L)
    assert(d3.ratio < d2.ratio,
      s"retrain must rebalance the cells: before=$d2 after=$d3")
  }

  test("delete and search route through the live generation after a retrain") {
    val root = tmp()
    Ivf.buildIndex(spark, root, emb, k = 4, nBuckets = 8, tag = 1)
    Ivf.retrainIndex(spark, root, k = 4, tag = 2)
    val victim = q.select(col("qid").as("vec_id")).limit(1)
    val removed = Ivf.deleteFromIndex(spark, root, victim, tag = 3)
    assert(removed == 1L, "delete must hit the LIVE generation's corpus")
    val vid = victim.head().getLong(0)
    assert(results(root).forall(_._3 != vid),
      "a deleted vector may not surface from the retired generation")
  }
}
