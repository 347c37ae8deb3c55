package graft

import graft.operators.SeqIds
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Incremental LSH pair probe (d_incr_pairs): on a corpus engineered so
  * a band bucket exceeds MaxBucket only when standing and batch docs
  * are COMBINED, the probe must apply the full recompute's admission
  * rule (drop the bucket) even though each side alone is under the cap
  * — the semantics the sf0.01 gate cannot reach (its max bucket is 25).
  * Plus the general property: the probe equals the one-shot LSH's
  * pairs restricted to >=1 batch endpoint.
  */
class IncrPairsSpec extends SparkSpec {

  /** Write a synthetic documents table and return its directory.
    * Batch membership follows the gate convention: doc_id % 7 == 3. */
  private def corpusDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incr-pairs").toString
    docs.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairsOf(name: String, dir: String): Set[(Long, Long)] =
    try DedupQueries.defs(name)(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    finally SeqIds.releaseAll()

  // 7k+3 ids are batch; others standing
  private def batchIds(n: Int): Seq[Long] = (0 until n).map(i => i * 7L + 3L)
  private def standingIds(n: Int): Seq[Long] = (0 until n).map(i => i * 7L + 1L)

  test("a bucket over MaxBucket only when combined emits no pairs") {
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val cool = "completely different words that collide with nothing else here"
    // 20 standing + 20 batch identical docs: each side under the cap
    // (32), combined 40 over it -> the full recompute drops the bucket,
    // and so must the incremental probe
    val hotDocs = (standingIds(20) ++ batchIds(20)).map(_ -> hot)
    // control: 2 standing + 2 batch identical docs -> admitted; pairs
    // with >=1 batch endpoint = all 6 minus the 1 standing-standing
    val coolStanding = Seq(10001L, 10008L) // both %7 = 5 -> standing
    val coolBatch = Seq(10006L, 10013L)    // both %7 = 3 -> batch
    val coolDocs = (coolStanding ++ coolBatch).map(_ -> cool)
    val dir = corpusDir(hotDocs ++ coolDocs)
    val got = pairsOf("d_incr_pairs", dir)
    val hotIds = hotDocs.map(_._1).toSet
    assert(!got.exists { case (a, b) => hotIds(a) || hotIds(b) },
      s"capped-bucket doc leaked into pairs: $got")
    val coolAll = (coolStanding ++ coolBatch).sorted
    val want = (for {
      a <- coolAll; b <- coolAll if a < b
      if coolBatch.contains(a) || coolBatch.contains(b)
    } yield (a, b)).toSet
    assert(got == want, s"expected exactly the admitted batch-touching pairs; got $got, want $want")
  }

  test("probe equals one-shot LSH restricted to batch-touching pairs") {
    // mixed corpus: some shared texts across the epoch boundary, some
    // standing-only dup groups, some batch-only, some singletons
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten eleven"
    val t3 = "red orange yellow green blue indigo violet colors of light"
    val docs = Seq(
      1L -> t1, 8L -> t1, 3L -> t1,          // standing+batch dup group
      15L -> t2, 22L -> t2,                  // standing-only dup group
      10L -> t3, 17L -> t3, 24L -> t3,       // batch-only dup group
      29L -> "a lonely unique document with no duplicate partner at all")
    val dir = corpusDir(docs)
    val all = pairsOf("d_minhash_lsh", dir)
    val incr = pairsOf("d_incr_pairs", dir)
    val isBatch = (x: Long) => x % 7 == 3
    assert(incr == all.filter { case (a, b) => isBatch(a) || isBatch(b) },
      s"probe must equal the one-shot pairs with >=1 batch endpoint\n" +
        s"all=$all\nincr=$incr")
    assert(incr.nonEmpty, "fixture must actually exercise the probe")
  }
}
