package graft

import graft.ext.TextPipeline
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

/** MLlib featurization over the real documents table: TF-IDF vector
  * shapes and a seeded MinHashLSH near-dup join whose plan must be a
  * bucketed join (no cartesian product).
  */
class TextPipelineSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("tfidf produces sparse vectors sized to the corpus") {
    val out = TextPipeline.tfidf(docs, numFeatures = 1024)
    val row = out.orderBy("doc_id").head()
    val tf = row.getAs[Vector]("tf")
    val tfidf = row.getAs[Vector]("tfidf")
    assert(tf.size == 1024 && tfidf.size == 1024)
    assert(tf.numNonzeros > 0 && tfidf.numNonzeros == tf.numNonzeros)
    assert(out.count() == docs.count())
  }

  test("MinHashLSH near-dup join is bucketed and deterministic under a seed") {
    val a = TextPipeline.minhashNearDups(docs, maxDistance = 0.5)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    val pairsA = a.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairsB = TextPipeline.minhashNearDups(docs, maxDistance = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsA == pairsB) // same seed → same model → same candidates
    // self-similar docs exist in the synthetic corpus at this threshold
    assert(pairsA.nonEmpty)
  }

  test("a whitespace-only or null document does not kill the near-dup join") {
    import spark.implicits._
    // MinHashLSH rejects all-zero vectors; one degenerate crawl row
    // used to fail the whole job instead of being skipped
    val docs = Seq((1L, "spark dedup pipeline"), (2L, "spark dedup pipeline"),
      (3L, ""), (4L, "   "), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val pairs = TextPipeline.minhashNearDups(docs, maxDistance = 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      s"degenerate docs must be skipped, real dups kept: ${pairs.toSeq}")
  }
}
