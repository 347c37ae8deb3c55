package graft.ext

import org.apache.spark.ml.feature.{HashingTF, IDF, MinHashLSH, RegexTokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** MLlib-backed text featurization (BASELINE "DataFrame ops + MLlib"):
  * tokenize → hashed term frequencies → IDF weights, and an MLlib
  * MinHashLSH near-dup join as the library counterpart of the
  * hand-rolled deterministic MinHash in DedupQueries (which remains the
  * oracle-checkable path — MLlib's hash coefficients are seed-dependent
  * model state, reproducible only with the model artifact).
  *
  * Scale notes: HashingTF is stateless (pure map); IDF is one
  * aggregation over the corpus; approxSimilarityJoin is bucketed —
  * candidate pairs only from matching hash buckets, never all-pairs.
  */
object TextPipeline {

  /** doc_id, tf (sparse vector of `numFeatures`), tfidf. */
  def tfidf(docs: DataFrame, numFeatures: Int = 1 << 16): DataFrame = {
    val toks = new RegexTokenizer().setInputCol("text").setOutputCol("tokens")
      .setPattern("\\s+").transform(docs)
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(numFeatures).transform(toks)
    val idfModel = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf)
    idfModel.transform(tf).select("doc_id", "tf", "tfidf")
  }

  /** Near-dup candidate pairs via MLlib MinHashLSH over hashed token
    * sets, Jaccard distance below `maxDistance`.
    */
  def minhashNearDups(docs: DataFrame, maxDistance: Double = 0.2,
                      numHashTables: Int = 8, seed: Long = 42L): DataFrame = {
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf").setBinary(true)
      .setNumFeatures(1 << 16)
      .transform(new RegexTokenizer().setInputCol("text").setOutputCol("tokens")
        .setPattern("\\s+").transform(
          // a null/empty/whitespace-only document tokenizes to nothing
          // and MinHashLSH REJECTS all-zero vectors ('must have at
          // least 1 non zero entry') — one degenerate crawl row would
          // kill the whole job. Zero-token docs can't be near-dups of
          // anything under Jaccard anyway: drop them up front.
          docs.filter(col("text").isNotNull && col("text").rlike("\\S"))))
    val model = new MinHashLSH().setInputCol("tf").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed).fit(tf)
    model.approxSimilarityJoin(tf, tf, maxDistance, "jaccard_dist")
      .select(col("datasetA.doc_id").as("da"), col("datasetB.doc_id").as("db"),
        col("jaccard_dist"))
      .filter(col("da") < col("db"))
  }
}
