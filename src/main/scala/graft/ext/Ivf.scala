package graft.ext

import graft.plans.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF (inverted-file) approximate nearest-neighbor search — the real
  * quantizer behind the scale path that `ann_ivf_bucketed` demonstrates
  * with the `label` stand-in cell.
  *
  * Coarse cells come from k deterministic seed centroids (the k lowest
  * vec_ids — an init-only quantizer; Lloyd iterations are a pluggable
  * refinement and don't change the query shape). Every stage is scale-
  * safe: centroids broadcast (k ≪ corpus), assignment is one pass, the
  * search joins each query only against its nProbe cells.
  */
object Ivf {

  /** k seed centroids: (cell, centroid vector). */
  def seedCentroids(embeddings: DataFrame, k: Int): DataFrame =
    embeddings.orderBy("vec_id").limit(k)
      .withColumn("cell", row_number().over(Window.orderBy("vec_id")) - 1)
      .select(col("cell"), col("embedding").as("centroid"))

  /** Assign each vector to its nearest centroid by cosine (ties by
    * cell id). Adds a `cell` column.
    */
  def assign(spark: SparkSession, embeddings: DataFrame,
             centroids: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    val scored = embeddings.crossJoin(broadcast(centroids))
      .withColumn("score",
        expr("graft_dot(embedding, centroid)")
          / (expr("graft_norm(embedding)") * expr("graft_norm(centroid)")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("score").desc, col("cell"))))
    scored.filter(col("rn") === 1)
      .drop("rn", "score", "centroid")
  }

  /** Top-k cosine neighbors per query, searching only each query's
    * nProbe nearest cells.
    */
  def search(spark: SparkSession, corpusWithCells: DataFrame, queries: DataFrame,
             centroids: DataFrame, topK: Int, nProbe: Int): DataFrame = {
    GraftFunctions.register(spark)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("score",
        expr("graft_dot(qemb, centroid)")
          / (expr("graft_norm(qemb)") * expr("graft_norm(centroid)")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("score").desc, col("cell"))))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qemb"), col("cell"))
    corpusWithCells.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        expr("graft_dot(qemb, embedding)")
          / (expr("graft_norm(qemb)") * expr("graft_norm(embedding)")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= topK)
      .select("qid", "rank", "vec_id", "cos")
  }
}
