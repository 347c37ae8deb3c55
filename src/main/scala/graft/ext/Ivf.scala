package graft.ext

import graft.operators.SeqIds
import graft.plans.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** IVF (inverted-file) approximate nearest-neighbor search — the real
  * quantizer behind the scale path that `ann_ivf_bucketed` demonstrates
  * with the `label` stand-in cell.
  *
  * Coarse cells come from k deterministic seed centroids (the k lowest
  * vec_ids), optionally refined with Lloyd iterations. Every stage is
  * scale-safe: centroids are driver/broadcast-sized (k ≪ corpus),
  * assignment is a zero-shuffle per-row argmax, and the search joins each
  * query only against its nProbe cells.
  */
object Ivf {

  /** k seed centroids: (cell, centroid vector) — k rows, dim-sized id path. */
  def seedCentroids(embeddings: DataFrame, k: Int): DataFrame =
    SeqIds.withSeqIdDim(embeddings.orderBy("vec_id").limit(k), Seq(col("vec_id")), "cell")
      .withColumn("cell", col("cell").cast("int"))
      .select(col("cell"), col("embedding").as("centroid"))

  /** Bytes of centroid floats above which [[assign]] ships the matrix
    * as a broadcast variable instead of a foldable Literal. A Literal
    * is re-serialized into every task binary at every job submission;
    * a broadcast ships once per executor. 128 KB keeps small quantizers
    * on the simpler literal plan (trivially cacheable, oracle-visible)
    * while k·dim beyond a few thousand cells rides the broadcast.
    */
  val CentroidLiteralMaxBytes: Long = 128L * 1024

  /** Assign each vector to its nearest centroid by cosine (ties by
    * lowest cell id). Adds a `cell` column.
    *
    * Centroids are broadcast-sized by construction, so they are pulled
    * to the driver once and packed into ONE matrix consumed by the
    * native `graft_nearest_cell` argmax expression — no crossJoin, no
    * window, no exchange anywhere in the plan, and the plan/codegen
    * size is O(1) in k (the former one-literal-column-per-centroid form
    * compiled O(k) expression trees and cliffed at a few hundred
    * cells). Below [[CentroidLiteralMaxBytes]] the matrix travels as a
    * foldable Literal; above it, as a Spark broadcast variable
    * (NearestCellBcastF) so the per-job task binary stays O(1) in k
    * too. The score arithmetic (dot/(norm·norm), double accumulation,
    * NaN-greatest, tie to lowest cell) is bit-identical across both
    * tiers and to the former greatest()-over-structs form, so the
    * DuckDB oracle replication is unchanged.
    */
  def assign(spark: SparkSession, embeddings: DataFrame,
             centroids: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    val cents: Seq[(Int, Seq[Float])] = centroids.select("cell", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toIndexedSeq)).toSeq.sortBy(_._1)
    require(cents.nonEmpty, "assign requires at least one centroid")
    val floatBytes = cents.iterator.map(_._2.length.toLong * 4).sum
    if (floatBytes <= CentroidLiteralMaxBytes)
      embeddings.withColumn("cell",
        call_function("graft_nearest_cell", col("embedding"),
          typedlit(cents.map(_._2)), typedlit(cents.map(_._1))))
    else {
      val model = new graft.plans.NearestCellModel(
        cents.map(_._2.toArray).toArray, cents.map(_._1).toArray)
      val bc = spark.sparkContext.broadcast(model)
      embeddings.withColumn("cell",
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.plans.NearestCellBcastF(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("embedding")), bc)))
    }
  }

  /** Lloyd refinement: recompute each cell's centroid as the element-wise
    * mean of its members, reassign, repeat. Each iteration is one
    * zero-shuffle assignment pass plus one aggregation
    * (posexplode → partial-agg mean per (cell, dim) → rebuild), both
    * linear in the corpus; centroids stay driver-sized throughout.
    * Cells that lose all members drop out (standard Lloyd behavior).
    */
  def lloyd(spark: SparkSession, embeddings: DataFrame, init: DataFrame,
            iters: Int): DataFrame = {
    var cents = init
    for (_ <- 0 until iters) {
      cents = assign(spark, embeddings, cents)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg(col("v")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .getField("m").cast("array<float>").as("centroid"))
    }
    cents
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
