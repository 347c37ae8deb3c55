package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** LLM-pipeline similarity search over `embeddings` (builder brief:
  * brute-force cosine top-k baseline + a bucketed variant as the scale
  * path).
  *
  * Scale design: the query set is dimension-sized and broadcast; the
  * brute-force pass is a broadcast nested-loop (each executor scans its
  * slice of the corpus once per query batch — the correct baseline
  * shape, NOT a shuffled cartesian). The IVF variant restricts each
  * query to its coarse cell (`label` stands in for the k-means
  * assignment), an equi-join — the 100 TB path. Cosine is computed in
  * double after casting the float vectors, so the DuckDB oracle agrees
  * bitwise; only ids/ranks are emitted, never raw floats.
  */
object SimQueries extends QueryPack {

  // Norms precomputed per vector before the pair stage; the per-pair
  // cost is one native codegen'd dot product (plans.DotProductF — stays
  // inside whole-stage codegen, unlike a UDF) with the same double
  // accumulation order as DuckDB's list_dot_product, so the oracle
  // still matches bitwise.
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", expr("graft_norm(embedding)"))

  private def cosCol =
    expr("graft_dot(qemb, embedding)") / (col("qnorm") * col("norm"))

  private val cosSql =
    """list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
       / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
          * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))))"""

  val defs: Map[String, QueryFn] = Map(
    // Brute-force cosine top-5 per query vector (every 50th vector is a
    // query; scales with the table).
    "ann_topk_brute" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      val e = withNorm(t(s, d, "embeddings"))
      val q = withNorm(t(s, d, "embeddings").filter(col("vec_id") % 50 === 0))
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("norm").as("qnorm"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // IVF-style bucketed ANN: search only the query's coarse cell.
    "ann_ivf_bucketed" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      val e = withNorm(t(s, d, "embeddings"))
      val q = withNorm(t(s, d, "embeddings").filter(col("vec_id") % 50 === 0))
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qemb"), col("norm").as("qnorm"))
      e.join(broadcast(q), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    })
  )

  val oracle: Map[String, String] = Map(
    "ann_topk_brute" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 50 = 0),
          scored AS (
            SELECT q.qid, e.vec_id, $cosSql AS cos
            FROM embeddings e, q WHERE e.vec_id <> q.qid),
          ranked AS (
            SELECT qid, vec_id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank
            FROM scored)
          SELECT qid, rank, vec_id FROM ranked WHERE rank <= 5 ORDER BY qid, rank""",
    "ann_ivf_bucketed" ->
      s"""WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding FROM embeddings WHERE vec_id % 50 = 0),
          scored AS (
            SELECT q.qid, e.vec_id, $cosSql AS cos
            FROM embeddings e JOIN q ON e.label = q.qlabel AND e.vec_id <> q.qid),
          ranked AS (
            SELECT qid, vec_id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank
            FROM scored)
          SELECT qid, rank, vec_id FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""
  )
}
