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

  /** Fixed-size query set: every 50th vector, capped at MaxQueries by
    * vec_id order (TakeOrderedAndProject — no global sort materializes).
    * The cap keeps the broadcast side CONSTANT at any corpus scale; an
    * uncapped modulo filter grows linearly with the table and would OOM
    * the broadcast at 100×.
    */
  val MaxQueries = 64

  private def querySet(df: DataFrame): DataFrame =
    df.filter(col("vec_id") % 50 === 0).orderBy("vec_id").limit(MaxQueries)

  private val querySetSql =
    s"SELECT * FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT $MaxQueries"

  val defs: Map[String, QueryFn] = Map(
    // Brute-force cosine top-5 per query vector (bounded query set).
    // This is the deliberate EXACT BASELINE the ann_ivf_* gates are
    // judged against — the crossJoin(broadcast(q)) is bounded by the
    // capped query set, but it scans corpus×queries and must NEVER be
    // the production path: at scale use the ann_ivf_* family (cell
    // assignment + nProbe probing), which reads only probed cells.
    "ann_topk_brute" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      val e = withNorm(t(s, d, "embeddings"))
      val q = withNorm(querySet(t(s, d, "embeddings")))
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

    // Real IVF: deterministic seed centroids → cell assignment →
    // nProbe=2 probing → top-3 per query (ext.Ivf). Fully replicated in
    // the DuckDB oracle, so the whole quantizer is hash-checked.
    // PRODUCTION SIZING LAW: k = ⌊√n⌋ cells, so per-query probe cost
    // is nProbe·(n/k) ≈ nProbe·√n and total search cost scales as
    // √n — the standard IVF operating point. The cell count is derived
    // from the corpus AT RUN TIME (one metadata-cheap count) and the
    // oracle derives it identically (count window + rank filter), so
    // the same gate is hash-green at every SF while scaling like the
    // design instead of a pinned k.
    "ann_ivf_real" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val k = math.max(1, math.sqrt(emb.count().toDouble).toLong.toInt)
      val centroids = graft.ext.Ivf.seedCentroids(emb, k)
      val corpus = graft.ext.Ivf.assign(s, emb, centroids)
      val q = querySet(emb)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.ext.Ivf.search(s, corpus, q, centroids, topK = 3, nProbe = 2)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // IVF with ONE Lloyd refinement iteration: seed → assign →
    // per-(cell,dim) mean → reassign → probe/search. The refinement is
    // replicated end-to-end in the DuckDB oracle (means recomputed in
    // SQL, cast to float32 so both engines quantize the centroid
    // identically), hash-checking the full k-means step — not just the
    // seed quantizer.
    "ann_ivf_lloyd" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val refined = graft.ext.Ivf.lloyd(s, emb,
        graft.ext.Ivf.seedCentroids(emb, 8), iters = 1)
      val corpus = graft.ext.Ivf.assign(s, emb, refined)
      val q = querySet(emb)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.ext.Ivf.search(s, corpus, q, refined, topK = 3, nProbe = 2)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // Persisted + incrementally-appended IVF index: centroids seed from
    // the BASE slice only and publish as a Snapshot table; the assigned
    // corpus lands as a BucketedUpsert table keyed by vec_id; the
    // append slice is assigned against the STORED centroids (no
    // re-train) and upserted; search runs entirely FROM DISK. The
    // oracle seeds from the same base slice and assigns the full
    // corpus, so the whole persisted lifecycle — build, append,
    // reload, probe — is hash-checked.
    // build + append run in the SHARED per-JVM fixture (Fixtures.ivf —
    // exactly this gate's lifecycle, once per run); the delete and
    // retrain gates fork the same fixture instead of paying the
    // identical build+append twice more.
    "ann_ivf_persist" -> ((s, d) => {
      val root = Fixtures.ivf(s, d)
      val q = querySet(t(s, d, "embeddings"))
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.ext.Ivf.searchIndex(s, root, q, topK = 3, nProbe = 2)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // QUANTIZER RETRAIN lifecycle: build from a slice, append the
    // rest, delete a few ids, then retrainIndex re-seeds a LARGER
    // quantizer (k 8→12) from the current corpus and swaps the
    // generation pointer atomically. The search runs through the
    // pointer, so hash-green proves the retrained generation equals a
    // from-scratch rebuild over the surviving corpus — the oracle IS
    // that rebuild (k=12 centroids seeded from the survivors,
    // everything re-assigned). IvfRetrainSpec pins the atomicity and
    // the concurrent-append fail-fasts.
    "ann_ivf_retrain" -> ((s, d) => {
      val root = Fixtures.fork(Fixtures.ivf(s, d))
      val emb = t(s, d, "embeddings")
      graft.ext.Ivf.deleteFromIndex(s, root,
        emb.filter(col("vec_id") % 97 === 0).select("vec_id"), tag = 3)
      graft.ext.Ivf.retrainIndex(s, root, k = 12, tag = 4)
      val q = querySet(emb)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.ext.Ivf.searchIndex(s, root, q, topK = 3, nProbe = 2)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // STREAMING index ingest through the real runtime: two embedding
    // files land as two checkpointed micro-batches (mod-time ordered;
    // maxFilesPerTrigger=1); batch 0 BUILDS the index (quantizer seeds
    // from itself), batch 1 append-assigns against the stored
    // centroids under the batch-id ledger. Search runs from the final
    // published state. The oracle seeds centroids from the batch-0
    // slice and assigns the full corpus — hash-green means continuous
    // ingest converges to exactly the batch lifecycle's index.
    "st_ann_ingest" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-annst-q").toString
      val src = s"$base/src"; val root = s"$base/idx"; val ckp = s"$base/ckp"
      val emb = t(s, d, "embeddings")
      writeOrderedBatches(src, Seq(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 =!= 0)))
      val updates = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      graft.ext.Ivf.streamingIngest(s, updates, root, ckp, k = 8, nBuckets = 16)
      val q = querySet(emb)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.ext.Ivf.searchIndex(s, root, q, topK = 3, nProbe = 2)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // Index deletion (takedown / re-embed): the persisted-index
    // lifecycle's remaining verb — build, append, then REMOVE a vector
    // set by id (touched-bucket key delete on the corpus table; the
    // stored quantizer is untouched, cells only thin). Search runs from
    // the post-delete published state; the oracle assigns the full
    // corpus MINUS the deleted ids against the same base-seeded
    // centroids, so hash-green means deletion is indistinguishable
    // from never having ingested those vectors.
    "ann_ivf_delete" -> ((s, d) => {
      val root = Fixtures.fork(Fixtures.ivf(s, d))
      val emb = t(s, d, "embeddings")
      graft.ext.Ivf.deleteFromIndex(s, root,
        emb.filter(col("vec_id") % 7 === 1).select("vec_id"), tag = 3)
      val q = querySet(emb)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.ext.Ivf.searchIndex(s, root, q, topK = 3, nProbe = 2)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // IVF-style bucketed ANN: search only the query's coarse cell.
    "ann_ivf_bucketed" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      val e = withNorm(t(s, d, "embeddings"))
      val q = withNorm(querySet(t(s, d, "embeddings")))
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qemb"), col("norm").as("qnorm"))
      e.join(broadcast(q), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // IVF-PQ-lite: the composition of ann_ivf_real's coarse quantizer
    // with v_quantize_int8's code scheme, applied to per-cell RESIDUALS
    // (ext.Ivf.residualCodes/searchPq). Candidates in the probed cells
    // are scored approximately as dot(q,c) + qscale·rscale·int8dot,
    // a bounded shortlist (8) is re-ranked EXACTLY, top-3 emitted —
    // the deterministic two-stage shape that makes the gate hash-green
    // (int8 dots are exact in double; ties break by vec_id). This is
    // the 100 TB ANN path: search scans the 4× smaller code table, the
    // float originals are touched only for shortlistK rows per query.
    "ann_ivf_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val centroids = graft.ext.Ivf.seedCentroids(emb, 8)
      val coded = graft.ext.Ivf.residualCodes(
        graft.ext.Ivf.assign(s, emb, centroids), centroids)
      val q = querySet(emb)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      graft.ext.Ivf.searchPq(s, coded, emb, q, centroids,
          topK = 3, nProbe = 2, shortlistK = 8)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // Symmetric int8 vector quantization — the storage/bandwidth lever
    // for ANN at 100 TB (4× smaller vectors, SIMD-friendly int dot
    // products; compose with the ann_ivf_* family by quantizing each
    // cell's residuals). Per-vector scale = max|x|/127; codes are
    // floor(x/scale + 0.5) clamped to ±127. Pure scan-side map, no
    // shuffle. All arithmetic is float→double widening (exact) then
    // IEEE double ops in an identical order to the oracle, so the
    // int codes AND the double scale hash-match bitwise. The code
    // array is to_json-serialized per house oracle-canon convention
    // (see GeomQueries poly_json / tools/check_oracle.py): the
    // driver's compare harness sorts columns and cannot hash a raw
    // array column.
    "v_quantize_int8" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("mx", expr(
          "array_max(transform(embedding, x -> abs(cast(x as double))))"))
        .select(col("vec_id"),
          (col("mx") / 127.0).as("scale"),
          to_json(expr("""CASE WHEN mx = 0.0d THEN transform(embedding, x -> 0)
                  ELSE transform(embedding, x -> cast(greatest(-127.0d,
                    least(127.0d, floor(cast(x as double) / (mx / 127.0d) + 0.5d))) as int))
                  END""")).as("q8_json"))
        .orderBy("vec_id"))
  )

  private val centCosSql =
    """list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
       / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
          * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))))"""

  val oracle: Map[String, String] = Map(
    // Lloyd step replicated in SQL: the refined centroid is the
    // per-(cell, dim) mean of the seed assignment, quantized to float32
    // exactly as Ivf.lloyd's cast("array<float>") does (dim = 64 per
    // TESTDATA.md's embeddings schema).
    "ann_ivf_lloyd" ->
      s"""WITH cent0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                   embedding AS centroid
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
          a0 AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM embeddings e, cent0 c) WHERE rn = 1),
          cent AS (
            SELECT cell, list(m ORDER BY pos) AS centroid FROM (
              SELECT a.cell, r.range AS pos,
                     CAST(AVG(CAST(embedding[r.range + 1] AS DOUBLE)) AS FLOAT) AS m
              FROM a0 a CROSS JOIN range(64) r GROUP BY 1, 2)
            GROUP BY cell),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM embeddings e, cent c) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qemb FROM ($querySetSql)),
          probes AS (
            SELECT qid, qemb, cell FROM (
              SELECT q.qid, q.qemb, c.cell,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(q.qemb AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                         c.cell) AS rn
              FROM q, cent c) WHERE rn <= 2),
          scored AS (
            SELECT p.qid, a.vec_id,
                   list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(p.qemb AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))) AS cos
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid)
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, vec_id
          FROM scored QUALIFY rank <= 3 ORDER BY qid, rank""",
    "ann_ivf_real" ->
      s"""WITH cent AS (
            SELECT CAST(rn - 1 AS INT) AS cell, embedding AS centroid
            FROM (SELECT embedding,
                         row_number() OVER (ORDER BY vec_id) AS rn,
                         count(*) OVER () AS n
                  FROM embeddings)
            WHERE rn <= greatest(1, CAST(floor(sqrt(n)) AS BIGINT))),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM embeddings e, cent c) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qemb FROM ($querySetSql)),
          probes AS (
            SELECT qid, qemb, cell FROM (
              SELECT q.qid, q.qemb, c.cell,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(q.qemb AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                         c.cell) AS rn
              FROM q, cent c) WHERE rn <= 2),
          scored AS (
            SELECT p.qid, a.vec_id,
                   list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(p.qemb AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))) AS cos
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid)
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, vec_id
          FROM scored QUALIFY rank <= 3 ORDER BY qid, rank""",
    // ann_ivf_real's plan with the quantizer seeded from the BASE slice
    // (vec_id % 5 <> 0) — the persisted index assigns base at build and
    // the appended slice against the same stored centroids, so the
    // union equals one assignment of the full corpus.
    "ann_ivf_persist" ->
      s"""WITH cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                   embedding AS centroid
            FROM (SELECT * FROM embeddings WHERE vec_id % 5 <> 0
                  ORDER BY vec_id LIMIT 8)),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM embeddings e, cent c) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qemb FROM ($querySetSql)),
          probes AS (
            SELECT qid, qemb, cell FROM (
              SELECT q.qid, q.qemb, c.cell,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(q.qemb AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                         c.cell) AS rn
              FROM q, cent c) WHERE rn <= 2),
          scored AS (
            SELECT p.qid, a.vec_id,
                   list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(p.qemb AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))) AS cos
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid)
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, vec_id
          FROM scored QUALIFY rank <= 3 ORDER BY qid, rank""",
    "ann_ivf_retrain" ->
      s"""WITH corpus AS (
            SELECT * FROM embeddings WHERE vec_id % 97 <> 0),
          cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                   embedding AS centroid
            FROM (SELECT * FROM corpus
                  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 12)),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM corpus e, cent c) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qemb FROM ($querySetSql)),
          probes AS (
            SELECT qid, qemb, cell FROM (
              SELECT q.qid, q.qemb, c.cell,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(q.qemb AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                         c.cell) AS rn
              FROM q, cent c) WHERE rn <= 2),
          scored AS (
            SELECT p.qid, a.vec_id,
                   list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(p.qemb AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))) AS cos
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid)
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, vec_id
          FROM scored QUALIFY rank <= 3 ORDER BY qid, rank""",

    // ann_ivf_persist's closure with the quantizer seeded from the
    // batch-0 slice (vec_id % 2 = 0) — streaming ingest must converge
    // to exactly the batch lifecycle's index
    "st_ann_ingest" ->
      s"""WITH cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                   embedding AS centroid
            FROM (SELECT * FROM embeddings WHERE vec_id % 2 = 0
                  ORDER BY vec_id LIMIT 8)),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM embeddings e, cent c) WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qemb FROM ($querySetSql)),
          probes AS (
            SELECT qid, qemb, cell FROM (
              SELECT q.qid, q.qemb, c.cell,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(q.qemb AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                         c.cell) AS rn
              FROM q, cent c) WHERE rn <= 2),
          scored AS (
            SELECT p.qid, a.vec_id,
                   list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(p.qemb AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))) AS cos
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid)
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, vec_id
          FROM scored QUALIFY rank <= 3 ORDER BY qid, rank""",
    // ann_ivf_persist's oracle with the deleted ids excluded from the
    // assigned corpus — the quantizer still seeds from the ORIGINAL
    // base slice (deletion never re-trains stored centroids)
    "ann_ivf_delete" ->
      s"""WITH cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                   embedding AS centroid
            FROM (SELECT * FROM embeddings WHERE vec_id % 5 <> 0
                  ORDER BY vec_id LIMIT 8)),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM (SELECT * FROM embeddings WHERE vec_id % 7 <> 1) e, cent c)
            WHERE rn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qemb FROM ($querySetSql)),
          probes AS (
            SELECT qid, qemb, cell FROM (
              SELECT q.qid, q.qemb, c.cell,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(q.qemb AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                         c.cell) AS rn
              FROM q, cent c) WHERE rn <= 2),
          scored AS (
            SELECT p.qid, a.vec_id,
                   list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(p.qemb AS DOUBLE[]), CAST(p.qemb AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))) AS cos
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid)
          SELECT qid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank, vec_id
          FROM scored QUALIFY rank <= 3 ORDER BY qid, rank""",
    "ann_topk_brute" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding FROM ($querySetSql)),
          scored AS (
            SELECT q.qid, e.vec_id, $cosSql AS cos
            FROM embeddings e, q WHERE e.vec_id <> q.qid),
          ranked AS (
            SELECT qid, vec_id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank
            FROM scored)
          SELECT qid, rank, vec_id FROM ranked WHERE rank <= 5 ORDER BY qid, rank""",
    "ann_ivf_bucketed" ->
      s"""WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding FROM ($querySetSql)),
          scored AS (
            SELECT q.qid, e.vec_id, $cosSql AS cos
            FROM embeddings e JOIN q ON e.label = q.qlabel AND e.vec_id <> q.qid),
          ranked AS (
            SELECT qid, vec_id,
                   CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rank
            FROM scored)
          SELECT qid, rank, vec_id FROM ranked WHERE rank <= 3 ORDER BY qid, rank""",
    // Full IVF-PQ-lite replication: seed cells + assignment shared with
    // ann_ivf_real's oracle; residual int8 codes via 1-indexed
    // range(64) element arithmetic (dim = 64 per TESTDATA.md); the
    // approx score qc_dot + qscale*rscale*intdot written with the same
    // association order as the Spark plan (int8 dots are exact in
    // double, so accumulation order is immaterial there); exact re-rank
    // of the arank<=8 shortlist.
    "ann_ivf_pq" ->
      s"""WITH cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                   embedding AS centroid
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
          assigned AS (
            SELECT vec_id, embedding, cell FROM (
              SELECT e.vec_id, e.embedding, c.cell,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY $centCosSql DESC, c.cell) AS rn
              FROM embeddings e, cent c) WHERE rn = 1),
          res AS (
            SELECT a.vec_id, a.cell,
                   sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                        CAST(a.embedding AS DOUBLE[]))) AS vnorm,
                   list_transform(range(64), i ->
                     CAST(a.embedding[i + 1] AS DOUBLE) - CAST(c.centroid[i + 1] AS DOUBLE)) AS r
            FROM assigned a JOIN cent c ON a.cell = c.cell),
          coded AS (
            SELECT vec_id, cell, vnorm, rmx / 127.0 AS rscale,
                   CASE WHEN rmx = 0.0 THEN list_transform(r, x -> 0)
                        ELSE list_transform(r, x -> CAST(greatest(-127.0,
                          least(127.0, floor(x / (rmx / 127.0) + 0.5))) AS INT)) END AS rq8
            FROM (SELECT vec_id, cell, vnorm, r,
                         list_max(list_transform(r, x -> abs(x))) AS rmx
                  FROM res)),
          q AS (
            SELECT qid, qemb, qmx / 127.0 AS qscale,
                   CASE WHEN qmx = 0.0 THEN list_transform(qemb, x -> 0)
                        ELSE list_transform(qemb, x -> CAST(greatest(-127.0,
                          least(127.0, floor(CAST(x AS DOUBLE) / (qmx / 127.0) + 0.5))) AS INT)) END AS qq8
            FROM (SELECT vec_id AS qid, embedding AS qemb,
                         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS qmx
                  FROM ($querySetSql))),
          probes AS (
            SELECT qid, qscale, qq8, cell, qc_dot FROM (
              SELECT q.qid, q.qscale, q.qq8, c.cell,
                     list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])) AS qc_dot,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(q.qemb AS DOUBLE[]), CAST(q.qemb AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                         c.cell) AS rn
              FROM q, cent c) WHERE rn <= 2),
          short AS (
            SELECT qid, vec_id FROM (
              SELECT p.qid, d.vec_id,
                     row_number() OVER (PARTITION BY p.qid ORDER BY
                       CASE WHEN d.vnorm = 0.0 THEN 0.0 ELSE
                         (p.qc_dot + p.qscale * d.rscale *
                           list_dot_product(CAST(p.qq8 AS DOUBLE[]), CAST(d.rq8 AS DOUBLE[])))
                         / d.vnorm END DESC,
                       d.vec_id) AS arank
              FROM coded d JOIN probes p ON d.cell = p.cell AND d.vec_id <> p.qid)
            WHERE arank <= 8),
          reranked AS (
            SELECT s.qid, e.vec_id,
                   CAST(row_number() OVER (PARTITION BY s.qid ORDER BY
                     list_dot_product(CAST(qq.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                       / (sqrt(list_dot_product(CAST(qq.embedding AS DOUBLE[]), CAST(qq.embedding AS DOUBLE[])))
                          * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
                     e.vec_id) AS INT) AS rank
            FROM short s
            JOIN embeddings e ON e.vec_id = s.vec_id
            JOIN embeddings qq ON qq.vec_id = s.qid)
          SELECT qid, rank, vec_id FROM reranked WHERE rank <= 3 ORDER BY qid, rank""",
    // Same float→double widening and op order as the Spark plan so the
    // codes and the scale match bitwise; DuckDB lists are 1-indexed but
    // only element VALUES are used, so indexing never enters the math.
    "v_quantize_int8" ->
      """WITH m AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) AS mx
           FROM embeddings)
         SELECT vec_id, mx / 127.0 AS scale,
                to_json(CASE WHEN mx = 0.0 THEN list_transform(embedding, x -> 0)
                     ELSE list_transform(embedding, x -> CAST(greatest(-127.0,
                       least(127.0, floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5))) AS INT))
                END) AS q8_json
         FROM m ORDER BY vec_id"""
  )
}
