package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** LLM-training-pipeline text analysis over `documents` (builder brief:
  * language-ID, quality scoring, token counting, fingerprinting). All
  * metrics are integer-valued or md5-based so the DuckDB oracle matches
  * bit-for-bit; everything is a scan-side map (no shuffle, codegen'd
  * built-ins only — no UDFs on this path).
  */
object TextQueries extends QueryPack {

  private val enStops = Seq("the", "a", "is", "of", "and", "to", "in")
  private val esStops = Seq("el", "la", "de", "es", "y", "que", "en")
  private val deStops = Seq("der", "die", "das", "und", "ist", "zu", "von")

  private def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("(", ",", ")")

  /** Stopword-profile count over the `toks` column — THE quality/lang-ID
    * kernel, defined once for every query that composes it (and its SQL
    * twin below, so Scala and oracle can never drift independently).
    */
  private def stopCount(stops: Seq[String]) =
    expr(s"size(filter(toks, x -> x IN ${inList(stops)}))")

  private def stopCountSql(stops: Seq[String]) =
    s"len(list_filter(string_split(text,' '), x -> x IN ${inList(stops)}))"

  val defs: Map[String, QueryFn] = Map(
    // Token counting (whitespace tokenizer — the BPE-ish variant is the
    // regexp_extract_all split below).
    "t_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("n_bpe_ish"))
        .orderBy("doc_id")),

    // Quality scoring: stopword ratio + mean token length as exact
    // integer numerator/denominator pairs, plus the keep/drop decision.
    "t_quality_score" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          stopCount(enStops).as("n_stop"),
          expr("aggregate(toks, 0, (acc, x) -> acc + length(x))").as("sum_tok_len"),
          (stopCount(enStops) * 10
            >= size(col("toks"))).as("keep"))
        .orderBy("doc_id")),

    // Language-ID: stopword-profile scoring with a deterministic
    // cascaded-argmax (heuristic n-gram language ID shape; profiles are
    // tiny stopword sets, swappable for real char-n-gram tables).
    "t_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("s_en", stopCount(enStops))
        .withColumn("s_es", stopCount(esStops))
        .withColumn("s_de", stopCount(deStops))
        .select(col("doc_id"), col("lang"),
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
            .when(col("s_es") >= col("s_de"), "es")
            .otherwise("de").as("lang_guess"))
        .orderBy("doc_id")),

    // Document fingerprinting: full-content hash + a coarse rolling-
    // window fingerprint (md5 of every 16th token joined) — both
    // engine-portable.
    "t_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          md5(lower(col("text")).cast("binary")).as("content_hash"),
          md5(expr("concat_ws(' ', filter(toks, (x, i) -> i % 16 = 0))").cast("binary"))
            .as("sketch_hash"))
        .orderBy("doc_id")),

    // Composed corpus-cleaning stage — the user-facing operation a
    // training-data pipeline actually runs, chaining the kernels above:
    // quality gate (stopword ratio) → language filter (cascaded-argmax
    // == 'en') → exact near-copy collapse (content hash, keep lowest
    // doc_id, min_by carries the kept doc's token count). One scan-side
    // map then one hash-groupBy shuffle — the same shape at any corpus
    // size.
    "t_corpus_clean" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_stop", stopCount(enStops))
        .withColumn("s_es", stopCount(esStops))
        .withColumn("s_de", stopCount(deStops))
        .filter(col("n_stop") * 10 >= col("n_tokens"))
        .filter(col("n_stop") >= col("s_es") && col("n_stop") >= col("s_de"))
        .withColumn("content_hash", md5(lower(col("text")).cast("binary")))
        .groupBy("content_hash")
        .agg(min(col("doc_id")).as("keep_doc_id"),
             min_by(col("n_tokens"), col("doc_id")).as("n_tokens"),
             count(lit(1)).as("n_copies"))
        .orderBy("keep_doc_id")),

    // Per-language top-5 bigrams: bigram explode (higher-order fns, no
    // UDF) → two-phase count → per-lang ranking window. The groupBy is
    // partially aggregated map-side, so the shuffle carries (lang,
    // bigram, partial-count) — vocabulary-sized, not corpus-sized; the
    // ranking window partitions by lang (parallel; WindowGroupLimit
    // prunes to the top-k before the final sort at scale).
    "t_ngram_top" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("bigram"))
        .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("n").desc, col("bigram"))))
        .filter(col("rn") <= 5)
        .select("lang", "rn", "bigram", "n")
        .orderBy("lang", "rn")
    }),

    // Repetition signals (Gopher-style quality filters, Rae et al. 2021
    // §A1.1): duplicate-token and duplicate-bigram counts plus the most
    // frequent bigram's multiplicity, all exact integers, via the
    // native one-pass graft_repetition kernel (O(d) per document; the
    // declarative HOF chain this replaced recomputed distinct-bigram
    // counts quadratically). Scan-side map, zero shuffle — identical
    // shape at 100 TB. The size filter stays the CHEAP split-size
    // predicate so pushdown never re-inlines the kernel (SCALE.md
    // audit 6); the struct fields are extracted from ONE kernel call
    // (non-cheap expression — Catalyst does not duplicate it;
    // PLANS.md). The keep rule drops documents whose duplicate-bigram
    // fraction exceeds 1/5.
    "t_repetition" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      t(s, d, "documents")
        .filter(size(split(col("text"), " ")) >= 2)
        .withColumn("rep", expr("graft_repetition(text)"))
        .select(col("doc_id"),
          col("rep.n_tokens").as("n_tokens"),
          col("rep.n_dup_tokens").as("n_dup_tokens"),
          col("rep.n_bigrams").as("n_bigrams"),
          col("rep.n_dup_bigrams").as("n_dup_bigrams"),
          col("rep.top_bigram_n").as("top_bigram_n"),
          (col("rep.n_dup_bigrams") * 5 < col("rep.n_bigrams")).as("keep"))
        .orderBy("doc_id")
    }),

    // Corpus-relative token rarity — the two-pass quality signal the
    // per-doc ratios above can't see (a doc full of tokens that appear
    // nowhere else in the corpus is OCR noise / boilerplate-stripping
    // residue; one full of ubiquitous tokens is template spam). Pass 1
    // computes document frequency per token (map-side-combined groupBy
    // over DISTINCT per-doc tokens — shuffle volume is vocabulary-
    // bounded, not corpus-bounded); pass 2 joins df back to the token
    // stream (vocabulary-sized build side, AQE picks broadcast when it
    // fits) and re-aggregates per doc. All-integer outputs.
    "t_rarity_score" -> ((s, d) => {
      // pinned: the distinct-token stream feeds the df aggregate AND
      // the probe side of the join — without the pin each consumer
      // re-scans and re-tokenizes the corpus (house convention, see
      // DedupQueries.embedPairs / d_lsh_jaccard_verify).
      val docToks = graft.operators.SeqIds.pin(
        t(s, d, "documents")
          .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tks")))
      val toks = docToks.select(col("doc_id"), explode(col("tks")).as("tok"))
      val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct_tokens"),
          sum(when(col("df") === 1, 1).otherwise(0)).as("n_hapax"),
          sum("df").as("sum_df"))
        .orderBy("doc_id")
    }),

    // BM25 scored retrieval (Robertson–Spärck Jones; k1=1.2, b=0.75) —
    // the lexical ranking half of a retrieval/RAG data pipeline. One
    // corpus scan builds per-doc lengths; the term-frequency stream is
    // filtered to the QUERY's terms before any shuffle, so the grouped
    // tf frame is |hits|-sized, the per-term df aggregate is
    // vocabulary-of-query-sized (3 rows), and corpus stats (N, avgdl)
    // are a 1-row broadcast — nothing corpus-sized moves. Final top-k
    // is orderBy+limit → TakeOrderedAndProject (per-partition heaps, k
    // rows to the driver), the same no-global-sort shape as
    // o4_global_topk. Scores are rounded to 1e-6 BEFORE ranking so
    // cross-engine float ulp differences can neither reorder the top-k
    // nor flake the hash.
    "t_bm25_topk" -> ((s, d) => {
      val qTerms = Seq("dup", "spark", "merge")
      // pinned: the tokenized frame feeds tf, df AND corpus stats —
      // unpinned, the df and stats branches each re-scan and re-split
      // the corpus (house convention; released by the consumer's
      // releaseAll)
      val docs = graft.operators.SeqIds.pin(
        t(s, d, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("dl", size(col("toks")).cast("double")))
      val stats = docs.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
      val tf = graft.operators.SeqIds.pin(
        docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
          .filter(col("tok").isin(qTerms: _*))
          .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).cast("double").as("tf")))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
      tf.join(broadcast(dfreq), "tok")
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(round(sum(
          log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            col("tf") * lit(1.2 + 1.0) /
            (col("tf") + lit(1.2) * (lit(1.0 - 0.75) + lit(0.75) * col("dl") / col("avgdl")))), 6)
          .as("bm25"))
        .orderBy(desc("bm25"), col("doc_id"))
        .limit(25)
    }),

    // BM25 from a PERSISTED inverted index (ext.Bm25Index): build the
    // postings + doc-stats tables from the base slice, append the rest
    // incrementally (tokenize only the batch, touched-bucket rewrite),
    // then answer the SAME query as t_bm25_topk entirely from the
    // stored index — same terms, same scoring, same oracle SQL, so
    // hash-green means the maintained index is indistinguishable from
    // re-scoring the corpus. The production retrieval shape: ingest
    // tokenizes once per batch; queries touch only their terms'
    // postings (tok IN-filter pushed into the postings scan).
    // build + append run in the SHARED per-JVM fixture (Fixtures.bm25
    // — exactly this gate's lifecycle, once per run); the gate queries
    // the built state. The delete gate forks the same fixture instead
    // of paying the identical build again.
    "t_bm25_indexed" -> ((s, d) =>
      graft.ext.Bm25Index.topK(s, Fixtures.bm25(s, d),
        Seq("dup", "spark", "merge"), 25)),

    // STREAMING crawl ingest through the real runtime: two document
    // files land as two checkpointed micro-batches; batch 0 builds the
    // inverted index, batch 1 appends (tokenizes only itself). The
    // two-table publish is replay-safe via per-table tag guards with
    // the ledger anchored on the LAST-published table (scaladoc on
    // Bm25Index.streamingIngest; Bm25IndexSpec pins batch-lifecycle
    // equality and restart no-op-ness). Unlike the IVF gate there is
    // no seed sensitivity — the index is batch-split-invariant, so the
    // oracle is the full-corpus BM25 closure shared with t_bm25_topk.
    "st_bm25_ingest" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-bm25st-q").toString
      val src = s"$base/src"; val root = s"$base/idx"; val ckp = s"$base/ckp"
      val docs = t(s, d, "documents").select("doc_id", "text")
      writeOrderedBatches(src, Seq(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0)))
      val updates = s.readStream.schema(s.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      graft.ext.Bm25Index.streamingIngest(s, updates, root, ckp, nBuckets = 16)
      graft.ext.Bm25Index.topK(s, root, Seq("dup", "spark", "merge"), 25)
    }),

    // Index deletion: build the full corpus, take down the
    // doc_id%10==7 slice (delete re-derives the posting keys from the
    // docs' own text — the append-only contract's delete-first verb),
    // query from the post-delete state. The oracle is the SAME BM25
    // closure over the surviving corpus: hash-green means stats (N,
    // avgdl, df) shrank exactly as if the docs were never ingested.
    "t_bm25_delete" -> ((s, d) => {
      // metadata-only fork of the shared built index (same final state
      // as a fresh full build — the index is batch-split-invariant);
      // the delete then exercises its verb on the fork's own manifests
      val root = Fixtures.fork(Fixtures.bm25(s, d))
      val docs = t(s, d, "documents").select("doc_id", "text")
      graft.ext.Bm25Index.deleteDocs(s, root,
        docs.filter(col("doc_id") % 10 === 7), tag = 3)
      graft.ext.Bm25Index.topK(s, root, Seq("dup", "spark", "merge"), 25)
    }),

    // Benchmark decontamination (GPT-3 §C / PaLM-style): flag training
    // documents sharing word-5-grams with a held-out benchmark set
    // (here the doc_id%20==0 slice stands in for the eval suite; in
    // production it is a separate small table). Scale shape: the
    // benchmark side is eval-suite-sized (MBs) by construction, so its
    // distinct-5-gram set is BROADCAST and the corpus-sized training
    // side is probed map-side — the only shuffle is the per-doc count
    // over rows that actually hit, i.e. the (tiny) contaminated slice.
    // 5-grams, not the 3-gram shingle kernel: over a small vocabulary
    // 3-grams collide by chance while 5-gram overlap isolates true
    // near-copies of benchmark docs (real pipelines use 8-13).
    "t_decontaminate" -> ((s, d) => {
      val grams5 = array_distinct(expr(
        "transform(sequence(1, size(split(text,' ')) - 4)," +
          " i -> array_join(slice(split(text,' '), i, 5), ' '))"))
      val ex = t(s, d, "documents")
        .filter(size(split(col("text"), " ")) >= 5)
        .select(col("doc_id"), explode(grams5).as("s"))
      val bench = ex.filter(col("doc_id") % 20 === 0).select("s").distinct()
      ex.filter(col("doc_id") % 20 =!= 0)
        .join(broadcast(bench), Seq("s"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        .select(col("doc_id"), col("n_hits"),
          (col("n_hits") >= 3).cast("int").as("contaminated"))
        .orderBy("doc_id")
    }),

    // Model-based quality filtering (the fastText/DCLM-classifier
    // shape): a fixed-weight logistic scorer over the heuristic
    // features — stopword ratio, mean token length, log document
    // length. The weights stand in for a trained model; the operator
    // shape (featurize → dot → sigmoid → threshold, pure scan-side
    // map) is exactly what a real classifier deploys as. exp/ln differ
    // across engines only at ulp level, far inside the gate's 9-
    // significant-digit float canon.
    "t_quality_model" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n", size(col("toks")).cast("double"))
        .withColumn("stop_ratio", stopCount(enStops).cast("double") / col("n"))
        .withColumn("mean_len",
          expr("aggregate(toks, 0, (acc, x) -> acc + length(x))").cast("double") / col("n"))
        .withColumn("score",
          lit(1.0) / (lit(1.0) + exp(-(lit(-2.0) + lit(8.0) * col("stop_ratio")
            + lit(0.5) * col("mean_len") + lit(0.25) * log(col("n"))))))
        .select(col("doc_id"), col("score"),
          (col("score") > 0.5).cast("int").as("keep"))
        .orderBy("doc_id")),

    // Deterministic global corpus shuffle — the training-order
    // randomization step before batching: order by a seeded
    // content-independent hash key and assign the global ordinal with
    // the scale-safe SeqIds two-pass (range partition + per-partition
    // counts; never a single-partition row_number). Changing the seed
    // string ("shuf1|") re-shuffles for the next epoch; identical seed
    // ⇒ identical order on any cluster size (no RNG state).
    "t_doc_shuffle" -> ((s, d) => {
      val keyed = t(s, d, "documents")
        .select(col("doc_id"),
          md5(concat(lit("shuf1|"), col("doc_id").cast("string")).cast("binary"))
            .as("skey"))
      graft.operators.SeqIds
        .withSeqId(keyed, Seq(col("skey"), col("doc_id")), "shuffle_pos")
        .select("doc_id", "shuffle_pos")
        .orderBy("shuffle_pos")
    }),

    // Sequence packing (GPT-style training-batch shaping): concatenate
    // the corpus in doc_id order and split it into fixed 128-token
    // sequences; a document spanning a boundary is split across the two
    // sequences. Output: one row per (sequence, contributing doc) with
    // the token count it contributes — every non-final sequence sums to
    // exactly 128. The global token offset per doc is a distributed
    // exclusive prefix sum with NO single-partition fact stage and NO
    // driver collect: (1) per-bucket token sums (bucket = doc_id div 64;
    // map-side-combined groupBy, bucket-count-sized result), (2)
    // exclusive prefix over the bucket sums via a single-partition
    // window — legitimate because the frame is dimension-sized, the
    // same justification as SeqIds.withSeqIdDim (tune the bucket grain
    // so bucket count stays ~10⁵-10⁶ at 100 TB), (3) broadcast the
    // bucket offsets back and window-cumsum WITHIN each bucket —
    // parallel across buckets, one narrow (doc_id, n) shuffle. The
    // boundary explode emits ceil(n/128)+1-bounded rows per doc.
    "t_seq_pack" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val (bTok, g) = (128L, 64L)
      // pinned: the narrow (doc_id, n, bucket) frame feeds the bucket
      // sums AND the probe side — three longs per doc in cache beats
      // re-reading and re-tokenizing the text column (house convention)
      val tok = graft.operators.SeqIds.pin(
        t(s, d, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n"))
          .withColumn("bucket", expr(s"doc_id div $g")))
      val wb = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val boffs = tok.groupBy("bucket").agg(sum("n").as("bn"))
        .withColumn("boff", coalesce(sum(col("bn")).over(wb), lit(0L)))
        .select("bucket", "boff")
      val wl = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      tok.join(broadcast(boffs), "bucket")
        .withColumn("st", col("boff") + coalesce(sum(col("n")).over(wl), lit(0L)))
        .select(col("doc_id"), col("n"), col("st"),
          explode(expr(s"sequence(st div $bTok, (st + n - 1) div $bTok)")).as("seq_id"))
        .select(col("seq_id"), col("doc_id"),
          (least(col("st") + col("n"), (col("seq_id") + 1) * bTok) -
            greatest(col("st"), col("seq_id") * bTok)).as("n_tok"))
        .orderBy("seq_id", "doc_id")
    }),

    // PII scrub: regex redaction of emails and US-style phone numbers,
    // with per-document match counts. The test corpus carries no PII,
    // so both engines deterministically inject it first (same doc_id
    // arithmetic on both sides) — the gate then proves the scrub
    // kernel: counts AND the full redacted text (via md5). Patterns are
    // written in the Java-regex ∩ RE2 common dialect so Spark and
    // DuckDB agree; scan-side map, no shuffle, no UDF.
    "t_pii_scrub" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("aug", concat(col("text"),
          when(col("doc_id") % 3 =!= 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 2 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"),
              lit("-"),
              lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
        .select(col("doc_id"),
          // patterns go through lit(), NOT a SQL literal — Spark's SQL
          // parser would eat the \b/\. escapes inside expr("'...'")
          size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(PhoneRe), lit(0))).as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>").cast("binary")).as("scrub_hash"))
        .orderBy("doc_id"))
  )

  /** Redaction patterns, constrained to the dialect Java regex and RE2
    * share (no backrefs, no lookaround) so the DuckDB oracle runs them
    * verbatim. Single-quote-free so they embed in SQL literals.
    */
  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""

  private val augSql =
    """text
       || CASE WHEN doc_id % 3 <> 0
               THEN ' contact user' || doc_id || '@mail.example.com' ELSE '' END
       || CASE WHEN doc_id % 2 = 0
               THEN ' call 555-' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
                    || '-' || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
               ELSE '' END"""

  // Shared by t_bm25_topk (corpus-direct) and t_bm25_indexed (the
  // maintained index must be indistinguishable from scoring the corpus).
  /** The BM25 closure over `documents` restricted by `docFilter` —
    * shared verbatim by the scan, index, and index-delete gates (the
    * index paths' whole contract is indistinguishability from scoring
    * the filtered corpus directly). */
  private def bm25OracleSqlFor(docFilter: String) =
    s"""WITH dl AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS DOUBLE) AS dl
                     FROM documents WHERE text IS NOT NULL AND ($docFilter)),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                FROM documents WHERE text IS NOT NULL AND ($docFilter)),
         tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM tk
                WHERE tok IN ('dup','spark','merge') GROUP BY 1, 2),
         dfreq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
         SELECT t.doc_id,
                round(sum(ln((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
                          * t.tf * (1.2 + 1.0)
                          / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))), 6)
                  AS bm25
         FROM tf t
         JOIN dfreq f ON f.tok = t.tok
         JOIN dl l ON l.doc_id = t.doc_id
         CROSS JOIN stats s
         GROUP BY t.doc_id
         ORDER BY bm25 DESC, t.doc_id LIMIT 25"""

  private val bm25OracleSql = bm25OracleSqlFor("TRUE")

  val oracle: Map[String, String] = Map(
    "t_quality_model" ->
      s"""WITH f AS (SELECT doc_id,
            CAST(len(string_split(text,' ')) AS DOUBLE) AS n,
            CAST(${stopCountSql(enStops)} AS DOUBLE) AS n_stop,
            CAST(list_sum(list_transform(string_split(text,' '), x -> len(x))) AS DOUBLE) AS sum_len
          FROM documents),
          sc AS (SELECT doc_id,
            1.0 / (1.0 + exp(-(-2.0 + 8.0 * (n_stop / n)
              + 0.5 * (sum_len / n) + 0.25 * ln(n)))) AS score
          FROM f)
          SELECT doc_id, score, CAST(score > 0.5 AS INT) AS keep
          FROM sc ORDER BY doc_id""",
    "t_doc_shuffle" ->
      """SELECT doc_id,
         CAST(row_number() OVER (ORDER BY md5('shuf1|' || doc_id), doc_id) - 1 AS BIGINT)
           AS shuffle_pos
         FROM documents ORDER BY shuffle_pos""",
    // the oracle states packing semantics with ONE global window —
    // correct single-node, which is the point of an oracle; the Spark
    // side distributes the same prefix sum over buckets
    "t_seq_pack" ->
      """WITH tok AS (SELECT doc_id, len(string_split(text,' ')) AS n
                      FROM documents WHERE text IS NOT NULL),
         cum AS (SELECT doc_id, n,
                   CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
                 FROM tok),
         spans AS (SELECT doc_id, n, st,
                     unnest(range(st//128, ((st+n-1)//128)+1)) AS seq_id
                   FROM cum)
         SELECT seq_id, doc_id,
                least(st+n, (seq_id+1)*128) - greatest(st, seq_id*128) AS n_tok
         FROM spans ORDER BY seq_id, doc_id""",
    "t_decontaminate" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
                      WHERE len(string_split(text,' ')) >= 5),
         ex5 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-3),
                   i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]))) AS s
                 FROM tok),
         bench AS (SELECT DISTINCT s FROM ex5 WHERE doc_id % 20 = 0),
         hits AS (SELECT doc_id, count(*) AS n_hits
                  FROM ex5 WHERE doc_id % 20 <> 0 AND s IN (SELECT s FROM bench)
                  GROUP BY doc_id)
         SELECT doc_id, n_hits, CAST(n_hits >= 3 AS INT) AS contaminated
         FROM hits ORDER BY doc_id""",
    "t_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS n_bpe_ish
         FROM documents ORDER BY doc_id""",
    "t_quality_score" ->
      s"""SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
          ${stopCountSql(enStops)} AS n_stop,
          CAST(list_sum(list_transform(string_split(text,' '), x -> len(x))) AS INT) AS sum_tok_len,
          ${stopCountSql(enStops)} * 10
            >= len(string_split(text,' ')) AS keep
          FROM documents ORDER BY doc_id""",
    "t_lang_id" ->
      s"""WITH sc AS (SELECT doc_id, lang,
            ${stopCountSql(enStops)} s_en,
            ${stopCountSql(esStops)} s_es,
            ${stopCountSql(deStops)} s_de
          FROM documents)
          SELECT doc_id, lang,
            CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                 WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS lang_guess
          FROM sc ORDER BY doc_id""",
    "t_fingerprint" ->
      """SELECT doc_id, md5(lower(text)) AS content_hash,
         md5(array_to_string(list_filter(string_split(text,' '),
           (x, i) -> (i - 1) % 16 = 0), ' ')) AS sketch_hash
         FROM documents ORDER BY doc_id""",
    "t_corpus_clean" ->
      s"""WITH scored AS (
           SELECT doc_id, text,
                  len(string_split(text,' ')) AS n_tokens,
                  ${stopCountSql(enStops)} AS n_stop,
                  ${stopCountSql(esStops)} AS s_es,
                  ${stopCountSql(deStops)} AS s_de
           FROM documents),
         kept AS (
           SELECT doc_id, n_tokens, md5(lower(text)) AS content_hash
           FROM scored
           WHERE n_stop * 10 >= n_tokens AND n_stop >= s_es AND n_stop >= s_de)
         SELECT content_hash, min(doc_id) AS keep_doc_id,
                arg_min(n_tokens, doc_id) AS n_tokens,
                count(*) AS n_copies
         FROM kept GROUP BY content_hash ORDER BY keep_doc_id""",
    "t_ngram_top" ->
      """WITH toks AS (
           SELECT lang, string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         bi AS (
           SELECT lang, unnest(list_transform(range(1, len(tk)),
                  i -> tk[i] || ' ' || tk[i + 1])) AS bigram
           FROM toks),
         cnt AS (SELECT lang, bigram, count(*) AS n FROM bi GROUP BY 1, 2)
         SELECT lang, CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS INT) AS rn,
                bigram, n
         FROM cnt QUALIFY rn <= 5 ORDER BY lang, rn""",
    "t_repetition" ->
      """WITH tk AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         bg AS (
           SELECT doc_id, toks,
                  list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1]) AS bg
           FROM tk)
         SELECT doc_id,
                len(toks) AS n_tokens,
                len(toks) - len(list_distinct(toks)) AS n_dup_tokens,
                len(bg) AS n_bigrams,
                len(bg) - len(list_distinct(bg)) AS n_dup_bigrams,
                list_max(list_transform(list_distinct(bg),
                  x -> len(list_filter(bg, y -> y = x)))) AS top_bigram_n,
                (len(bg) - len(list_distinct(bg))) * 5 < len(bg) AS keep
         FROM bg ORDER BY doc_id""",
    "t_rarity_score" ->
      """WITH tk AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents),
         dfreq AS (SELECT tok, count(*) AS df FROM tk GROUP BY tok)
         SELECT t.doc_id, count(*) AS n_distinct_tokens,
                CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
                CAST(sum(f.df) AS BIGINT) AS sum_df
         FROM tk t JOIN dfreq f ON t.tok = f.tok
         GROUP BY t.doc_id ORDER BY t.doc_id""",
    // Same kernel, same 1e-6 pre-rank rounding; sums are 3 doubles max
    // per doc so accumulation-order divergence sits far below the
    // rounding grain.
    "t_bm25_topk" -> bm25OracleSql,
    // the maintained index over base ∪ appended batch must score
    // identically to the corpus-direct oracle — one SQL serves both
    "t_bm25_indexed" -> bm25OracleSql,
    // deletion is indistinguishable from never having ingested the
    // docs: the same closure over the surviving corpus (stats shrink
    // with the deletion — N, avgdl, and df all recompute)
    "t_bm25_delete" -> bm25OracleSqlFor("doc_id % 10 <> 7"),
    // streaming ingest is batch-split-invariant: same closure as the
    // scan and batch-index gates
    "st_bm25_ingest" -> bm25OracleSql,
    "t_pii_scrub" ->
      s"""WITH a AS (SELECT doc_id, $augSql AS aug FROM documents)
          SELECT doc_id,
                 len(regexp_extract_all(aug, '$EmailRe')) AS n_emails,
                 len(regexp_extract_all(aug, '$PhoneRe')) AS n_phones,
                 md5(regexp_replace(
                       regexp_replace(aug, '$EmailRe', '<EMAIL>', 'g'),
                       '$PhoneRe', '<PHONE>', 'g')) AS scrub_hash
          FROM a ORDER BY doc_id"""
  )
}
