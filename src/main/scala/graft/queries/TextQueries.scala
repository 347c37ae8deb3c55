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
    })
  )

  val oracle: Map[String, String] = Map(
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
         FROM cnt QUALIFY rn <= 5 ORDER BY lang, rn"""
  )
}
