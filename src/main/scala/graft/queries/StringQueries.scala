package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** SURVEY §2.8 F-S1..F-S4 — the reference's string/regex surface
  * (path parsing TrainDatasets.py:213-233, filename normalization
  * CvatApi.py:269-280/372-383, lowercase labels :72, line formatting
  * create_yolo_from_feather.py:65-66) over synthesized names derived
  * from keys. Pure map shapes — no shuffle beyond the oracle-mandated
  * sort.
  */
object StringQueries extends QueryPack {

  val defs: Map[String, QueryFn] = Map(
    // F-S1: regex-extract partition keys from hive-style paths
    // (TrainDatasets.py:216,506) — unnecessary with native partition
    // columns (S5) but covered for surface completeness.
    "f_s1_regex_extract" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("path", concat(lit("lake/project_id="), col("o_custkey") % 50,
          lit("/job_id="), col("o_orderkey") % 7, lit("/part-0.parquet")))
        .select(col("o_orderkey"),
          regexp_extract(col("path"), "project_id=(\\d+)", 1).cast("bigint").as("project_id"),
          regexp_extract(col("path"), "job_id=(\\d+)", 1).cast("bigint").as("job_id"))
        .orderBy("o_orderkey")),

    // F-S2: filename normalization — strip extension, drop the leading
    // '_'-separated task prefix, rejoin (CvatApi.py:107-108,269-280).
    "f_s2_filename_norm" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("fname", concat(lit("t"), col("o_orderkey") % 9, lit("_img_"),
          col("o_orderkey"), lit(".jpeg")))
        .withColumn("stem", regexp_replace(col("fname"), "\\.[^.]*$", ""))
        .select(col("o_orderkey"),
          array_join(slice(split(col("stem"), "_"), 2, 100), "_").as("image_name"))
        .orderBy("o_orderkey")),

    // F-S3: lowercase labels (CvatApi.py:72).
    "f_s3_lower" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"), lower(col("c_mktsegment")).as("label"))
        .orderBy("c_custkey")),

    // F-J1 build side: gt_attr JSON array assembled from typed
    // attributes (CvatApi.py:388-406, emitted in the valid-JSON form —
    // see ingest.CvatTables for the documented stray-quote deviation).
    "f_j1_json_build" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          concat(lit("""[{"iid": """"), col("o_orderkey") % 1000,
            lit(""""}, {"text": """"), col("o_orderstatus"), lit(""""}]"""))
            .as("gt_attr"))
        .orderBy("o_orderkey")),

    // F-S4: formatted line assembly (create_yolo_from_feather.py:65-66).
    "f_s4_line_format" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          concat_ws(" ", col("l_returnflag"), col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string")).as("line"))
        .orderBy("l_orderkey", "l_linenumber")),

    // F-S5: URL normalization — the key-prep step of URL-level corpus
    // dedup (crawl pipelines dedupe on the normalized URL before any
    // content pass). Both engines synthesize the same messy URL from
    // doc columns, then normalize with an identical regex chain:
    // strip fragment → strip utm_* params → tidy dangling ?/& →
    // lowercase scheme+host → drop default port → collapse /? →
    // drop trailing slash. Pure map, no shuffle; the chain is
    // codegen'd regexp_replace/regexp_extract built-ins.
    "f_s5_url_norm" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("url", concat(
          lit("HTTPS://WWW.Example"), (col("doc_id") % 7).cast("string"), lit(".COM"),
          when(col("doc_id") % 2 === 0, ":443").otherwise(""),
          lit("/Docs/"), col("source"), lit("/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 3 === 0, "/").otherwise(""),
          when(col("doc_id") % 4 =!= 0,
            concat(lit("?utm_source=feed&utm_campaign=x&page="),
              (col("doc_id") % 5).cast("string"))).otherwise(""),
          when(col("doc_id") % 5 === 0,
            concat(lit("#sec"), col("doc_id").cast("string"))).otherwise("")))
        .withColumn("u1", regexp_replace(col("url"), "#.*$", ""))
        .withColumn("u2", regexp_replace(col("u1"), "utm_[a-z]+=[^&#]*&?", ""))
        .withColumn("u3", regexp_replace(col("u2"), "[?&]+$", ""))
        .withColumn("pfx", regexp_extract(col("u3"), "^[^/]+//[^/]+", 0))
        .withColumn("pfxn", regexp_replace(lower(col("pfx")), ":(443|80)$", ""))
        .withColumn("rest", expr("substring(u3, length(pfx) + 1)"))
        .withColumn("restn",
          regexp_replace(regexp_replace(col("rest"), "/+\\?", "?"), "/+$", ""))
        .select(col("doc_id"), col("url"),
          concat(col("pfxn"), col("restn")).as("norm_url"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "f_s1_regex_extract" ->
      """SELECT o_orderkey,
         CAST(regexp_extract('lake/project_id=' || CAST(o_custkey % 50 AS VARCHAR) ||
           '/job_id=' || CAST(o_orderkey % 7 AS VARCHAR) || '/part-0.parquet',
           'project_id=(\d+)', 1) AS BIGINT) AS project_id,
         CAST(regexp_extract('lake/project_id=' || CAST(o_custkey % 50 AS VARCHAR) ||
           '/job_id=' || CAST(o_orderkey % 7 AS VARCHAR) || '/part-0.parquet',
           'job_id=(\d+)', 1) AS BIGINT) AS job_id
         FROM orders ORDER BY o_orderkey""",
    "f_s2_filename_norm" ->
      """SELECT o_orderkey,
         array_to_string(string_split(regexp_replace(
           't' || CAST(o_orderkey % 9 AS VARCHAR) || '_img_' ||
           CAST(o_orderkey AS VARCHAR) || '.jpeg', '\.[^.]*$', ''), '_')[2:], '_') AS image_name
         FROM orders ORDER BY o_orderkey""",
    "f_s3_lower" ->
      "SELECT c_custkey, lower(c_mktsegment) AS label FROM customer ORDER BY c_custkey",
    "f_j1_json_build" ->
      """SELECT o_orderkey,
         '[{"iid": "' || CAST(o_orderkey % 1000 AS VARCHAR) || '"}, {"text": "' ||
         o_orderstatus || '"}]' AS gt_attr
         FROM orders ORDER BY o_orderkey""",
    "f_s4_line_format" ->
      """SELECT l_orderkey, l_linenumber,
         l_returnflag || ' ' || CAST(l_orderkey AS VARCHAR) || ' ' ||
         CAST(l_linenumber AS VARCHAR) AS line
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    // Same regex chain with DuckDB's 'g' flag (Spark's regexp_replace
    // is global by default).
    "f_s5_url_norm" ->
      """WITH u0 AS (SELECT doc_id,
           'HTTPS://WWW.Example' || (doc_id % 7) || '.COM'
           || CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END
           || '/Docs/' || source || '/' || (doc_id % 50)
           || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
           || CASE WHEN doc_id % 4 <> 0
                   THEN '?utm_source=feed&utm_campaign=x&page=' || (doc_id % 5)
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN '#sec' || doc_id ELSE '' END AS url
           FROM documents),
         u AS (SELECT doc_id, url,
           regexp_replace(regexp_replace(regexp_replace(url,
             '#.*$', '', 'g'), 'utm_[a-z]+=[^&#]*&?', '', 'g'),
             '[?&]+$', '', 'g') AS u3 FROM u0),
         p AS (SELECT doc_id, url, u3,
           regexp_extract(u3, '^[^/]+//[^/]+') AS pfx FROM u)
         SELECT doc_id, url,
           regexp_replace(lower(pfx), ':(443|80)$', '', 'g')
           || regexp_replace(regexp_replace(substring(u3, length(pfx) + 1),
                '/+\?', '?', 'g'), '/+$', '', 'g') AS norm_url
         FROM p ORDER BY doc_id"""
  )
}
