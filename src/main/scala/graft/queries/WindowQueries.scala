package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.4 A5 + §2.6 O2/O3 — the reference's id-assignment and
  * per-track ordering logic as window functions.
  *
  * Scale notes: A5/O2 windows are partitioned (or over a dimension-sized
  * distinct set), so they parallelize; O3's global row_number is a single-
  * partition stage by construction — acceptable because the reference
  * semantics (sequential ids over one export, create_coco_from_feather.py
  * :75-85) are inherently total-order, and the input to it is an
  * export-sized frame, not the fact table.
  */
object WindowQueries extends QueryPack {

  val defs: Map[String, QueryFn] = Map(
    // A5: sorted-distinct → dense ids from 1 ("background is 0" —
    // create_coco_from_feather.py:59-70, lexicographic per np.sort).
    "a5_dense_ids" -> ((s, d) =>
      t(s, d, "part")
        .select("p_brand").distinct()
        .withColumn("cat_id", row_number().over(Window.orderBy("p_brand")))
        .orderBy("p_brand")),

    // O2: last shape per track — sort by frame within key, take max
    // (CvatApi.py:143 sorted(...)[-1]). Expressed as a ranking window so
    // the whole row survives, not just the max frame.
    "o2_last_per_key" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")),

    // Rollup with grouping ids (beyond the reference's surface; standard
    // engine capability). Grouping-null rows sort first explicitly —
    // Spark defaults NULLS FIRST, DuckDB NULLS LAST.
    "a7_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    // Pivot expressed portably as conditional aggregation.
    "a8_pivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_linestatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("l_linestatus") === "O", 1).otherwise(0)).as("n_o"))
        .orderBy("l_returnflag")),

    // Approximate distinct (HLL) — implementation-specific value, so the
    // gate is rows-only; ApproxSpec bounds the error vs exact.
    "a9_approx_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
             countDistinct(col("l_orderkey")).as("exact_orders"))
        .orderBy("l_returnflag")),

    // O3: sequential id assignment over an export (create_coco_from_feather
    // .py:75-85) — global row_number keyed by the natural sort key.
    "o3_seq_ids" -> ((s, d) =>
      t(s, d, "customer")
        .select("c_custkey", "c_name")
        .withColumn("image_id", row_number().over(Window.orderBy("c_custkey")))
        .orderBy("c_custkey"))
  )

  val oracle: Map[String, String] = Map(
    "a5_dense_ids" ->
      """SELECT p_brand, CAST(row_number() OVER (ORDER BY p_brand) AS INT) AS cat_id
         FROM (SELECT DISTINCT p_brand FROM part) ORDER BY p_brand""",
    "o2_last_per_key" ->
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "o3_seq_ids" ->
      """SELECT c_custkey, c_name, CAST(row_number() OVER (ORDER BY c_custkey) AS INT) AS image_id
         FROM customer ORDER BY c_custkey""",
    "a7_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "a8_pivot" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
