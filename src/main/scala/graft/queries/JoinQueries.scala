package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — every join shape the reference hand-rolls as dict/loop
  * joins, expressed as real Spark joins so Catalyst/AQE pick the physical
  * strategy. Dimension sides (orders-filtered key sets, part, supplier)
  * are explicitly broadcast where they are guaranteed small; the big
  * fact-fact shapes are left to sort-merge + AQE.
  */
object JoinQueries extends QueryPack {

  val defs: Map[String, QueryFn] = Map(
    // J1: inner equi-join fact ⋈ dim on one key (ref loop :265-276).
    "j1_inner_join" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus")
        .orderBy("l_orderkey", "l_linenumber")),

    // J2: left-semi (get_annotations_by_project, ref :289-294). The
    // filtered-orders side is fact-sized at scale, so no broadcast hint —
    // AQE picks broadcast when the runtime size fits, sort-merge otherwise.
    "j2_semi_join" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
                .select(col("o_orderkey").as("l_orderkey")),
              Seq("l_orderkey"), "left_semi")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")),

    // J3-adjacent: anti join (split leftover semantics, ref :260).
    // customer is a true dimension here, so the broadcast hint is safe.
    "j3_anti_join" -> ((s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
                          .select(col("c_custkey").as("o_custkey"))),
              Seq("o_custkey"), "left_anti")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")),

    // J4/J5: dimension lookup chain (category/image id maps) — two
    // broadcast hash joins in one plan.
    "j5_dim_lookup_chain" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"), col("s_name"))
        .orderBy("l_orderkey", "l_linenumber")),

    // J6/A4: group-join — annotations collected per image (YOLO shape,
    // create_yolo_from_feather.py:29-55). The collected list is rendered
    // as a sorted comma-joined string so the oracle hash is list-order-
    // independent.
    "j6_group_collect" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("linenumbers"),
             count(lit(1)).as("n"))
        .orderBy("o_orderkey")),

    // J7: probe image-bytes by name — inner join distinct keys ⋈ store.
    "j7_key_probe_join" -> ((s, d) =>
      t(s, d, "lineitem").select("l_partkey").distinct()
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "p_name")
        .orderBy("l_partkey"))
  )

  val oracle: Map[String, String] = Map(
    "j1_inner_join" ->
      "SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus FROM lineitem JOIN orders ON l_orderkey = o_orderkey ORDER BY l_orderkey, l_linenumber",
    "j2_semi_join" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') ORDER BY l_orderkey, l_linenumber",
    "j3_anti_join" ->
      "SELECT o_orderkey, o_custkey FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey) ORDER BY o_orderkey",
    "j5_dim_lookup_chain" ->
      "SELECT l_orderkey, l_linenumber, p_brand, s_name FROM lineitem JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey ORDER BY l_orderkey, l_linenumber",
    "j6_group_collect" ->
      """SELECT o_orderkey,
         array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
         count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "j7_key_probe_join" ->
      "SELECT l_partkey, p_name FROM (SELECT DISTINCT l_partkey FROM lineitem) l JOIN part ON l_partkey = p_partkey ORDER BY l_partkey"
  )
}
