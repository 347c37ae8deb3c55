package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.4 A5 + §2.6 O2/O3 — the reference's id-assignment and
  * per-track ordering logic as window functions.
  *
  * Scale notes: O2's window is partitioned, so it parallelizes. A5 and O3
  * are inherently total-order (sequential ids over one export,
  * create_coco_from_feather.py:75-85) but are assigned via the two-pass
  * partition-offset scheme in operators.SeqIds — identical ids to a
  * global row_number with no single-partition window stage.
  */
object WindowQueries extends QueryPack {

  val defs: Map[String, QueryFn] = Map(
    // A5: sorted-distinct → dense ids from 1 ("background is 0" —
    // create_coco_from_feather.py:59-70, lexicographic per np.sort).
    "a5_dense_ids" -> ((s, d) =>
      graft.operators.SeqIds.withSeqId(
          t(s, d, "part").select("p_brand").distinct(),
          Seq(col("p_brand")), "cat_id", startAt = 1L)
        .withColumn("cat_id", col("cat_id").cast("int"))
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

    // A12: arbitrary GROUPING SETS (disjoint sets — not expressible as
    // rollup/cube prefixes). One Expand + one aggregate exchange; the
    // Expand multiplies rows by the set count BEFORE the map-side
    // partial agg, so shuffle volume stays (groups × sets)-bounded.
    "a12_grouping_sets" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first, col("gid"))),

    // O5: the ranking/navigation window surface — rank (gap ties),
    // dense_rank, ntile, lag. rank/dense_rank order by the TIED
    // quantity column (tie semantics are the point); lag/ntile need a
    // TOTAL order, so their spec extends it with the key columns — and
    // the input is first deduplicated on the projected columns because
    // the testdata carries fully duplicated lineitem rows, under which
    // no column ordering is total and lag's default lands on an
    // engine-dependent twin.
    "o5_window_funcs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tied = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"))
      val total = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
        .distinct()
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          rank().over(tied).as("rnk"),
          dense_rank().over(tied).as("drnk"),
          ntile(4).over(total).as("quartile"),
          lag(col("l_quantity"), 1, -1.0).over(total).as("prev_qty"))
        .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    }),

    // O4: global top-k — must plan as TakeOrderedAndProject (per-
    // partition heaps + driver merge of k rows), NEVER a global sort:
    // at 100 TB a full ordered exchange for 20 rows is the classic
    // accidental-bottleneck. PipelineOpsSpec pins the plan shape.
    "o4_global_topk" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),

    // O6: TOP-K PER GROUP — the curation step every training recipe
    // runs (top docs per source by quality, top events per user by
    // recency). The rn<=k filter compiles to WindowGroupLimit: each
    // map task keeps only its local top-k per group BEFORE the
    // shuffle, so per-task state is O(groups x k) and no group is ever
    // buffered whole — the same plan law a11's sketch pins, asserted
    // for this gate in PlanSpec. Deterministic under price ties via
    // the composite (price DESC, key ASC) order.
    "o6_group_topk" -> ((s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_orderpriority")
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rank") <= 3)
        .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
          col("o_totalprice").cast("double").as("price"))
        .orderBy("o_orderpriority", "rank")),

    // A13: mean/variance from EXACT decimal sums — the distributed-safe
    // way to hash-check second moments across engines. Naive double
    // accumulation is partition-order-dependent and Welford's online
    // form differs between engines, so neither can be hash-gated;
    // sum(x) and sum(x²) in DECIMAL are exact and order-independent
    // (one map-side-combined groupBy), and the closed-form
    // mean/variance then applies IDENTICAL scalar IEEE double ops in
    // both engines. l_quantity is integral-valued, so the decimal
    // squares are exact at scale 4.
    "a13_exact_moments" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(20,2)")).as("sq"),
          sum((col("l_quantity") * col("l_quantity")).cast("decimal(28,4)")).as("sqq"))
        .select(col("l_returnflag"), col("n"),
          (col("sq").cast("double") / col("n").cast("double")).as("mean_qty"),
          ((col("sqq").cast("double")
            - col("sq").cast("double") * col("sq").cast("double") / col("n").cast("double"))
            / (col("n").cast("double") - 1.0)).as("var_qty"))
        .orderBy("l_returnflag")),

    // A14: one-pass column profiling (operators.Profile) — per column,
    // row/null/distinct counts and string-rendered min/max, computed as
    // ONE aggregate over ONE scan (the multi-distinct compiles to a
    // single-pass Expand) and unpivoted from the 1-row result. The
    // oracle spells the same profile as a UNION ALL of per-column
    // aggregates; `exact=false` is the documented 100 TB path (HLL NDV,
    // no Expand) and is spec-covered rather than hash-gated because
    // sketch values are engine-specific.
    "a14_profile" -> ((s, d) =>
      graft.operators.Profile.profile(
        t(s, d, "lineitem"),
        Seq("l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"))),

    // Approximate distinct (HLL). The sketch VALUE is engine-specific,
    // so it cannot appear in the hashed output — but its accuracy
    // CONTRACT can: the gate emits the exact count plus a boolean
    // `within_tol` asserting |approx − exact| / exact ≤ 5%, which
    // DuckDB predicts as constant TRUE. The sketch runs at rsd = 0.01
    // (measured realized error ≤ 0.9% on every SF's lineitem, so the
    // 5% band has ~6× margin and can only flip if the sketch or its
    // partition merge actually breaks — the default rsd = 0.05
    // realizes up to 8.6% here and would flake). A regression
    // hash-fails; ExtOpsSpec additionally bounds the error in-process.
    // The sketch and the exact count are DELIBERATELY separate
    // aggregations joined on the 3-row group key: a mixed
    // distinct + non-distinct agg plans through Expand, which drags
    // the ~12 KB p=14 HLL buffer across 2× the input rows (measured
    // 34 s vs 2 s at sf0.1 — the buffer, not the sketch math, is the
    // cost).
    "a9_approx_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val approx = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      exact.join(broadcast(approx), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders")).cast("double")
            / col("exact_orders") <= 0.05).as("within_tol"))
        .orderBy("l_returnflag")
    }),

    // Portable KMV (k-minimum-values) distinct sketch — the
    // deterministic counterpart to a9's HLL: hashes are md5-derived, so
    // BOTH engines compute the identical estimate and the gate is a
    // full hash check (a sketch whose VALUE is hash-checkable
    // cross-engine, not just error-bounded). Estimate = (k-1)/u_k with
    // u_k the k-th smallest normalized hash per group; groups with
    // fewer than k distinct keys report their exact count. Scale shape:
    // the rn<=k filter compiles to WindowGroupLimit (partial per-map
    // top-k BEFORE the shuffle), so per-group state is O(k) everywhere
    // — never a whole group in one task's memory.
    "a11_kmv_distinct" -> ((s, d) => {
      val k = 64
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey")).distinct()
        .withColumn("u",
          conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
            .cast("double") / lit(math.pow(16.0, 15)))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_returnflag").orderBy(col("u"), col("l_orderkey"))))
        .filter(col("rn") <= k)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_mins"), max(col("u")).as("uk"))
        .select(col("l_returnflag"),
          when(col("n_mins") < k, col("n_mins").cast("double"))
            .otherwise(lit((k - 1).toDouble) / col("uk")).as("kmv_estimate"),
          col("n_mins"))
        .orderBy("l_returnflag")
    }),

    // A10: exact interpolated percentiles per group (Spark `percentile`
    // and DuckDB `quantile_cont` share the linear-interpolation
    // definition, so the oracle matches). Exact percentile is a
    // sort-based aggregation — at 100 TB the scale path is
    // approx_percentile (t-digest, partial-merge; a9 demonstrates the
    // approx-sketch pattern); the exact form stays for export-sized
    // frames and oracle checking.
    // A16: equi-width HISTOGRAM per group — the distribution view the
    // a14 profiler's min/max cannot give (spotting bimodal quality
    // scores, truncated lengths, outlier spikes). One map-side-combined
    // groupBy on (group, bin); bin = floor(price / 50000) in double is
    // exact cross-engine (the division result is the same IEEE double,
    // floor is exact). At 100 TB this is the cheapest shape a
    // distribution question has: no sort, no percentile state, partial
    // aggregation all the way down.
    "a16_histogram" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("bin",
          floor(col("o_totalprice").cast("double") / 50000).cast("long"))
        .groupBy("o_orderpriority", "bin")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority", "bin")),

    "a10_percentiles" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
             expr("percentile(l_quantity, 0.5)").as("p50"),
             expr("percentile(l_quantity, 0.75)").as("p75"))
        .orderBy("l_returnflag")),

    // O3: sequential id assignment over an export (create_coco_from_feather
    // .py:75-85) — two-pass partition-offset assignment (operators.SeqIds),
    // not a single-partition global window.
    "o3_seq_ids" -> ((s, d) =>
      graft.operators.SeqIds.withSeqId(
          t(s, d, "customer").select("c_custkey", "c_name"),
          Seq(col("c_custkey")), "image_id", startAt = 1L)
        .withColumn("image_id", col("image_id").cast("int"))
        .orderBy("c_custkey"))
  )

  val oracle: Map[String, String] = Map(
    // The HLL value itself is engine-specific; what IS cross-engine
    // checkable is the exact count and the error-band contract, which
    // the oracle predicts as constant TRUE (see the query's comment).
    "a9_approx_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS exact_orders,
         TRUE AS within_tol
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
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
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a12_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, gid""",
    "o4_global_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 20""",
    "o6_group_topk" ->
      """SELECT o_orderpriority, rank, o_orderkey, price FROM (
           SELECT o_orderpriority, o_orderkey,
                  CAST(o_totalprice AS DOUBLE) AS price,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders)
         WHERE rank <= 3 ORDER BY o_orderpriority, rank""",
    "o5_window_funcs" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
         CAST(rank() OVER w1 AS INT) AS rnk,
         CAST(dense_rank() OVER w1 AS INT) AS drnk,
         CAST(ntile(4) OVER w2 AS INT) AS quartile,
         lag(l_quantity, 1, -1.0) OVER w2 AS prev_qty
         FROM (SELECT DISTINCT l_returnflag, l_orderkey, l_linenumber, l_quantity
               FROM lineitem WHERE l_orderkey % 50 = 0)
         WINDOW
           w1 AS (PARTITION BY l_returnflag ORDER BY l_quantity),
           w2 AS (PARTITION BY l_returnflag
                  ORDER BY l_quantity, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""",
    "a13_exact_moments" ->
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
           sum(CAST(l_quantity AS DECIMAL(20,2))) AS sq,
           sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS sqq
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
           (CAST(sqq AS DOUBLE)
             - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0) AS var_qty
         FROM s ORDER BY l_returnflag""",
    // the same profile spelled per column; min/max rendered as VARCHAR
    // exactly as the Spark side's post-aggregate string cast
    "a14_profile" ->
      """SELECT * FROM (
           SELECT 'l_orderkey' AS col_name, count(*) AS n,
                  count(*) - count(l_orderkey) AS n_null,
                  count(DISTINCT l_orderkey) AS n_distinct,
                  CAST(min(l_orderkey) AS VARCHAR) AS min_s,
                  CAST(max(l_orderkey) AS VARCHAR) AS max_s FROM lineitem
           UNION ALL
           SELECT 'l_suppkey', count(*), count(*) - count(l_suppkey),
                  count(DISTINCT l_suppkey),
                  CAST(min(l_suppkey) AS VARCHAR),
                  CAST(max(l_suppkey) AS VARCHAR) FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
                  count(DISTINCT l_returnflag),
                  min(l_returnflag), max(l_returnflag) FROM lineitem
           UNION ALL
           SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
                  count(DISTINCT l_linestatus),
                  min(l_linestatus), max(l_linestatus) FROM lineitem)
         ORDER BY col_name""",
    "a16_histogram" ->
      """SELECT o_orderpriority,
                CAST(floor(CAST(o_totalprice AS DOUBLE) / 50000) AS BIGINT) AS bin,
                count(*) AS n
         FROM orders GROUP BY 1, 2 ORDER BY o_orderpriority, bin""",
    "a10_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.25) AS p25,
         quantile_cont(l_quantity, 0.5) AS p50,
         quantile_cont(l_quantity, 0.75) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a11_kmv_distinct" ->
      """WITH dist AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem),
         h AS (
           SELECT l_returnflag, l_orderkey,
                  CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                    / POWER(16, 15) AS u
           FROM dist),
         scored AS (
           SELECT l_returnflag, u,
                  row_number() OVER (PARTITION BY l_returnflag ORDER BY u, l_orderkey) AS rn
           FROM h)
         SELECT l_returnflag,
                CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                     ELSE 63.0 / max(u) END AS kmv_estimate,
                count(*) AS n_mins
         FROM scored WHERE rn <= 64 GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
