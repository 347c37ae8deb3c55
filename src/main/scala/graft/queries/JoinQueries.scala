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
        .orderBy("l_partkey")),

    // J8: AS-OF join — for each click, the user's most recent view at or
    // before it. Spark has no native as-of operator; the SCALE-SAFE
    // composition is union → one shuffle on user → carry-forward window
    // (`last(..., ignoreNulls)` over rows-unbounded-preceding): linear,
    // partitioned by key, ONE exchange — never a per-row inequality join
    // (a BroadcastNestedLoop as-of is quadratic and was rejected). At
    // equal timestamps the view sorts first (kind 0 < 1), matching the
    // <= as-of bound; the oracle is DuckDB's NATIVE ASOF LEFT JOIN, so
    // the composition is hash-checked against a reference
    // implementation of the operator. Data contract: per-user event
    // timestamps are distinct (the events table carries ns-resolution
    // times) — among ties on view ts the Spark side deterministically
    // takes the max view_id while DuckDB's ASOF tie choice is
    // unspecified, so a ts-colliding dataset could diverge.
    "j8_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id").as("click_id"), lit(null).cast("bigint").as("view_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          lit(null).cast("bigint").as("click_id"), col("event_id").as("view_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("kind"), col("view_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      clicks.union(views)
        .withColumn("last_view_id", last(col("view_id"), ignoreNulls = true).over(w))
        .filter(col("click_id").isNotNull)
        .select(col("user_id"), col("click_id"), col("last_view_id"))
        .orderBy("user_id", "click_id")
    }),

    // J15: CO-BUCKETED SHUFFLE-FREE join — two BucketedUpsert tables
    // sharing (key hash, bucket count) presented as NATIVE Spark
    // bucketed relations (HashPartitioning(key, n) reported by the
    // scan, one RDD partition per bucket), so the sort-merge join adds
    // ZERO Exchange on either side. At 100 TB × 2 this removes the
    // entire two-sided fact shuffle — the largest cost of the naive
    // join. The oracle is the plain SQL join, so hash-green proves the
    // exchange-free plan changes nothing but the shuffle bytes
    // (BucketedJoinSpec asserts the zero-Exchange plan itself).
    "j15_bucketed_join" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-bjoin-q").toString
      val l = s"$base/profile"; val r = s"$base/stats"
      // the feature-store shape: a profile table and a per-key feature
      // table maintained independently, co-bucketed on the entity key
      graft.lake.BucketedUpsert.applyBatch(
        t(s, d, "customer").select(col("c_custkey").as("custkey"),
          col("c_name"), col("c_mktsegment"), lit(1L).as("ver")),
        l, "custkey", "ver", nBuckets = 16, tag = 1)
      graft.lake.BucketedUpsert.applyBatch(
        t(s, d, "orders").groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders")).withColumn("ver", lit(1L)),
        r, "custkey", "ver", nBuckets = 16, tag = 1)
      graft.lake.BucketedUpsert.bucketedJoin(s, l, r, "custkey")
        .select("custkey", "c_name", "c_mktsegment", "n_orders")
        .orderBy("custkey")
    }),

    // J16: MISMATCHED-bucket-count join — the graceful degradation of
    // j15: the dim side was bucketed at 8, the fact side at 16, so
    // co-location cannot hold as-stored. bucketedJoin shuffles ONLY
    // the smaller (8-bucket) side into the larger side's murmur3
    // bucketing — one exchange, the 16-bucket side stays zero-shuffle
    // (BucketedJoinSpec pins the one-exchange plan and which side
    // moved). Same oracle as a plain join: the rebucket is invisible
    // in results.
    "j16_rebucket_join" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-rbjoin-q").toString
      val l = s"$base/profile"; val r = s"$base/stats"
      graft.lake.BucketedUpsert.applyBatch(
        t(s, d, "customer").select(col("c_custkey").as("custkey"),
          col("c_name"), col("c_mktsegment"), lit(1L).as("ver")),
        l, "custkey", "ver", nBuckets = 8, tag = 1)
      graft.lake.BucketedUpsert.applyBatch(
        t(s, d, "orders").groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders")).withColumn("ver", lit(1L)),
        r, "custkey", "ver", nBuckets = 16, tag = 1)
      graft.lake.BucketedUpsert.bucketedJoin(s, l, r, "custkey")
        .select("custkey", "c_name", "c_mktsegment", "n_orders")
        .orderBy("custkey")
    }),

    // J9: RANGE join — pairs of events of the same user within 5
    // minutes. The scale-safe Spark shape is interval bucketing: each
    // left row equi-joins on (user, bucket) against right rows
    // replicated into their bucket AND its successor, then the exact
    // range predicate filters residuals — one equi-shuffle instead of
    // the quadratic nested-loop a raw inequality join plans. Bucket
    // width == range width, so each right row lands in exactly 2
    // buckets (bounded amplification at any scale). The oracle is the
    // plain inequality join DuckDB executes natively (IEJoin).
    "j9_range_join" -> ((s, d) => {
      val win = 300000000000L // 5 min in ns
      val ev = t(s, d, "events").select("user_id", "event_id", "ts")
      val left = ev.select(col("user_id"), col("event_id").as("ea"), col("ts").as("ta"))
        .withColumn("bucket", expr(s"ta div $win"))
      // tb > ta bounds tb's bucket to {ta_bucket, ta_bucket + 1}, so the
      // right side lands in its own bucket and the PREVIOUS one; the
      // left side keeps its single bucket → every qualifying pair
      // matches exactly once (the two replicas have distinct buckets).
      val right = ev.select(col("user_id"), col("event_id").as("eb"), col("ts").as("tb"))
        .withColumn("bucket", explode(array(expr(s"tb div $win"), expr(s"tb div $win - 1"))))
      left.join(right, Seq("user_id", "bucket"))
        .filter(col("tb") > col("ta") && col("tb") - col("ta") <= win)
        .select("user_id", "ea", "eb")
        .orderBy("user_id", "ea", "eb")
    }),

    // J13: GENERALIZED interval-point join (operators.RangeJoin) —
    // intervals of VARYING lengths (1..97 s here), which j9's
    // fixed-width bucketing cannot express: each interval replicates
    // into every bucket it overlaps (sequence explode), each point
    // maps to one bucket, and the equi-join + residual filter yields
    // each qualifying pair exactly once. W = 60 s ≈ the median
    // interval, so replication stays ~2x; the maxReplicas guard
    // fail-fasts on pathological spans. Per-interval match counts are
    // the gate surface.
    "j13_interval_general" -> ((s, d) => {
      val ev = t(s, d, "events")
      val intervals = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("iv_id"), col("ts").as("s0"),
          (col("ts") + (col("event_id") % 97 + lit(1L)) * lit(1000000000L)).as("e0"))
      val points = ev.filter(col("event_type") === "view")
        .select(col("ts").as("p0"))
      graft.operators.RangeJoin
        .intervalPointJoin(intervals, points, "s0", "e0", "p0",
          bucketWidth = 60000000000L)
        .groupBy("iv_id").agg(count(lit(1)).as("n_pts"))
        .orderBy("iv_id")
    }),

    // J11: null-safe equi-join (`<=>`) — NULL keys match each other
    // instead of vanishing (the semantics a plain equi-join silently
    // drops). EqualNullSafe is a legal HASH join key in Spark, so this
    // plans as a broadcast/sort-merge equi-join, NOT a nested loop —
    // the null-key groups are just one more hash bucket. Both sides
    // are aggregated first (dimension-sized), and the null keys are
    // minted deterministically via nullif so the match is exercised.
    // J12: skew-salted shuffle join (operators.Salt). The salt spreads
    // each supplier key's lineitem rows across 8 reducers instead of
    // one — the manual fix for a hot key that would straggle a 100 TB
    // shuffle join. The oracle is the PLAIN join + group-by, proving
    // salting is result-transparent; the salt seed is a deterministic
    // hash of the line's unique id so reruns shuffle identically.
    "j12_salted_join" -> ((s, d) => {
      val fact = t(s, d, "lineitem")
        .select("l_suppkey", "l_quantity", "l_orderkey", "l_linenumber")
      val dim = t(s, d, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      graft.operators.Salt
        .saltedJoin(fact, dim, "l_suppkey", 8,
          xxhash64(col("l_orderkey"), col("l_linenumber")))
        .groupBy("l_suppkey", "s_name")
        .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_suppkey")
    }),

    "j11_null_safe_join" -> ((s, d) => {
      val a = t(s, d, "customer")
        .groupBy(expr("nullif(c_nationkey % 5, 0)").as("k"))
        .agg(count(lit(1)).as("n_cust"))
      val b = t(s, d, "supplier")
        .groupBy(expr("nullif(s_nationkey % 5, 0)").as("k"))
        .agg(count(lit(1)).as("n_supp"))
      a.join(b, a("k") <=> b("k"))
        .select(a("k").as("k"), col("n_cust"), col("n_supp"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // J10: bloom-prefiltered semi join — the explicit form of Spark's
    // runtime shuffle-join filter, as a user-facing operator. Build a
    // bloom filter over the dim keys (scalar-subquery side job, the
    // sketch is KBs regardless of corpus size), probe it fact-side
    // BEFORE the shuffle so non-matching rows never enter the exchange,
    // then the exact semi join removes the bloom's false positives.
    // At 100 TB this is the difference between shuffling the whole
    // fact table and shuffling ~the matching slice; the oracle is the
    // plain IN-subquery, proving the prefilter is result-transparent.
    "j10_bloom_semi" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      val dim = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000.0)
        .select("o_orderkey")
      // view name keyed on the data dir: two builders on one session
      // with different dirs can't race each other's scalar subquery
      // into the wrong dim (same dir ⇒ same content ⇒ benign replace)
      val view = "graft_bloom_dim_" + Integer.toHexString(d.hashCode)
      dim.createOrReplaceTempView(view)
      t(s, d, "lineitem")
        .filter(expr(
          s"""graft_might_contain(
               (SELECT graft_bloom_agg(o_orderkey, 100000L, 800000L)
                FROM $view),
               l_orderkey)"""))
        .join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_orderkey")
    }),

    // J14: DYNAMIC PARTITION PRUNING — the canonical 100 TB fact-join
    // optimization: the fact lands hive-partitioned on the join key,
    // the dim filter's surviving keys are only known at RUNTIME (the
    // dim is a real table read, not a foldable literal), and Catalyst
    // injects a dynamicpruning subquery into the fact scan so entire
    // partition directories are never listed or read. PlanSpec pins
    // `dynamicpruning` in the fact scan's partition filters; the
    // oracle is the equivalent flat filter + aggregate, proving the
    // pruning is result-transparent. At 100 TB with a date-partitioned
    // fact this is the difference between scanning 7 days and 7 years.
    "j14_dpp" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-dpp-q").toString
      val orders = t(s, d, "orders")
      orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.partitionBy("o_orderpriority").parquet(s"$base/fact")
      orders.select("o_orderpriority").distinct()
        .withColumn("urgency",
          substring(col("o_orderpriority"), 1, 1).cast("int"))
        .coalesce(1).write.parquet(s"$base/dim")
      val fact = s.read.parquet(s"$base/fact")
      val dim = s.read.parquet(s"$base/dim").filter(col("urgency") <= 2)
      fact.join(broadcast(dim), Seq("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          graft.functions.Portable.moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    })
  )

  val oracle: Map[String, String] = Map(
    "j1_inner_join" ->
      "SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus FROM lineitem JOIN orders ON l_orderkey = o_orderkey ORDER BY l_orderkey, l_linenumber",
    "j2_semi_join" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') ORDER BY l_orderkey, l_linenumber",
    "j3_anti_join" ->
      "SELECT o_orderkey, o_custkey FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey) ORDER BY o_orderkey",
    "j15_bucketed_join" ->
      """SELECT c_custkey AS custkey, c_name, c_mktsegment, n_orders
         FROM customer JOIN (SELECT o_custkey, count(*) AS n_orders
                             FROM orders GROUP BY o_custkey) o
           ON c_custkey = o.o_custkey
         ORDER BY custkey""",
    // the rebucket is invisible in results — same plain-join oracle
    "j16_rebucket_join" ->
      """SELECT c_custkey AS custkey, c_name, c_mktsegment, n_orders
         FROM customer JOIN (SELECT o_custkey, count(*) AS n_orders
                             FROM orders GROUP BY o_custkey) o
           ON c_custkey = o.o_custkey
         ORDER BY custkey""",
    "j5_dim_lookup_chain" ->
      "SELECT l_orderkey, l_linenumber, p_brand, s_name FROM lineitem JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey ORDER BY l_orderkey, l_linenumber",
    "j6_group_collect" ->
      """SELECT o_orderkey,
         array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
         count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "j7_key_probe_join" ->
      "SELECT l_partkey, p_name FROM (SELECT DISTINCT l_partkey FROM lineitem) l JOIN part ON l_partkey = p_partkey ORDER BY l_partkey",
    // the oracle uses DuckDB's NATIVE ASOF JOIN as the reference
    // implementation of the operator the Spark side composes
    "j8_asof_join" ->
      """WITH clicks AS (SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click'),
         views AS (SELECT user_id, event_id AS view_id, ts FROM events WHERE event_type = 'view')
         SELECT c.user_id, c.click_id, v.view_id AS last_view_id
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND v.ts <= c.ts
         ORDER BY c.user_id, c.click_id""",
    "j9_range_join" ->
      """SELECT a.user_id, a.event_id AS ea, b.event_id AS eb
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND epoch_ns(b.ts) > epoch_ns(a.ts)
          AND epoch_ns(b.ts) - epoch_ns(a.ts) <= 300000000000
         ORDER BY a.user_id, ea, eb""",
    // the bucketing must be invisible: the oracle is the raw BETWEEN join
    "j13_interval_general" ->
      """WITH iv AS (SELECT event_id AS iv_id, epoch_ns(ts) AS s0,
                            epoch_ns(ts) + (event_id % 97 + 1) * 1000000000 AS e0
                     FROM events WHERE event_type = 'click'),
              pt AS (SELECT epoch_ns(ts) AS p0 FROM events
                     WHERE event_type = 'view')
         SELECT iv_id, count(*) AS n_pts
         FROM iv JOIN pt ON p0 >= s0 AND p0 <= e0
         GROUP BY iv_id ORDER BY iv_id""",
    // The salt must be invisible in the result: the oracle is the plain
    // unsalted join + aggregate.
    "j12_salted_join" ->
      """SELECT l.l_suppkey, s.s_name, count(*) AS n_lines,
                sum(l.l_quantity) AS sum_qty
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY 1, 2 ORDER BY l.l_suppkey""",
    "j11_null_safe_join" ->
      """WITH a AS (SELECT nullif(c_nationkey % 5, 0) AS k, count(*) AS n_cust
                    FROM customer GROUP BY 1),
         b AS (SELECT nullif(s_nationkey % 5, 0) AS k, count(*) AS n_supp
               FROM supplier GROUP BY 1)
         SELECT a.k, n_cust, n_supp
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
         ORDER BY a.k NULLS FIRST""",
    // partition pruning must be invisible in the result: the oracle is
    // the flat filter + aggregate over the unpartitioned source
    "j14_dpp" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
         FROM orders
         WHERE CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // The bloom prefilter must be invisible in the result: the oracle
    // is the plain IN-subquery semi join.
    "j10_bloom_semi" ->
      """SELECT l_orderkey, count(*) AS n_lines, sum(l_quantity) AS sum_qty
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_orderpriority = '1-URGENT'
                                AND o_totalprice > 200000.0)
         GROUP BY l_orderkey ORDER BY l_orderkey"""
  )
}
