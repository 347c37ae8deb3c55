package graft.queries

import graft.Tables.t
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** SURVEY §2.1/2.2/2.4 stock operators instantiated over the driver
  * testdata, each with a DuckDB oracle. Every query carries a
  * deterministic ORDER BY on a unique key so row order can never differ
  * between engines.
  *
  * Scale notes: all shapes here are scan → filter → project → (partial)
  * agg; filters and projections reach the parquet scan (PushedFilters /
  * ReadSchema verified in PlanSpec), aggregations are map-side partial.
  * Nothing materializes on the driver.
  */
object CoreQueries extends QueryPack {

  /** A checked-in test fixture, resolved portably (ADVICE r17): the
    * `GRAFT_TEST_RESOURCES` env var when set, else the checkout's
    * `src/test/resources` relative to the working directory — never a
    * hardcoded absolute path that breaks on other checkouts. */
  private def testResource(name: String): String =
    sys.env.get("GRAFT_TEST_RESOURCES")
      .getOrElse(s"${sys.props("user.dir")}/src/test/resources")
      .stripSuffix("/") + s"/$name"

  val defs: Map[String, QueryFn] = Map(
    // S1: scan + bare projection (column pruning reaches the reader).
    "s1_scan_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    // S1/S3 round-trip as a gate query: partitioned append write to a
    // fresh dir, partition-discovery read back, partition-pruned filter,
    // aggregate — the oracle sees the same rows straight off the source
    // table, so the lake write/read path itself is what's being checked.
    "s3_partition_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-lake-q").toString
      val lake = new graft.lake.Lake(s)
      lake.appendPartitioned(t(s, d, "orders"), dir, Seq("o_orderstatus"))
      lake.readInferred(dir)
        .filter(col("o_orderstatus") === "F") // prunes to one partition dir
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
             Portable.moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // S34: Feather (Arrow IPC) read parity — closes the last
    // oracle-reachable spec-only surface (S4): the SAME logical table
    // exists as the feather fixture (read by the hand-rolled
    // Feather.read) and a pyarrow-minted parquet twin (read by the
    // DuckDB oracle). Hash-green proves the Arrow decode — nulls,
    // list<float>, list<string>, bool, timestamp[us,UTC] — value-exact
    // against an independent reader. Arrays serialize via to_json and
    // the timestamp compares as epoch micros (cross-engine canon).
    "s34_feather_parity" -> ((s, d) => {
      graft.lake.Feather.read(s, testResource("fixture.feather"))
        .select(col("id"), col("name"), col("score"),
          to_json(col("seg")).as("seg_json"),
          to_json(col("tags")).as("tags_json"),
          col("ok"), unix_micros(col("ts")).as("ts_us"))
        .orderBy("id")
    }),

    // S5: partition-manifest shape — distinct key tuples (metadata-scale).
    "s5_partition_manifest" -> ((s, d) =>
      t(s, d, "orders")
        .select("o_orderstatus", "o_orderpriority").distinct()
        .orderBy("o_orderstatus", "o_orderpriority")),

    // P1: projection-with-cast view (ids int32 → int64, ref :25-36).
    "p1_project_cast" -> ((s, d) =>
      t(s, d, "nation")
        .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
                col("n_name"),
                col("n_regionkey").cast("bigint").as("n_regionkey"))
        .orderBy("n_nationkey")),

    // P3: equality predicate pushed to the scan.
    "p3_eq_filter" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_suppkey") === 3)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // P4: IN-list predicate pushed to the scan.
    "p4_in_filter" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")),

    // P5: array-overlap NOT-filter (tag-skip semantics, ref :204-211).
    "p5_array_not_overlap" -> ((s, d) =>
      t(s, d, "documents")
        .filter(!arrays_overlap(split(col("text"), " "),
                                array(lit("vector"), lit("stream"))))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    // P6: array-contains filter ('badimage' semantics, ref :336-344).
    "p6_array_contains" -> ((s, d) =>
      t(s, d, "documents")
        .filter(array_contains(split(col("text"), " "), "spark"))
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // A1: distinct values of one column.
    "a1_distinct" -> ((s, d) =>
      t(s, d, "customer")
        .select("c_mktsegment").distinct().orderBy("c_mktsegment")),

    // A2: multi-column dedup (partition-manifest dedup, ref :233,517).
    "a2_dedup_multicol" -> ((s, d) =>
      t(s, d, "lineitem")
        .dropDuplicates("l_returnflag", "l_linestatus")
        .select("l_returnflag", "l_linestatus")
        .orderBy("l_returnflag", "l_linestatus")),

    // A3: grouped counts.
    "a3_count_group" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type").count()
        .orderBy("event_type")),

    // Flagship agg (TPC-H Q1 shape): exact DECIMAL money sums → DOUBLE.
    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Portable.moneySum(col("l_quantity")).as("sum_qty"),
          Portable.moneySum(col("l_extendedprice")).as("sum_base_price"),
          Portable.revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (Portable.moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // F-J1: JSON attribute extraction (gt_attr semantics, CvatApi.py:388-406).
    "f_j1_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .orderBy("event_id")),

    // U3: intersect (absent from the reference — completes the set-op
    // family; SQL INTERSECT is distinct-based in both engines).
    "u3_intersect" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "R").select("l_orderkey")
        .intersect(
          t(s, d, "lineitem").filter(col("l_linestatus") === "F").select("l_orderkey"))
        .orderBy("l_orderkey")),

    // F-D1: the date scalar surface (§2.8) — part extraction, month
    // truncation, day arithmetic, day difference — on a casted DATE so
    // both engines agree on types (Spark date_trunc returns timestamp,
    // DuckDB returns date; trunc-on-date sidesteps it). Dates emit as
    // strings for the hash. Pure scan-side map.
    "f_d1_date_parts" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("od", col("o_orderdate").cast("date"))
        .select(col("o_orderkey"),
          year(col("od")).as("y"),
          month(col("od")).as("m"),
          dayofmonth(col("od")).as("dom"),
          quarter(col("od")).as("q"),
          trunc(col("od"), "month").cast("string").as("month_start"),
          date_add(col("od"), 30).cast("string").as("due_date"),
          datediff(col("od"), to_date(lit("1995-01-01"))).as("days_since_95"))
        .orderBy("o_orderkey")),

    // U4: EXCEPT ALL — multiplicity-preserving set difference (U2/j3 is
    // the key-level anti join; this keeps duplicate counts, which Spark
    // plans as a count-diff aggregate + generate, one shuffle each side).
    "u4_except_all" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "R").select("l_orderkey")
        .exceptAll(
          t(s, d, "lineitem").filter(col("l_linestatus") === "F").select("l_orderkey"))
        .orderBy("l_orderkey")),

    // S14: z-order (Morton) clustering key — the kernel behind
    // lake.ZOrder.writeZOrdered (multi-dimensional file skipping;
    // ZOrderSpec measures the written-tree skip rates). The gate
    // hash-checks the native bit-interleave expression against a
    // DuckDB bit-arithmetic reconstruction.
    "s14_zorder_key" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 3600000000000").as("bucket"))
        .withColumn("z", expr("graft_zorder2(user_id, bucket)"))
        .orderBy("event_id")
    }),

    // S15: keyed merge (upsert) — lake.Merge.upsert folds a change batch
    // into the customer base: matched keys take the update row (segment
    // rewritten, balance bumped), new keys insert, untouched keys carry
    // over. The oracle is the FULL OUTER JOIN + CASE expansion of the
    // same MERGE, so the operator's routing is hash-checked end to end.
    "s15_merge_upsert" -> ((s, d) => {
      val base = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("c_acctbal").cast("double").as("c_acctbal"))
      val updates = t(s, d, "customer").filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"),
          lit("UPDATED").as("c_mktsegment"),
          (col("c_acctbal").cast("double") + 100.0).as("c_acctbal"))
        .unionAll(t(s, d, "customer").filter(col("c_custkey") % 17 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            concat(lit("NEW#"), col("c_custkey").cast("string")).as("c_name"),
            lit("INSERTED").as("c_mktsegment"), lit(0.0).as("c_acctbal")))
      graft.lake.Merge.upsert(base, updates, "c_custkey")
        .orderBy("c_custkey")
    }),

    // S16: small-file compaction — fragment orders into 64 shards, then
    // lake.Compaction rewrites them at a 1 MB target (shuffle-free
    // coalesce). The gate hash-checks CONTENT preservation against the
    // original table (layout is environment-shaped; CompactionSpec pins
    // the file-count law ceil(bytes/target) and the even-mode variant).
    "s16_compaction" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-compact-q").toString
      val frag = s"$base/frag"
      val out = s"$base/compact"
      t(s, d, "orders").repartition(64).write.parquet(frag)
      graft.lake.Compaction.compact(s, frag, out, targetBytes = 1L << 20)
      s.read.parquet(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
             Portable.moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // S17: zone-map file skipping — z-order events by (user_id, hour),
    // build the per-file min/max manifest with ONE distributed scan,
    // then answer a user_id range query reading ONLY intersecting files
    // (FileStatsSpec asserts most files are skipped; the predicate is
    // re-applied, so pruning can never change results — which is
    // exactly what this gate hash-checks against the unpruned oracle).
    "s17_stats_prune" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-stats-q").toString
      val ev = t(s, d, "events")
        .withColumn("bucket", expr("ts div 3600000000000"))
      graft.lake.ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
      graft.lake.FileStats.writeStats(s, s"$base/data", s"$base/stats", Seq("user_id"))
      graft.lake.FileStats.prunedRead(s, s"$base/data", s"$base/stats",
          "user_id", lit(100L), lit(120L))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    }),

    // S21: CONJUNCTIVE zone-map pruning — the query shape the 2D
    // z-order layout exists for: a (user range × time range) predicate
    // prunes on BOTH curve dimensions, multiplying the per-dimension
    // skip rates (FileStatsSpec pins that the 2D survivor set is a
    // strict subset of either 1D prune). The exact predicate is
    // re-applied after the skip, which is what the unpruned oracle
    // hash-checks.
    "s21_prune_2d" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-2d-q").toString
      val ev = t(s, d, "events")
        .withColumn("bucket", expr("ts div 3600000000000"))
      graft.lake.ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
      graft.lake.FileStats.writeStats(s, s"$base/data", s"$base/stats",
        Seq("user_id", "bucket"))
      graft.lake.FileStats.prunedReadAnd(s, s"$base/data", s"$base/stats",
          Seq(("user_id", lit(100L), lit(120L)),
              ("bucket", lit(473400L), lit(473580L))))
        .select("event_id", "user_id", "bucket")
        .orderBy("event_id")
    }),

    // A15: METADATA-ONLY aggregate — count/min/max answered purely
    // from the zone-map stats manifest, zero data files opened (the
    // planner/monitor question every table gets asked first). Exact
    // because per-file stats are exact; the oracle computes the same
    // aggregates from the raw table, so hash-green proves the manifest
    // path loses nothing. At 100 TB this turns a full-table scan into
    // one metadata read.
    "a15_stats_agg" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-statsagg-q").toString
      val ev = t(s, d, "events")
        .select("event_id", "user_id", "value")
      ev.repartition(16).write.parquet(s"$base/data")
      graft.lake.FileStats.writeStats(s, s"$base/data", s"$base/stats",
        Seq("event_id", "user_id"))
      graft.lake.FileStats.aggFromStats(s, s"$base/stats",
        Seq("event_id", "user_id"))
    }),

    // S28: CONSTRAINT-VALIDATED ingestion — the data-quality gate
    // every production feed runs: rows failing the CHECK (strictly —
    // NULL quarantines, deliberately harsher than SQL CHECK) divert to
    // an auditable quarantine table instead of landing or aborting the
    // batch. The gate ingests the customer feed under bal >= 0 (122
    // real violators at sf0.01) and reads back the table; the oracle
    // filters the source by the same predicate, so hash-green proves
    // the split is exact. Quarantine content/audit is spec-pinned.
    "s28_constraints" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-chk-q").toString
      val root = s"$base/t"; val q = s"$base/q"
      val batch = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("double").as("bal"), lit(1L).as("ver"))
      graft.lake.Constraints.applyBatchValidated(batch, root, q,
        "c_custkey", "ver", nBuckets = 16, tag = 1,
        constraint = col("bal") >= 0)
      graft.lake.BucketedUpsert.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(12,2)")).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // S18: incremental materialized aggregate — a bucketed-upsert table
    // takes a base batch then an update batch (s15's update/insert mix),
    // and the MV is REFRESHED INCREMENTALLY between them from the
    // bucket change feed: batch-2 refresh recomputes only the touched
    // buckets' partials (IncrAggSpec pins the only-touched count) and
    // the read is the final combine. The oracle aggregates the MERGE
    // expansion of the same two batches, so the maintained MV is
    // hash-checked against the from-scratch aggregate.
    "s18_incr_agg" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-mv-q").toString
      val root = s"$base/table"; val mv = s"$base/mv"
      val cust = t(s, d, "customer")
      val batch1 = cust
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("double").as("c_acctbal"), lit(1L).as("ver"))
      val batch2 = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), lit("UPDATED").as("c_mktsegment"),
          (col("c_acctbal").cast("double") + 100.0).as("c_acctbal"), lit(2L).as("ver"))
        .unionAll(cust.filter(col("c_custkey") % 17 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            lit("INSERTED").as("c_mktsegment"),
            lit(0.0).as("c_acctbal"), lit(2L).as("ver")))
      graft.lake.BucketedUpsert.applyBatch(batch1, root, "c_custkey", "ver",
        nBuckets = 16, tag = 1)
      graft.lake.IncrAgg.refresh(s, root, mv, "c_custkey",
        Seq("c_mktsegment"), Seq("c_acctbal"))
      graft.lake.BucketedUpsert.applyBatch(batch2, root, "c_custkey", "ver",
        nBuckets = 16, tag = 2)
      graft.lake.IncrAgg.refresh(s, root, mv, "c_custkey",
        Seq("c_mktsegment"), Seq("c_acctbal"))
      graft.lake.IncrAgg.read(s, mv, Seq("c_mktsegment"), Seq("c_acctbal"))
        .withColumnRenamed("sum_c_acctbal", "sum_bal")
        .orderBy("c_mktsegment")
    }),

    // S23: incrementally-maintained DISTINCT COUNT — the aggregate
    // per-bucket scalars CANNOT maintain (distinct does not sum), made
    // bucket-granular via mergeable KMV sketch partials (IncrNdv
    // scaladoc). Same two-batch lifecycle as s18; the second refresh
    // recomputes only touched buckets' sketch rows, and the read is
    // the dedup-then-global-top-k merge. The oracle computes the SAME
    // deterministic md5-KMV over the merge expansion from scratch, so
    // hash-green means sketch maintenance is indistinguishable from a
    // full rescan — the property that lets a 100 TB table answer NDV
    // after each daily batch at O(touched buckets) cost.
    "s23_incr_ndv" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-ndv-q").toString
      val root = s"$base/table"; val mv = s"$base/mv"
      val cust = t(s, d, "customer")
      val nv = (col("c_custkey") % 1000).as("nv")
      val batch1 = cust
        .select(col("c_custkey"), col("c_mktsegment"), nv, lit(1L).as("ver"))
      val batch2 = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), lit("UPDATED").as("c_mktsegment"),
          nv, lit(2L).as("ver"))
        .unionAll(cust.filter(col("c_custkey") % 17 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            lit("INSERTED").as("c_mktsegment"), nv, lit(2L).as("ver")))
      graft.lake.BucketedUpsert.applyBatch(batch1, root, "c_custkey", "ver",
        nBuckets = 16, tag = 1)
      graft.lake.IncrNdv.refresh(s, root, mv, "c_custkey",
        Seq("c_mktsegment"), "nv", k = 64)
      graft.lake.BucketedUpsert.applyBatch(batch2, root, "c_custkey", "ver",
        nBuckets = 16, tag = 2)
      graft.lake.IncrNdv.refresh(s, root, mv, "c_custkey",
        Seq("c_mktsegment"), "nv", k = 64)
      graft.lake.IncrNdv.readNdv(s, mv, Seq("c_mktsegment"), k = 64)
        .orderBy("c_mktsegment")
    }),

    // S24: SCHEMA EVOLUTION on the bucketed-upsert table — a later
    // batch ADDS a column and the table absorbs it without rewriting
    // history: touched buckets resolve via unionByName (legacy rows
    // take NULL in the new column), untouched buckets keep their
    // old-schema files verbatim, and the read path merge-schemas
    // across generations. Rows the evolved batch never touched surface
    // the new column as NULL — the gate groups on exactly that
    // NULL-vs-value split, so hash-green proves both the evolved and
    // the legacy generation read back correctly. The upsert contract
    // stays WHOLE-ROW (a batch omitting an old column nulls it, not
    // patches it — BucketedUpsertSpec pins that too).
    "s24_schema_evolve" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-evolve-q").toString + "/t"
      val cust = t(s, d, "customer")
      val batch1 = cust.select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double").as("c_acctbal"), lit(1L).as("ver"))
      val batch2 = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal").cast("double").as("c_acctbal"),
          when(col("c_acctbal").cast("double") > 5000, lit("gold"))
            .otherwise(lit("std")).as("tier"),
          lit(2L).as("ver"))
      graft.lake.BucketedUpsert.applyBatch(batch1, root, "c_custkey", "ver",
        nBuckets = 16, tag = 1)
      graft.lake.BucketedUpsert.applyBatch(batch2, root, "c_custkey", "ver",
        nBuckets = 16, tag = 2)
      graft.lake.BucketedUpsert.read(s, root)
        .groupBy(coalesce(col("tier"), lit("legacy")).as("tier"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("sum_bal"))
        .orderBy("tier")
    }),

    // S25: SNAPSHOT DIFF — the lineage verb next to s19's time travel:
    // publish two states, then answer "what changed between them" as
    // data (op ∈ I/D/U + old/new values, unchanged rows absent). One
    // co-partitioned full-outer join; change detection is a null-safe
    // struct compare over the non-key columns. v2 updates the %10
    // slice, deletes %13, inserts %17 — so every op class is exercised
    // and the %130 overlap pins that delete beats update. The oracle
    // classifies the same two states from scratch in SQL.
    "s25_snapshot_diff" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-diff-q").toString + "/t"
      val cust = t(s, d, "customer").select(col("c_custkey"),
        col("c_mktsegment"), col("c_acctbal").cast("double").as("bal"))
      graft.lake.Snapshot.publish(cust, root, 1)
      val upd = col("c_custkey") % 10 === 0
      val v2 = cust.filter(col("c_custkey") % 13 =!= 0)
        .withColumn("bal", when(upd, col("bal") + 100.0).otherwise(col("bal")))
        .withColumn("c_mktsegment",
          when(upd, lit("UPDATED")).otherwise(col("c_mktsegment")))
        .unionByName(cust.filter(col("c_custkey") % 17 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            lit("INSERTED").as("c_mktsegment"), lit(0.0).as("bal")))
      graft.lake.Snapshot.publish(v2, root, 2)
      graft.lake.Diff.diff(s, root, fromTag = 1, toTag = 2, key = "c_custkey")
        .select(col("c_custkey"), col("op"), col("old_bal"), col("new_bal"))
        .orderBy("c_custkey")
    }),

    // S26: Bloom-filter file index — EQUALITY pruning on a
    // high-cardinality UNSORTED column, the lookup zone maps cannot
    // serve (every file's [min,max] on a shuffled id spans the domain,
    // so s17-style range pruning skips nothing). The events table
    // lands shuffled across 16 files, the per-file Bloom manifest is
    // built in one scan, and a 20-id IN probe opens only the files
    // whose filters admit a value (BloomIndexSpec pins the skip rate
    // and the no-false-negative law). Pruning must be invisible to
    // results: the oracle is the plain IN filter on the source table.
    "s26_bloom_prune" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-bloom-q").toString
      val dataDir = s"$base/data"; val bloomDir = s"$base/bloom"
      t(s, d, "events").select("event_id", "user_id", "event_type")
        .repartition(16).write.parquet(dataDir)
      graft.lake.BloomIndex.writeBloom(s, dataDir, bloomDir, "event_id")
      val ids = (1 to 20).map(i => (i * 47L).toString)
      graft.lake.BloomIndex.prunedReadIn(s, dataDir, bloomDir, "event_id", ids)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    }),

    // S27: SECONDARY INDEX on the bucketed table — per-bucket Bloom
    // filters on a NON-key column, incrementally maintained (refresh
    // recomputes only rewritten buckets; a full bucket recompute is
    // exact deletion support, which plain Blooms lack). The lifecycle
    // exercises exactly that: batch 2 RENAMES one customer, and the
    // probe set includes the new name (must be found), the OLD name
    // (must return nothing — the stale filter was rebuilt), and two
    // untouched names. The oracle filters the merge expansion by name,
    // so hash-green proves bucket-pruned lookup ≡ full scan.
    "s27_secondary_index" -> ((s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-six-q").toString
      val root = s"$base/table"; val ix = s"$base/ix"
      val cust = t(s, d, "customer")
      val batch1 = cust.select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("bal"), lit(1L).as("ver"))
      graft.lake.BucketedUpsert.applyBatch(batch1, root, "c_custkey", "ver",
        nBuckets = 16, tag = 1)
      graft.lake.SecondaryIndex.refresh(s, root, ix, "c_custkey", "c_name")
      val batch2 = cust.filter(col("c_custkey").isin(500L, 777L))
        .select(col("c_custkey"),
          when(col("c_custkey") === 500L, lit("RENAMED-500"))
            .otherwise(col("c_name")).as("c_name"),
          when(col("c_custkey") === 777L, col("c_acctbal").cast("double") + 1.0)
            .otherwise(col("c_acctbal").cast("double")).as("bal"),
          lit(2L).as("ver"))
      graft.lake.BucketedUpsert.applyBatch(batch2, root, "c_custkey", "ver",
        nBuckets = 16, tag = 2)
      graft.lake.SecondaryIndex.refresh(s, root, ix, "c_custkey", "c_name")
      graft.lake.SecondaryIndex.lookup(s, root, ix, "c_name",
        Seq("Customer#000000042", "Customer#000000777",
          "RENAMED-500", "Customer#000000500"))
        .select("c_custkey", "c_name", "bal")
        .orderBy("c_custkey")
    }),

    // S19: snapshot time travel — publish the customer base as v1, an
    // updated state as v2, then read the table AS OF tag 1 through the
    // pointer-history resolver. The oracle aggregates the base table
    // directly, so the gate is green only if the as-of read really
    // returns the SUPERSEDED state (reading v2 would shift every
    // balance sum). This is the reproducibility primitive a training
    // pipeline pins a run to.
    "s19_time_travel" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-tt-q").toString + "/t"
      val base = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      graft.lake.Snapshot.publish(base, root, 1)
      graft.lake.Snapshot.publish(
        base.withColumn("c_acctbal", col("c_acctbal") + 100), root, 2)
      graft.lake.Snapshot.readAt(s, root, 1)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
             Portable.moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // S20: stats-pruned row-level delete — the GDPR/takedown shape:
    // delete user_id ∈ [100,120] from the z-ordered tree, rewriting ONLY
    // files whose zone-map range intersects (DeleteWhereSpec pins the
    // minority-touched bound and kept-path identity); untouched files are
    // referenced verbatim by the new version's manifest. The gate reads
    // the post-delete version and hash-checks it against the oracle's
    // full-scan delete — pruning the rewrite set must be invisible to
    // the surviving rows.
    "s20_delete_where" -> ((s, d) => {
      // the z-ordered source tree is the SHARED read-only fixture
      // (deletes publish into this gate's own out-dir, never the tree)
      val src = Fixtures.zEvents(s, d)
      val out = java.nio.file.Files
        .createTempDirectory("graft-del-q").toString
      graft.lake.DeleteWhere.deleteRange(s, s"$src/stats",
        "user_id", lit(100L), lit(120L), s"$out/v2")
      graft.lake.DeleteWhere.read(s, s"$out/v2")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    }),

    // S30: SCHEMA EVOLUTION beyond add-column — metadata-only TYPE
    // WIDENING and sticky DROP on the bucketed table. batch1 lands an
    // INT balance; widenColumn(int→long) publishes one schema row and
    // rewrites nothing (the parquet scan upcasts the old files);
    // batch2 carries beyond-int-range longs through the widened
    // column; dropColumn hides c_mktsegment (the oracle's schema
    // compare pins the drop — a resurrected column breaks the gate).
    // Hash-green proves old-narrow and new-wide files agree with the
    // oracle's single-width view.
    "s30_schema_widen" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-widen-q").toString + "/t"
      val cust = t(s, d, "customer")
      val b1 = cust.select(col("c_custkey"), col("c_mktsegment"),
        floor(col("c_acctbal")).cast("int").as("bal"), lit(1L).as("ver"))
      graft.lake.BucketedUpsert.applyBatch(b1, root, "c_custkey", "ver",
        nBuckets = 16, tag = 1)
      graft.lake.BucketedUpsert.widenColumn(s, root, "bal",
        org.apache.spark.sql.types.LongType, tag = 2)
      val b2 = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          (floor(col("c_acctbal")).cast("long") + 10000000000L).as("bal"),
          lit(2L).as("ver"))
      graft.lake.BucketedUpsert.applyBatch(b2, root, "c_custkey", "ver",
        nBuckets = 16, tag = 3)
      graft.lake.BucketedUpsert.dropColumn(s, root, "c_mktsegment", tag = 4)
      graft.lake.BucketedUpsert.read(s, root)
        .select("c_custkey", "bal", "ver")
        .orderBy("c_custkey")
    }),

    // S32: UNIFIED index-aware scan routing — one readWhere(root,
    // predicate) discovers whichever index manifests exist beside the
    // data (zone maps, Bloom, secondary index) and opens only the
    // files they admit, re-applying the full predicate. The gate
    // builds a z-ordered tree with stats(user_id) + bloom(event_id),
    // runs a MIXED predicate (closed range AND equality — both
    // indexes intersect), and hash-checks against the plain SQL
    // filter: pruning must be invisible in results (RoutingSpec pins
    // the files-opened counts against each manual route).
    "s32_read_where" -> ((s, d) => {
      val root = Fixtures.revents(s, d)
      val pred = col("user_id").between(lit(50L), lit(250L)) &&
        col("event_id") % 3 =!= 1 // routable range + opaque residual
      val eqPred = col("user_id").between(lit(50L), lit(250L)) &&
        col("event_id").isin((1 to 40).map(i => i * 101L): _*)
      graft.lake.Routing.readWhere(s, root, pred)
        .unionByName(graft.lake.Routing.readWhere(s, root, eqPred))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id", "user_id")
    }),

    // S36: ONE-SIDED range routing (VERDICT r17 #1) — the
    // retention-scan shape: `c >= lo` prunes files with max_c < lo,
    // `c <= hi` prunes min_c > hi, through the same zone-map manifest
    // closed ranges use (previously these parsed but routed nothing →
    // full scan). Exercised over BOTH routed shapes: the plain indexed
    // tree (>=, <=, strict > with an eq residual) and a deletion-vector
    // version whose one-sided read overlaps the DV mask (RoutingSpec
    // pins files-opened to the manual one-sided prune on each).
    // Hash-green proves one-sided pruning is invisible in results.
    "s36_range_route" -> ((s, d) => {
      val root = Fixtures.revents(s, d)
      val hi = graft.lake.Routing.readWhere(s, root,
          col("user_id") >= lit(120L))
        .select(lit("hi").as("src"), col("event_id"), col("user_id"),
          col("event_type"))
      val lo = graft.lake.Routing.readWhere(s, root,
          col("user_id") <= lit(25L))
        .select(lit("lo").as("src"), col("event_id"), col("user_id"),
          col("event_type"))
      val st = graft.lake.Routing.readWhere(s, root,
          col("user_id") > lit(140L) && col("event_type") === lit("click"))
        .select(lit("st").as("src"), col("event_id"), col("user_id"),
          col("event_type"))
      val src = Fixtures.zEvents(s, d)
      val out = java.nio.file.Files
        .createTempDirectory("graft-range-dv-q").toString
      graft.lake.DeleteWhere.deleteVectors(s, s"$src/stats",
        "user_id", lit(100L), lit(120L), s"$out/v2")
      val dv = graft.lake.Routing.readWhere(s, s"$out/v2",
          col("user_id") >= lit(110L))
        .select(lit("dv").as("src"), col("event_id"), col("user_id"),
          col("event_type"))
      hi.unionByName(lo).unionByName(st).unionByName(dv)
        .orderBy("src", "event_id")
    }),

    // S37: OR-DISJUNCT routing (VERDICT r17 #2) — `a OR b` routes as
    // the UNION of the per-disjunct file sets when every disjunct is
    // routable (each set over-approximates its disjunct, so the union
    // over-approximates the OR; the full predicate re-applies). One
    // unroutable disjunct → full scan (RoutingSpec pins both the union
    // file set and the poisoned fallback). The gate runs a
    // range-OR-bloom mix and a two-sided one-sided-range OR.
    "s37_or_route" -> ((s, d) => {
      val root = Fixtures.revents(s, d)
      val mixed = graft.lake.Routing.readWhere(s, root,
          col("user_id").between(lit(50L), lit(60L)) ||
            col("event_id").isin(17L, 4217L, 999999L))
        .select(lit("mix").as("src"), col("event_id"), col("user_id"),
          col("event_type"))
      val tails = graft.lake.Routing.readWhere(s, root,
          col("user_id") <= lit(10L) || col("user_id") >= lit(140L))
        .select(lit("tails").as("src"), col("event_id"), col("user_id"),
          col("event_type"))
      mixed.unionByName(tails).orderBy("src", "event_id")
    }),

    // S39: DSv2 ENGINE-GRADE routing (VERDICT r18 #1) — the indexes
    // reach plain spark.sql with no library call anywhere: the tree
    // registers as a `graft`-format view and three SQL shapes (Bloom
    // eq/IN, one-sided range, OR-of-routables) run through Catalyst's
    // own filter pushdown into GraftScanBuilder, which delegates the
    // file decision to Routing.route and feeds the survivors to
    // Spark's vectorized parquet scan. Every pushed filter re-applies
    // post-scan, so hash-green proves the DSv2 path is result-
    // transparent; RoutingSpec pins files-opened == Routing.route for
    // each shape and PushedFilters visibility in the plan.
    "s39_dsv2_route" -> ((s, d) => {
      val root = Fixtures.revents(s, d)
      s.read.format("graft").load(root)
        .createOrReplaceTempView("graft_events_v")
      // the BUCKETED arm reaches SQL too: a key-probe IN over an
      // upsert table routes to its buckets through the same view
      // (fixture-registered — ADVICE r19: building it here charged
      // the bench with construction and leaked a temp dir per run)
      val broot = Fixtures.bucketedOrders(s, d)
      s.read.format("graft").load(broot)
        .createOrReplaceTempView("graft_orders_v")
      s.sql("""
        SELECT * FROM (
          SELECT 'eq' AS src, event_id, user_id, event_type
          FROM graft_events_v WHERE event_id IN (17, 4217, 999999)
          UNION ALL
          SELECT 'os', event_id, user_id, event_type
          FROM graft_events_v WHERE user_id >= 120
          UNION ALL
          SELECT 'or', event_id, user_id, event_type
          FROM graft_events_v WHERE user_id <= 10 OR event_id = 4217
          UNION ALL
          SELECT 'bk', o_orderkey, o_custkey, o_orderstatus
          FROM graft_orders_v WHERE o_orderkey IN (7, 68, 129, 4242, 999999))
        ORDER BY src, event_id""")
    }),

    // S40: METADATA-ONLY aggregates through plain SQL — an unfiltered
    // ungrouped count(*)/min/max over a stats-indexed column pushes
    // into GraftScanBuilder (SupportsPushDownAggregates), which
    // answers it from the zone-map manifest via Routing.aggStats as a
    // one-row LocalScan: ZERO data files opened (GraftSourceSpec pins
    // the LocalTableScan plan and the empty file set; ineligible
    // shapes — filtered, grouped, unindexed column, stale manifest —
    // fall back to the always-correct scan). Hash-green proves the
    // manifest's numbers equal the data's.
    // r20: the pushdown covers ALL THREE shapes (VERDICT r19 #2) —
    // plain tree (zone-map manifest), bucketed table (BucketStats
    // behind tag parity; exact over resolved rows), and delete version
    // (COUNT only: the maintained manifest's n_rows minus the DV mask —
    // min/max stay with the scan, their manifest bounds are
    // conservative once a DV may have masked the extremum).
    "s40_agg_push" -> ((s, d) => {
      val root = Fixtures.revents(s, d)
      s.read.format("graft").load(root)
        .createOrReplaceTempView("graft_events_agg")
      val cat = Fixtures.catalogRoot(s, d)
      val cn = graft.sources.GraftSql.registerCatalog(s, cat)
      s.sql(s"""
        SELECT * FROM (
          SELECT 'plain' AS src, count(*) AS n_rows, min(user_id) AS mn,
                 max(user_id) AS mx FROM graft_events_agg
          UNION ALL
          SELECT 'bucket', count(*), min(o_custkey), max(o_custkey)
          FROM $cn.db.orders_b
          UNION ALL
          SELECT 'dv', count(*), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
          FROM $cn.db.ev_dv)
        ORDER BY src""")
    }),

    // S43: DELETE VERSIONS in SQL (VERDICT r19 #3) — the merge-on-read
    // shape that used to refuse at the DSv2 door. File admission is the
    // library's delete-version route (maintained zone maps +
    // per-version Bloom — GraftSourceSpec pins files-opened equal to
    // readWhere's), and the DV mask applies inside the scan's own
    // per-file readers. Hash-green proves the SQL face equals the
    // oracle's full-scan delete on both an indexed point probe and a
    // range overlapping the masked band.
    "s43_dsv2_dv" -> ((s, d) => {
      val cat = Fixtures.catalogRoot(s, d)
      val cn = graft.sources.GraftSql.registerCatalog(s, cat)
      s.sql(s"""
        SELECT * FROM (
          SELECT 'in' AS src, event_id, user_id, event_type
          FROM $cn.db.ev_dv WHERE event_id IN (17, 4217, 999999)
          UNION ALL
          SELECT 'os', event_id, user_id, event_type
          FROM $cn.db.ev_dv WHERE user_id >= 110)
        ORDER BY src, event_id""")
    }),

    // S44: FRAGMENTED tables in SQL — GraftSql.registerView picks the
    // strongest engine face per shape: this one (per-key version
    // resolution exceeds a scan) registers the library's RESOLVED read,
    // so the SQL user gets correct current rows under one name instead
    // of an error naming a Scala API. Hash-green proves the overlay
    // fragment's rows win resolution exactly where the oracle says.
    "s44_sql_resolved" -> ((s, d) => {
      val cat = Fixtures.catalogRoot(s, d)
      graft.sources.GraftSql.registerView(s, s"$cat/frag_t", "graft_frag_v")
      s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus
               FROM graft_frag_v ORDER BY o_orderkey""")
    }),

    // S41: DSv2 BUCKETED PARTITIONING through the catalog (VERDICT r19
    // #1 + #4) — the scan reports bucket(n, key) KeyGroupedPartitioning
    // (resolved through GraftCatalog's own bucket function), so the
    // key aggregate below plans with ZERO exchange, matching the
    // library read's clustered relation (GraftCatalogSpec pins the
    // no-Exchange plan and the equal-results sanity leg; j15 measured
    // the win at 358 MB → 0 shuffle). Hash-green proves the clustered
    // plan's results equal the oracle's shuffling aggregate.
    "s41_dsv2_cluster" -> ((s, d) => {
      val root = Fixtures.catalogRoot(s, d)
      val cn = graft.sources.GraftSql.registerCatalog(s, root)
      s.sql(s"""SELECT o_orderkey, count(*) AS n, sum(o_custkey) AS sc
               FROM $cn.db.orders_b
               GROUP BY o_orderkey ORDER BY o_orderkey""")
    }),

    // S42: CATALOG TIME TRAVEL — `VERSION AS OF` resolves through the
    // library's Snapshot pointer history (s19's protocol), so the SQL
    // face and the library call can never disagree on what version a
    // tag names. The oracle aggregates the UN-shifted base table: the
    // v2 publish (+100 per row) must be invisible at VERSION AS OF 1.
    "s42_catalog_tt" -> ((s, d) => {
      val root = Fixtures.catalogRoot(s, d)
      val cn = graft.sources.GraftSql.registerCatalog(s, root)
      s.sql(s"""SELECT c_mktsegment, count(*) AS n,
                      CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                        AS sum_bal
               FROM $cn.db.cust_snap VERSION AS OF 1
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // S38: VALUE-COLUMN routing on the deferred-work shapes (VERDICT
    // r17 #4) — the two index families the plain tree already had,
    // extended to where they were missing:
    //  (a) a BUCKETED table routes a range on a bucket-stats-indexed
    //      value column (BucketStats: bucket-granular resolved-row
    //      zone maps behind tag parity; admitted buckets read WHOLE so
    //      fragment resolution stays exact — RoutingSpec pins
    //      files-opened and the resurrection guard);
    //  (b) a DELETE VERSION routes equality through its per-version
    //      Bloom file index, composed with the DV mask (the Bloom
    //      admits files, the mask still hides rows).
    // Hash-green proves both routes are invisible in results.
    "s38_value_route" -> ((s, d) => {
      // the two arms build DISJOINT table trees (separate temp dirs,
      // separate fixtures) — overlap their setup actions (r22, guide
      // §2.6); the returned union is identical to the serial order
      val src = Fixtures.zEvents(s, d)
      import graft.lake.Overlap.ec
      val bFut = scala.concurrent.Future {
        val root = java.nio.file.Files
          .createTempDirectory("graft-vroute-q").toString + "/t"
        val orders = t(s, d, "orders")
        graft.lake.BucketedUpsert.applyBatch(
          orders.select(col("o_orderkey"),
            col("o_totalprice").cast("double").as("price"),
            col("o_orderstatus").as("status"), lit(1L).as("ver")),
          root, "o_orderkey", "ver", nBuckets = 16, tag = 1)
        graft.lake.Routing.indexBucketStats(s, root, "o_orderkey", Seq("price"))
        graft.lake.Routing.readWhere(s, root,
            col("price") <= lit(1200.0))
          .select(lit("b").as("src"), col("o_orderkey").as("k"),
            col("price").cast("string").as("v"))
      }
      val dvFut = scala.concurrent.Future {
        val out = java.nio.file.Files
          .createTempDirectory("graft-vroute-dv-q").toString
        graft.lake.DeleteWhere.deleteVectors(s, s"$src/stats",
          "user_id", lit(100L), lit(120L), s"$out/v2")
        graft.lake.DeleteWhere.indexBloom(s, s"$out/v2", "event_id")
        graft.lake.Routing.readWhere(s, s"$out/v2",
            col("event_id").isin((0 until 400).map(i => i * 25L): _*))
          .select(lit("dv").as("src"), col("event_id").as("k"),
            col("event_type").as("v"))
      }
      val Seq(bucketed, dv) = graft.lake.Overlap.all(Seq(bFut, dvFut))
      bucketed.unionByName(dv).orderBy("src", "k")
    }),

    // S31: LSM-style FRAGMENT ingest on the bucketed table — the
    // write-cheap upsert regime: each batch lands as per-bucket
    // fragments (O(batch) write, no bucket rewrite), versions resolve
    // at read over the bucketed scan (exchange-free window — pinned in
    // FragmentSpec), and mergeFragments consolidates mid-lifecycle
    // without perturbing resolved data or the change feed. The gate
    // runs append ×2 → compact → append → readResolved; the oracle is
    // the CASE-expressed latest-version state, so hash-green proves
    // the whole lifecycle resolves exactly.
    "s31_fragment_ingest" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-frag-q").toString + "/t"
      val orders = t(s, d, "orders")
      val b1 = orders.select(col("o_orderkey"),
        col("o_orderstatus").as("status"), lit(1L).as("ver"))
      val b2 = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("X").as("status"), lit(2L).as("ver"))
      val b3 = orders.filter(col("o_orderkey") % 7 === 3)
        .select(col("o_orderkey"), lit("Y").as("status"), lit(3L).as("ver"))
      graft.lake.BucketedUpsert.appendFragment(b1, root, "o_orderkey", 16, tag = 1)
      graft.lake.BucketedUpsert.appendFragment(b2, root, "o_orderkey", 16, tag = 2)
      graft.lake.BucketedUpsert.mergeFragments(s, root, "o_orderkey", "ver", tag = 3)
      graft.lake.BucketedUpsert.appendFragment(b3, root, "o_orderkey", 16, tag = 4)
      graft.lake.BucketedUpsert.readResolved(s, root, "o_orderkey", "ver")
        .select("o_orderkey", "status", "ver")
        .orderBy("o_orderkey")
    }),

    // S33: UNIFIED merge-on-read routing — ONE read API
    // (Routing.readWhere) over both deferred-work table shapes:
    //  (a) a FRAGMENTED bucketed table (LSM regime) resolves
    //      current-rows-per-key through the version column its WRITERS
    //      recorded in the manifest — the caller states nothing; the
    //      key IN probe routes to the probed buckets only and the
    //      resolve window runs before the value filter;
    //  (b) a DELETION-VECTOR version dir zone-prunes through the
    //      version's maintained stats manifest, applies the DV mask,
    //      and re-filters (RoutingSpec pins the files-opened counts).
    // Hash-green proves both deferred regimes are invisible in
    // results behind the one routed entry point.
    "s33_read_where_mor" -> ((s, d) => {
      // two DISJOINT arms (fragment tree vs DV version dir) — setup
      // actions overlapped (r22, guide §2.6), union unchanged
      val src = Fixtures.zEvents(s, d)
      import graft.lake.Overlap.ec
      val fragFut = scala.concurrent.Future {
        val root = java.nio.file.Files
          .createTempDirectory("graft-mor-q").toString + "/t"
        val orders = t(s, d, "orders")
        val b1 = orders.select(col("o_orderkey"),
          col("o_orderstatus").as("status"), lit(1L).as("ver"))
        val b2 = orders.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("X").as("status"), lit(2L).as("ver"))
        graft.lake.BucketedUpsert.appendFragment(b1, root, "o_orderkey", 16,
          tag = 1, versionCol = "ver")
        graft.lake.BucketedUpsert.appendFragment(b2, root, "o_orderkey", 16,
          tag = 2, versionCol = "ver")
        graft.lake.Routing.readWhere(s, root,
            col("o_orderkey").isin(7L, 10L, 20L, 21L, 35L, 49L, 70L))
          .select(col("o_orderkey").as("k"), col("status").as("v"),
            lit("frag").as("src"))
      }
      val dvFut = scala.concurrent.Future {
        val out = java.nio.file.Files
          .createTempDirectory("graft-mor-dv-q").toString
        graft.lake.DeleteWhere.deleteVectors(s, s"$src/stats",
          "user_id", lit(100L), lit(120L), s"$out/v2")
        graft.lake.Routing.readWhere(s, s"$out/v2",
            col("user_id").between(lit(80L), lit(130L)))
          .select(col("event_id").as("k"), col("event_type").as("v"),
            lit("dv").as("src"))
      }
      val Seq(frag, dv) = graft.lake.Overlap.all(Seq(fragFut, dvFut))
      frag.unionByName(dv).orderBy("src", "k")
    }),

    // S35: DELTA index refresh — the ingest-cycle loop closed: build
    // stats+bloom, land churn (a late-arriving slice as NEW files,
    // which makes every manifest stale and routing fail-fast), ONE
    // refreshIndexes call at O(changed files), then a routed read over
    // the post-churn truth. Hash-green proves the refreshed manifests
    // route exactly (including the new files both in pruned reads and
    // in the manifest-derived full-scan fallback).
    "s35_incr_refresh" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-refresh-q").toString
      val ev = t(s, d, "events")
        .select("event_id", "user_id", "event_type", "value")
      graft.lake.ZOrder.writeZOrdered(ev, s"$root/data", 16,
        "user_id", "event_id")
      // stats+bloom builds overlapped (r22, guide §2.6) — equivalent to
      // indexStats then indexBloom, same manifests, same routed result
      graft.lake.Routing.buildIndexes(s, root, Seq("user_id"),
        Seq("event_id"))
      ev.filter(col("event_id") % 97 === 0)
        .write.mode("append").parquet(s"$root/data")
      graft.lake.Routing.refreshIndexes(s, root)
      graft.lake.Routing.readWhere(s, root,
          col("user_id").between(lit(50L), lit(250L)) &&
            col("event_id") % 3 =!= 1)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id", "user_id")
    }),

    // S29: DELETION-VECTOR sparse delete — same DELETE semantics as
    // s20, but the version rewrites NOTHING: every original file is
    // referenced verbatim and the deleted rows hide behind a
    // (path, row_index) sidecar applied as a broadcast anti-mask on
    // the parquet _metadata.row_index column at read. Two chained DV
    // deletes compose through the maintained manifest, so the gate
    // exercises the union path too. Hash-green proves the scan-side
    // mask is indistinguishable from the full-scan delete.
    "s29_delete_vectors" -> ((s, d) => {
      val src = Fixtures.zEvents(s, d)
      val out = java.nio.file.Files
        .createTempDirectory("graft-dv-q").toString
      graft.lake.DeleteWhere.deleteVectors(s, s"$src/stats",
        "user_id", lit(100L), lit(120L), s"$out/v2")
      graft.lake.DeleteWhere.deleteVectors(s,
        graft.lake.DeleteWhere.statsDirOf(s"$out/v2"),
        "user_id", lit(40L), lit(45L), s"$out/v3")
      graft.lake.DeleteWhere.read(s, s"$out/v3")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    }),

    // S22: key-set delete on a bucketed-upsert table — the other half
    // of GDPR (s20 is the range delete on zone-mapped trees): every row
    // whose key is in the delete set is removed by rewriting ONLY the
    // buckets those keys hash into (BucketedUpsertSpec pins untouched
    // buckets referenced verbatim and the fully-emptied-bucket edge);
    // the new manifest publishes atomically through the Snapshot
    // pointer. The oracle is the plain anti-filter aggregate.
    "s22_delete_keys" -> ((s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-delk-q").toString + "/t"
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal"), lit(1L).as("ver"))
      graft.lake.BucketedUpsert.applyBatch(cust, root, "c_custkey", "ver",
        nBuckets = 16, tag = 1)
      val keys = t(s, d, "customer")
        .filter(col("c_custkey") % 13 === 0).select("c_custkey")
      graft.lake.BucketedUpsert.deleteKeys(s, root, "c_custkey", keys, tag = 2)
      graft.lake.BucketedUpsert.read(s, root)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
             Portable.moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // U5: union-by-name with missing-column fill — the schema-evolution
    // append (two exports whose column sets drifted, unioned into one
    // frame; matching is BY NAME, not position, and the absent column
    // null-fills). Nulls-first ordering is pinned explicitly in both
    // engines (Spark defaults nulls first, DuckDB nulls last).
    "u5_union_by_name" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_quantity")
        .unionByName(
          t(s, d, "lineitem").filter(col("l_returnflag") === "A")
            .select("l_quantity", "l_orderkey", "l_linenumber"),
          allowMissingColumns = true)
        .orderBy(col("l_orderkey"), col("l_linenumber").asc_nulls_first,
          col("l_quantity"))),

    // SQL API entry: the same engine surface via spark.sql over temp
    // views (everything else uses the DataFrame API).
    "sql_api_join_agg" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_orders")
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT c.c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")
    }),

    // U1: union-all of per-slice frames (pd.concat semantics, ref :196,245).
    "u1_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus")
        .unionByName(
          o.filter(col("o_orderstatus") === "O").select("o_orderkey", "o_orderstatus"))
        .orderBy("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "s1_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "s3_partition_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "s5_partition_manifest" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY o_orderstatus, o_orderpriority",
    // compaction must be a pure layout rewrite: content equals the
    // source table, so the oracle reads the source directly
    "s16_compaction" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // the FULL OUTER JOIN + CASE expansion of MERGE INTO; update rows
    // win on matched keys, base rows survive otherwise
    "s15_merge_upsert" ->
      """WITH upd AS (
           SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment,
                  CAST(c_acctbal AS DOUBLE) + 100.0 AS c_acctbal
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 1000000, 'NEW#' || CAST(c_custkey AS VARCHAR),
                  'INSERTED', 0.0
           FROM customer WHERE c_custkey % 17 = 0)
         SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
                CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE b.c_name END AS c_name,
                CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
                CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE CAST(b.c_acctbal AS DOUBLE) END AS c_acctbal
         FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
         ORDER BY c_custkey""",
    // the MERGE expansion of the two batches (update rows win on
    // matched keys, inserts add, base survives otherwise), aggregated
    // from scratch — what the incrementally-maintained MV must equal
    "s18_incr_agg" ->
      """WITH upd AS (
           SELECT c_custkey, 'UPDATED' AS c_mktsegment,
                  CAST(c_acctbal AS DOUBLE) + 100.0 AS c_acctbal
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 1000000, 'INSERTED', 0.0
           FROM customer WHERE c_custkey % 17 = 0),
         merged AS (
           SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
                  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
                  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE CAST(b.c_acctbal AS DOUBLE) END AS c_acctbal
           FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey)
         SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // the same merge expansion, then the deterministic md5-KMV from
    // scratch — what the incrementally-maintained sketch must equal
    "s23_incr_ndv" ->
      """WITH upd AS (
           SELECT c_custkey, 'UPDATED' AS c_mktsegment, c_custkey % 1000 AS nv
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 1000000, 'INSERTED', c_custkey % 1000
           FROM customer WHERE c_custkey % 17 = 0),
         merged AS (
           SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
                  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
                  CASE WHEN u.c_custkey IS NOT NULL THEN u.nv ELSE b.c_custkey % 1000 END AS nv
           FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey),
         vals AS (SELECT DISTINCT c_mktsegment, CAST(nv AS VARCHAR) AS nv FROM merged),
         h AS (
           SELECT c_mktsegment, nv,
                  CAST(('0x' || substr(md5(nv), 1, 15)) AS BIGINT)
                    / POWER(16, 15) AS u
           FROM vals),
         scored AS (
           SELECT c_mktsegment, u,
                  row_number() OVER (PARTITION BY c_mktsegment ORDER BY u, nv) AS rn
           FROM h)
         SELECT c_mktsegment,
                CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                     ELSE 63.0 / max(u) END AS ndv_estimate,
                count(*) AS n_mins
         FROM scored WHERE rn <= 64 GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // the merge expansion with the added column NULL outside the
    // evolved batch — what reading across schema generations must equal
    "s24_schema_evolve" ->
      """WITH upd AS (
           SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
                  CASE WHEN CAST(c_acctbal AS DOUBLE) > 5000 THEN 'gold' ELSE 'std' END AS tier
           FROM customer WHERE c_custkey % 10 = 0),
         merged AS (
           SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
                  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE CAST(b.c_acctbal AS DOUBLE) END AS c_acctbal,
                  u.tier AS tier
           FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey)
         SELECT coalesce(tier, 'legacy') AS tier, count(*) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM merged GROUP BY 1 ORDER BY tier""",
    // classify the same two published states from scratch: I/D/U by
    // full-outer join, unchanged rows absent — what the diff must equal
    "s25_snapshot_diff" ->
      """WITH v1 AS (
           SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS bal
           FROM customer),
         v2 AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 10 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment,
                  CASE WHEN c_custkey % 10 = 0 THEN CAST(c_acctbal AS DOUBLE) + 100.0
                       ELSE CAST(c_acctbal AS DOUBLE) END AS bal
           FROM customer WHERE c_custkey % 13 <> 0
           UNION ALL
           SELECT c_custkey + 1000000, 'INSERTED', 0.0
           FROM customer WHERE c_custkey % 17 = 0),
         d AS (
           SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
                  CASE WHEN o.c_custkey IS NULL THEN 'I'
                       WHEN n.c_custkey IS NULL THEN 'D'
                       WHEN o.bal IS DISTINCT FROM n.bal
                         OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'U'
                  END AS op,
                  o.bal AS old_bal, n.bal AS new_bal
           FROM v1 o FULL OUTER JOIN v2 n ON o.c_custkey = n.c_custkey)
         SELECT c_custkey, op, old_bal, new_bal FROM d
         WHERE op IS NOT NULL ORDER BY c_custkey""",
    // bucket pruning must be invisible to results: the oracle filters
    // the merge expansion by name from scratch — including that the
    // RENAMED key's old name returns nothing
    "s27_secondary_index" ->
      """WITH merged AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey = 500 THEN 'RENAMED-500' ELSE c_name END AS c_name,
                  CASE WHEN c_custkey = 777 THEN CAST(c_acctbal AS DOUBLE) + 1.0
                       ELSE CAST(c_acctbal AS DOUBLE) END AS bal
           FROM customer)
         SELECT c_custkey, c_name, bal FROM merged
         WHERE c_name IN ('Customer#000000042', 'Customer#000000777',
                          'RENAMED-500', 'Customer#000000500')
         ORDER BY c_custkey""",
    // the validated table must equal the source filtered by the same
    // CHECK predicate (strict TRUE-only semantics)
    "s28_constraints" ->
      """SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM customer WHERE CAST(c_acctbal AS DOUBLE) >= 0
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // the manifest-only aggregate must equal the same aggregates
    // computed from the raw table
    "a15_stats_agg" ->
      """SELECT count(*) AS n_rows,
                min(event_id) AS min_event_id, max(event_id) AS max_event_id,
                min(user_id) AS min_user_id, max(user_id) AS max_user_id
         FROM events""",
    // Bloom pruning must be invisible to results: the oracle is the
    // plain IN filter on the source table
    "s26_bloom_prune" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE event_id IN (47, 94, 141, 188, 235, 282, 329, 376, 423,
           470, 517, 564, 611, 658, 705, 752, 799, 846, 893, 940)
         ORDER BY event_id""",
    // pruning must be invisible to results: the oracle is the plain
    // unpruned range filter on the source table
    "s17_stats_prune" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE user_id BETWEEN 100 AND 120 ORDER BY event_id""",
    // the as-of read must return the v1 (unmodified) state, which is
    // the source table itself; v2's +100 bump would shift every sum
    "s19_time_travel" ->
      """SELECT c_mktsegment, count(*) AS n,
         CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // 2D pruning must be invisible to results: the oracle is the plain
    // unpruned conjunctive filter
    "s21_prune_2d" ->
      """SELECT event_id, user_id, epoch_ns(ts) // 3600000000000 AS bucket
         FROM events
         WHERE user_id BETWEEN 100 AND 120
           AND epoch_ns(ts) // 3600000000000 BETWEEN 473400 AND 473580
         ORDER BY event_id""",
    // which buckets were rewritten must be invisible to the result:
    // the oracle is the plain anti-filter on the source table
    "s22_delete_keys" ->
      """SELECT c_mktsegment, count(*) AS n,
         CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM customer WHERE c_custkey % 13 <> 0
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // which files were rewritten must be invisible to the result: the
    // oracle is the plain full-scan delete on the source table
    "s20_delete_where" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE user_id NOT BETWEEN 100 AND 120 ORDER BY event_id""",
    "s29_delete_vectors" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE user_id NOT BETWEEN 100 AND 120
           AND user_id NOT BETWEEN 40 AND 45 ORDER BY event_id""",
    // the oracle reads the parquet TWIN of the feather fixture — two
    // independent decoders of one logical table must agree exactly
    "s34_feather_parity" ->
      s"""SELECT id, name, score,
                to_json(seg) AS seg_json, to_json(tags) AS tags_json,
                ok, epoch_us(ts) AS ts_us
         FROM read_parquet('${testResource("fixture_twin.parquet")}')
         ORDER BY id""",
    // the churned slice is the %97 twin landed as new files; refreshed
    // routing must serve exactly the augmented table
    "s35_incr_refresh" ->
      """WITH aug AS (SELECT event_id, user_id, event_type FROM events
                      UNION ALL
                      SELECT event_id, user_id, event_type FROM events
                      WHERE event_id % 97 = 0)
         SELECT event_id, user_id, event_type FROM aug
         WHERE user_id BETWEEN 50 AND 250 AND event_id % 3 <> 1
         ORDER BY event_id, user_id""",
    // both merge-on-read regimes resolve invisibly behind readWhere:
    // the fragment side is the CASE-expressed latest-version state,
    // the DV side the mask-surviving slice
    "s33_read_where_mor" ->
      """SELECT k, v, src FROM (
           SELECT o_orderkey AS k,
                  CASE WHEN o_orderkey % 10 = 0 THEN 'X'
                       ELSE o_orderstatus END AS v,
                  'frag' AS src
           FROM orders WHERE o_orderkey IN (7,10,20,21,35,49,70)
           UNION ALL
           SELECT event_id AS k, event_type AS v, 'dv' AS src
           FROM events WHERE user_id BETWEEN 80 AND 130
             AND user_id NOT BETWEEN 100 AND 120)
         ORDER BY src, k""",
    "s30_schema_widen" ->
      """SELECT c_custkey,
                CASE WHEN c_custkey % 10 = 0
                     THEN CAST(floor(c_acctbal) AS BIGINT) + 10000000000
                     ELSE CAST(floor(c_acctbal) AS BIGINT) END AS bal,
                CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END AS ver
         FROM customer ORDER BY c_custkey""",
    "s32_read_where" -> {
      val inList = (1 to 40).map(i => i * 101L).mkString(",")
      s"""WITH base AS (
           SELECT event_id, user_id, event_type FROM events
           WHERE user_id BETWEEN 50 AND 250 AND event_id % 3 <> 1),
         eqs AS (
           SELECT event_id, user_id, event_type FROM events
           WHERE user_id BETWEEN 50 AND 250 AND event_id IN ($inList))
         SELECT * FROM base UNION ALL SELECT * FROM eqs
         ORDER BY event_id, user_id"""
    },
    // one-sided pruning must be invisible to results: the oracle runs
    // the same four predicates unpruned (the dv leg excludes the DV
    // mask's [100,120] range)
    "s36_range_route" ->
      """SELECT * FROM (
           SELECT 'hi' AS src, event_id, user_id, event_type FROM events
           WHERE user_id >= 120
           UNION ALL
           SELECT 'lo', event_id, user_id, event_type FROM events
           WHERE user_id <= 25
           UNION ALL
           SELECT 'st', event_id, user_id, event_type FROM events
           WHERE user_id > 140 AND event_type = 'click'
           UNION ALL
           SELECT 'dv', event_id, user_id, event_type FROM events
           WHERE user_id >= 110 AND user_id NOT BETWEEN 100 AND 120)
         ORDER BY src, event_id""",
    // value-column routing must be invisible to results on both
    // shapes: the oracle is the plain filter (the dv leg excludes the
    // DV mask's [100,120] user range)
    "s38_value_route" -> {
      val inList = (0 until 400).map(i => i * 25L).mkString(",")
      s"""SELECT * FROM (
           SELECT 'b' AS src, o_orderkey AS k,
                  CAST(CAST(o_totalprice AS DOUBLE) AS VARCHAR) AS v
           FROM orders WHERE CAST(o_totalprice AS DOUBLE) <= 1200.0
           UNION ALL
           SELECT 'dv', event_id, event_type FROM events
           WHERE event_id IN ($inList)
             AND user_id NOT BETWEEN 100 AND 120)
         ORDER BY src, k"""
    },
    // the manifest-served aggregates must equal the data's own numbers
    // on every shape: plain tree, bucketed (resolved rows), and DV
    // version (count = base minus the masked band; min/max not pushed)
    "s40_agg_push" ->
      """SELECT * FROM (
           SELECT 'plain' AS src, count(*) AS n_rows, min(user_id) AS mn,
                  max(user_id) AS mx FROM events
           UNION ALL
           SELECT 'bucket', count(*), min(o_custkey), max(o_custkey)
           FROM orders
           UNION ALL
           SELECT 'dv', count(*), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
           FROM events WHERE user_id NOT BETWEEN 100 AND 120)
         ORDER BY src""",
    // the DV mask and the routed file admission must be invisible: the
    // oracle is the plain full-scan delete on the source table
    "s43_dsv2_dv" ->
      """SELECT * FROM (
           SELECT 'in' AS src, event_id, user_id, event_type FROM events
           WHERE user_id NOT BETWEEN 100 AND 120
             AND event_id IN (17, 4217, 999999)
           UNION ALL
           SELECT 'os', event_id, user_id, event_type FROM events
           WHERE user_id NOT BETWEEN 100 AND 120 AND user_id >= 110)
         ORDER BY src, event_id""",
    // fragment resolution: the overlay (every 10th key, custkey shifted)
    // must win; everything else stays the base row
    "s44_sql_resolved" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                     ELSE o_custkey END AS o_custkey,
                o_orderstatus
         FROM orders ORDER BY o_orderkey""",
    // the exchange-free clustered aggregate must equal the plain
    // shuffling aggregate over the source table
    "s41_dsv2_cluster" ->
      """SELECT o_orderkey, count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sc
         FROM orders GROUP BY o_orderkey ORDER BY o_orderkey""",
    // VERSION AS OF 1 must see the UN-shifted base snapshot
    "s42_catalog_tt" ->
      """SELECT c_mktsegment, count(*) AS n,
         CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // DSv2 routing must be invisible to results: the oracle runs the
    // same three SQL shapes straight over the source table
    "s39_dsv2_route" ->
      """SELECT * FROM (
           SELECT 'eq' AS src, event_id, user_id, event_type FROM events
           WHERE event_id IN (17, 4217, 999999)
           UNION ALL
           SELECT 'os', event_id, user_id, event_type FROM events
           WHERE user_id >= 120
           UNION ALL
           SELECT 'or', event_id, user_id, event_type FROM events
           WHERE user_id <= 10 OR event_id = 4217
           UNION ALL
           SELECT 'bk', o_orderkey, o_custkey, o_orderstatus FROM orders
           WHERE o_orderkey IN (7, 68, 129, 4242, 999999))
         ORDER BY src, event_id""",
    // OR routing must be invisible to results: the oracle is the plain
    // disjunctive filter on the source table
    "s37_or_route" ->
      """SELECT * FROM (
           SELECT 'mix' AS src, event_id, user_id, event_type FROM events
           WHERE user_id BETWEEN 50 AND 60
              OR event_id IN (17, 4217, 999999)
           UNION ALL
           SELECT 'tails', event_id, user_id, event_type FROM events
           WHERE user_id <= 10 OR user_id >= 140)
         ORDER BY src, event_id""",
    "s31_fragment_ingest" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 7 = 3 THEN 'Y'
                     WHEN o_orderkey % 10 = 0 THEN 'X'
                     ELSE o_orderstatus END AS status,
                CASE WHEN o_orderkey % 7 = 3 THEN 3
                     WHEN o_orderkey % 10 = 0 THEN 2
                     ELSE 1 END AS ver
         FROM orders ORDER BY o_orderkey""",
    "p1_project_cast" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation ORDER BY n_nationkey",
    "p3_eq_filter" ->
      "SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity FROM lineitem WHERE l_suppkey = 3 ORDER BY l_orderkey, l_linenumber",
    "p4_in_filter" ->
      "SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey",
    "p5_array_not_overlap" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE NOT list_has_any(string_split(text, ' '), ['vector','stream']) ORDER BY doc_id",
    "p6_array_contains" ->
      "SELECT doc_id, source FROM documents WHERE list_contains(string_split(text, ' '), 'spark') ORDER BY doc_id",
    "a1_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "a2_dedup_multicol" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "a3_count_group" ->
      "SELECT event_type, count(*) AS count FROM events GROUP BY event_type ORDER BY event_type",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "f_j1_json_extract" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id",
    "u1_union_all" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F' UNION ALL SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderkey",
    "u3_intersect" ->
      """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
         INTERSECT
         SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
         ORDER BY l_orderkey""",
    "u4_except_all" ->
      """SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
         EXCEPT ALL
         SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
         ORDER BY l_orderkey""",
    // 31 bits per dimension (DuckDB's << raises on 1<<63); the gate's
    // values are far below 2^31, where this equals the 32-bit kernel.
    "s14_zorder_key" ->
      """SELECT event_id, user_id,
         epoch_ns(ts) // 3600000000000 AS bucket,
         CAST(list_sum(list_transform(range(0, 31),
           i -> ((user_id >> i) & 1) * (1::BIGINT << (2*i))
              + (((epoch_ns(ts) // 3600000000000) >> i) & 1) * (1::BIGINT << (2*i+1))
         )) AS BIGINT) AS z
         FROM events ORDER BY event_id""",
    "u5_union_by_name" ->
      """SELECT l_orderkey, l_quantity, l_linenumber FROM (
           SELECT l_orderkey, l_quantity FROM lineitem WHERE l_returnflag = 'R'
           UNION ALL BY NAME
           SELECT l_quantity, l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'A')
         ORDER BY l_orderkey, l_linenumber NULLS FIRST, l_quantity""",
    "f_d1_date_parts" ->
      """SELECT o_orderkey,
         year(CAST(o_orderdate AS DATE)) AS y,
         month(CAST(o_orderdate AS DATE)) AS m,
         day(CAST(o_orderdate AS DATE)) AS dom,
         quarter(CAST(o_orderdate AS DATE)) AS q,
         CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_start,
         CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
         FROM orders ORDER BY o_orderkey""",
    "sql_api_join_agg" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""
  )
}
