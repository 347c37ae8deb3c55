package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** Physical-plan assertions: filters and projections actually reach the
  * parquet scan (SURVEY §4 — pushdown/pruning are the 100 TB survival
  * traits, so they are asserted, not assumed). Handles both the V1
  * (FileSourceScanExec, Spark's default for parquet) and V2 (BatchScan)
  * read paths.
  */
class PlanSpec extends SparkSpec {

  private case class ScanInfo(pushedFilters: String, readColumns: Set[String])

  // AQE hides the plan behind AdaptiveSparkPlanExec (a leaf); descend.
  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }

  private def scans(df: DataFrame): Seq[ScanInfo] =
    unwrap(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec =>
        ScanInfo(f.metadata.getOrElse("PushedFilters", ""),
          f.requiredSchema.fieldNames.toSet)
      case b: BatchScanExec if b.scan.isInstanceOf[ParquetScan] =>
        val p = b.scan.asInstanceOf[ParquetScan]
        ScanInfo(p.pushedFilters.mkString(","), p.readDataSchema.fieldNames.toSet)
    }

  test("P3 equality predicate is pushed to the parquet scan") {
    val df = graft.queries.CoreQueries.defs("p3_eq_filter")(spark, sf())
    val ss = scans(df)
    assert(ss.nonEmpty, "no parquet scan found in plan")
    val pushed = ss.map(_.pushedFilters).mkString(";")
    assert(pushed.contains("l_suppkey"), s"expected l_suppkey in pushed filters, got: $pushed")
  }

  test("P4 IN-list predicate is pushed to the parquet scan") {
    val df = graft.queries.CoreQueries.defs("p4_in_filter")(spark, sf())
    val pushed = scans(df).map(_.pushedFilters).mkString(";")
    assert(pushed.contains("o_orderpriority"), s"got: $pushed")
  }

  test("S1 bare projection prunes the read schema to selected columns") {
    val df = graft.queries.CoreQueries.defs("s1_scan_project")(spark, sf())
    val ss = scans(df)
    assert(ss.nonEmpty, "no parquet scan found in plan")
    val readCols = ss.head.readColumns
    assert(readCols == Set("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      s"read schema not pruned: $readCols")
  }

  test("flagship q1_agg keeps whole-stage codegen on the agg path") {
    val df = graft.queries.CoreQueries.defs("q1_agg")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(500))
  }

  test("a11 KMV top-k compiles to WindowGroupLimit (O(k) per-task state)") {
    // the scale claim of the sketch: the rn<=k filter must prune to the
    // per-map top-k BEFORE the shuffle, never buffering a whole group
    val plan = graft.queries.WindowQueries.defs("a11_kmv_distinct")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("O6 per-group top-k compiles to WindowGroupLimit (O(k) per-task state)") {
    val plan = graft.queries.WindowQueries.defs("o6_group_topk")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("J14 fact scan carries a dynamicpruning partition filter") {
    // the scale claim of the gate: the dim filter's surviving keys
    // reach the fact scan as a runtime partition filter, so pruned
    // partition DIRECTORIES are never listed or read
    val df = graft.queries.JoinQueries.defs("j14_dpp")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      "expected a dynamicpruning partition filter on the fact scan; " +
        "plan head:\n" + plan.take(1500))
  }

  test("S10 scale tier: image dim never collected above the broadcast threshold") {
    import spark.implicits._
    val annos = (0 until 60).map { i =>
      (s"img_${i % 12}", s"cat_${i % 3}", i.toLong,
        Seq(i.toDouble, 1.0, 4.0, 3.0, 0.0))
    }.toDF("image_name", "category", "anno_key", "rcoco")
    val images = annos.select("image_name").distinct()
    def run(): (Seq[(Int, Int, Int)], String) = {
      val out = graft.export.Coco.annotationRecords(annos, images, "anno_key")
        .select("id", "image_id", "category_id")
      val rows = out.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
        .toSeq.sortBy(_._1)
      val plan = out.queryExecution.executedPlan.toString
      graft.operators.SeqIds.releaseAll()
      (rows, plan)
    }
    val (smallRows, smallPlan) = run()
    assert(graft.export.Coco.lastImageDimWasLocal,
      "below the threshold the localDims tier must apply")
    // a driver-built image dim is a LocalTableScan carrying image_id;
    // the fixture's own LocalRelation (image_name but no image_id) is
    // not a collect
    def driverImgDims(plan: String) = plan.linesIterator.filter(l =>
      l.contains("LocalTableScan") && l.contains("image_name") && l.contains("image_id")).toSeq
    assert(driverImgDims(smallPlan).nonEmpty,
      s"broadcast tier should carry a driver-built image dim:\n$smallPlan")
    spark.conf.set(graft.export.Coco.ImageBroadcastMaxRowsKey, "4")
    try {
      val (bigRows, bigPlan) = run()
      assert(!graft.export.Coco.lastImageDimWasLocal,
        "above the threshold the image dim must take the distributed tier")
      val localImg = driverImgDims(bigPlan)
      assert(localImg.isEmpty,
        s"image names reached the driver above the threshold:\n${localImg.mkString("\n")}")
      assert(bigRows == smallRows, "both tiers must assign identical ids")
    } finally spark.conf.unset(graft.export.Coco.ImageBroadcastMaxRowsKey)
  }

  test("d_dedup_apply anti join never degenerates to a cartesian") {
    val plan = graft.queries.DedupQueries.defs("d_dedup_apply")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    graft.operators.SeqIds.releaseAll()
  }

  test("t_bm25_topk: heap-based top-k, cached corpus scan, no global sort") {
    val plan = graft.queries.TextQueries.defs("t_bm25_topk")(spark, sf())
      .queryExecution.executedPlan.toString
    graft.operators.SeqIds.releaseAll()
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as per-partition heaps:\n${plan.take(800)}")
    assert(!plan.contains("rangepartitioning"),
      "a range exchange means a global sort snuck in")
    // df/stats branches must read the pinned cache, not re-scan parquet
    assert(plan.contains("InMemoryTableScan"), "pinned corpus cache not used")
  }

  test("d_incr_dedup: anti join on hash, no cartesian") {
    val plan = graft.queries.DedupQueries.defs("d_incr_dedup")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }
}
