package graft

import graft.operators.SeqIds
import graft.queries.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Incremental cluster maintenance (DedupQueries.mergeIncremental): the
  * two-epoch replay equality — folding a batch's pairs into standing
  * labels must be indistinguishable from recomputing connected
  * components over the union of both epochs' pairs — on hand-built merge
  * topologies, a randomized split sweep (the CcFuzz pattern), and the
  * plan-level claim that the corpus-sized standing table is never
  * shuffled.
  */
class IncrClustersSpec extends SparkSpec {

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("da", "db")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    try df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally SeqIds.releaseAll()

  /** Full-recompute reference and incremental result for a split. */
  private def check(standing: Seq[(Long, Long)], batch: Seq[(Long, Long)],
                    clue: String): Unit = {
    val want = labelsOf(DedupQueries.clustersOf(pairsDf(standing ++ batch)))
    val standingLabels = DedupQueries.clustersOf(pairsDf(standing))
    val got = labelsOf(
      DedupQueries.mergeIncremental(standingLabels, pairsDf(batch)))
    assert(got == want, s"$clue: incremental diverged from full recompute")
  }

  test("two standing clusters merge through a chain of new docs") {
    // standing: {1,2,3} rooted at 1, {10,11} rooted at 10;
    // batch: 3 — 20 — 21 — 10 bridges them through two brand-new docs
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      Seq((3L, 20L), (20L, 21L), (21L, 10L)), "chain bridge")
  }

  test("batch pair inside one standing cluster is a no-op") {
    check(Seq((1L, 2L), (2L, 3L)), Seq((1L, 3L)), "intra-cluster pair")
  }

  test("batch-only pairs form a fresh cluster; untouched labels survive") {
    check(Seq((1L, 2L), (5L, 6L)), Seq((30L, 31L), (31L, 32L)),
      "fresh cluster")
  }

  test("new doc with smaller id than the standing root takes over the label") {
    // merged component min is the NEW doc 0, not standing root 4
    check(Seq((4L, 5L), (5L, 6L)), Seq((0L, 6L)), "new global min")
  }

  test("empty batch leaves the standing table unchanged") {
    check(Seq((1L, 2L), (7L, 8L)), Seq.empty, "empty batch")
  }

  test("randomized two-epoch splits match the full recompute") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 25) {
      val nEdges = 10 + rnd.nextInt(60)
      val nNodes = 5 + rnd.nextInt(40)
      val all = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter(p => p._1 != p._2)
      val (standing, batch) = all.partition(_ => rnd.nextBoolean())
      try check(standing, batch, s"trial $trial")
      catch { case e: Throwable =>
        fail(s"trial $trial standing=$standing batch=$batch: ${e.getMessage}")
      }
    }
  }

  test("standing table is never shuffled: broadcast-only joins over its scan") {
    // parquet-backed standing table so the plan has a real scan to track
    val dir = java.nio.file.Files.createTempDirectory("incr-standing").toString
    val standingPairs = (0L until 400L).map(i => (i / 4 * 4, i)) // 100 clusters
    DedupQueries.clustersOf(pairsDf(standingPairs))
      .write.mode("overwrite").parquet(dir)
    SeqIds.releaseAll()
    val standing = spark.read.parquet(dir)
    val batch = pairsDf(Seq((0L, 4L), (8L, 1000L), (1000L, 1001L)))
    val merged = DedupQueries.mergeIncremental(standing, batch)
    try {
      // executed plan (materializes AQE): no shuffle exchange may contain
      // the standing table's file scan — both of its consumptions must be
      // the probe side of broadcast joins
      merged.collect()
      // PlanInspect recurses through AQE's QueryStage leaf wrappers —
      // a naive collect over the adaptive plan sees NO exchanges (and
      // no scans) at all, making this assert pass vacuously
      def scansStanding(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        graft.plans.PlanInspect.fileScans(p).exists(
          _.relation.location.rootPaths.exists(_.toString.contains(dir)))
      val offenders = graft.plans.PlanInspect
        .shuffles(merged.queryExecution.executedPlan)
        .filter(scansStanding)
      assert(offenders.isEmpty,
        s"standing-table scan found under a shuffle exchange:\n${offenders.mkString("\n")}")
      // and the merge must still be correct on this shape
      val got = labelsOf(DedupQueries.mergeIncremental(standing, batch))
      val want = labelsOf(DedupQueries.clustersOf(
        pairsDf(standingPairs ++ Seq((0L, 4L), (8L, 1000L), (1000L, 1001L)))))
      assert(got == want)
    } finally SeqIds.releaseAll()
  }
}
