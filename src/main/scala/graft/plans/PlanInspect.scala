package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Executed-plan inspection helpers shared by the plan-asserting specs
  * and the benches. The non-trivial part: under AQE the final plan is a
  * tree of `QueryStageExec` LEAF wrappers (ShuffleQueryStage,
  * BroadcastQueryStage and — since Spark 4 — ResultQueryStage) whose
  * inner `plan` is NOT a TreeNode child, so a naive `collect` over the
  * executed plan sees NO exchanges at all and a "zero-shuffle" assert
  * passes vacuously. Every traversal here recurses through stage
  * wrappers and subqueries explicitly.
  */
object PlanInspect {

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Every shuffle exchange in the EXECUTED plan, stage wrappers and
    * subqueries included. A `ReusedExchange` pointing at a shuffle
    * counts too: the bytes moved once, but the plan does depend on a
    * shuffle having happened — for a "this plan needs no exchange"
    * assert that is a failure.
    */
  def shuffles(p: SparkPlan): Seq[SparkPlan] =
    unwrap(p).collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => shuffles(a)
      case q: QueryStageExec => shuffles(q.plan)
      case sh: ShuffleExchangeLike => Seq(sh)
      case r: ReusedExchangeExec if r.child.isInstanceOf[ShuffleExchangeLike] =>
        Seq(r)
    }.flatten

  /** Materializes `df` (so AQE finalizes the plan) and returns its
    * shuffle exchanges. */
  def shufflesOf(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    shuffles(df.queryExecution.executedPlan)
  }

  /** Every parquet/file scan in the executed (sub)plan, stage wrappers
    * and subqueries included — for asserts of the form "no shuffle may
    * contain a scan of table X". */
  def fileScans(p: SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    unwrap(p).collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => fileScans(a)
      case q: QueryStageExec => fileScans(q.plan)
      case r: ReusedExchangeExec => fileScans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    }.flatten

  /** Total `shuffleBytesWritten` across the executed plan's shuffle
    * exchanges (reused exchanges contribute nothing new). Call after an
    * action has run the plan. */
  def shuffleBytesWritten(df: DataFrame): Long =
    shuffles(df.queryExecution.executedPlan).map {
      case sh: ShuffleExchangeLike =>
        sh.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
      case _ => 0L
    }.sum
}
