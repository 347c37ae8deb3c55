package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Registration of the native expressions.
  *
  * Idiomatic path: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (injectFunction); [[GraftFunctions.register]] is the programmatic
  * equivalent for sessions that already exist (used by the query packs,
  * idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  type Descriptor = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProductF(args(0), args(1))),
    (FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[NormF].getName, "graft_norm"),
      (args: Seq[Expression]) => NormF(args(0))),
    (FunctionIdentifier("graft_pairs"),
      new ExpressionInfo(classOf[OrderedPairsGen].getName, "graft_pairs"),
      (args: Seq[Expression]) => OrderedPairsGen(args(0))),
    (FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCellF].getName, "graft_nearest_cell"),
      (args: Seq[Expression]) => NearestCellF(args(0), args(1), args(2)))
  )

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
