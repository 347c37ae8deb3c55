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
      (args: Seq[Expression]) => NearestCellF(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_seg2bbox"),
      new ExpressionInfo(classOf[Seg2BboxF].getName, "graft_seg2bbox"),
      (args: Seq[Expression]) => Seg2BboxF(args(0))),
    (FunctionIdentifier("graft_aabb2poly"),
      new ExpressionInfo(classOf[Aabb2PolyF].getName, "graft_aabb2poly"),
      (args: Seq[Expression]) => Aabb2PolyF(args(0))),
    (FunctionIdentifier("graft_rect2poly"),
      new ExpressionInfo(classOf[RectToPolyF].getName, "graft_rect2poly"),
      (args: Seq[Expression]) => RectToPolyF(args(0))),
    (FunctionIdentifier("graft_rbb_from_seg"),
      new ExpressionInfo(classOf[RbbFromSegF].getName, "graft_rbb_from_seg"),
      (args: Seq[Expression]) => RbbFromSegF(args(0))),
    (FunctionIdentifier("graft_coco_from_seg"),
      new ExpressionInfo(classOf[CocoFromSegF].getName, "graft_coco_from_seg"),
      (args: Seq[Expression]) => CocoFromSegF(args(0))),
    (FunctionIdentifier("graft_yolo_bbox"),
      new ExpressionInfo(classOf[YoloBboxF].getName, "graft_yolo_bbox"),
      (args: Seq[Expression]) => YoloBboxF(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_yolo_seg"),
      new ExpressionInfo(classOf[YoloSegF].getName, "graft_yolo_seg"),
      (args: Seq[Expression]) => YoloSegF(args(0), args(1), args(2))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesF].getName, "graft_shingles"),
      (args: Seq[Expression]) => ShinglesF(args(0))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashF].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimhashF(args(0))),
    (FunctionIdentifier("graft_repetition"),
      new ExpressionInfo(classOf[RepetitionStatsF].getName, "graft_repetition"),
      (args: Seq[Expression]) => RepetitionStatsF(args(0))),
    (FunctionIdentifier("graft_zorder2"),
      new ExpressionInfo(classOf[ZOrder2F].getName, "graft_zorder2"),
      (args: Seq[Expression]) => ZOrder2F(args(0), args(1)))
  ) ++ bloomDescriptors

  /** Spark ships bloom-filter build/probe expressions for its runtime
    * shuffle-join filters but does not register them as SQL functions;
    * these descriptors expose them so a pipeline can build an explicit
    * semi-join prefilter (build on the dim keys, probe fact-side before
    * the shuffle). Probe side requires a foldable value or scalar
    * subquery — exactly how the queries use it.
    */
  private def bloomDescriptors: Seq[Descriptor] = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    Seq(
      (FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        (args: Seq[Expression]) => args.size match {
          case 1 => new BloomFilterAggregate(args(0))
          case 2 => new BloomFilterAggregate(args(0), args(1))
          case 3 => new BloomFilterAggregate(args(0), args(1), args(2))
          case n => throw new IllegalArgumentException(
            s"graft_bloom_agg expects 1 to 3 arguments (child[, estimatedNumItems[, numBits]]), got $n")
        }),
      (FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
        (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1))))
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
