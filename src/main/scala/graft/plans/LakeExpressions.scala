package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve key for multi-dimensional lake clustering —
  * the layout analogue of Delta's OPTIMIZE ZORDER: sort/range-partition
  * files by the interleaved key and BOTH dimensions get narrow per-file
  * min/max ranges, so a conjunctive (or single-dim) range predicate can
  * skip most files, where a single-column sort only serves its leading
  * column (ZOrderSpec measures exactly this on a written tree).
  */
object ZOrderKernel {

  /** Spread the low 32 bits of x to the even bit positions (standard
    * magic-number bit spreading, public domain technique).
    */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 64-bit Morton code: bit i of a → bit 2i, bit i of b → bit 2i+1.
    * Contract: callers pass values already reduced to 32 bits (ids
    * bucketized, timestamps coarsened); higher bits are ignored.
    */
  def morton2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** `graft_zorder2(a, b)` — Morton-interleave two long keys (low 32 bits
  * each). Null if either input is null; codegen'd via the shared static
  * kernel so eval and generated code are byte-identical.
  */
case class ZOrder2F(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder2 expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ZOrderKernel.morton2($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
