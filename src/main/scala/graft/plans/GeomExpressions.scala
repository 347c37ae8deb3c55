package graft.plans

import graft.functions.Geometry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the export geometry kernels
  * (SURVEY §2.11's promotion path, the export analogue of
  * VectorExpressions): rbb/coco-from-seg, seg2bbox, aabb2poly,
  * rect2poly and the YOLO normalizers run once per annotation row in
  * every export query, and as Scala UDFs each call paid the
  * Row↔Scala encoder tax (ArrayData → boxed WrappedArray[Double] and
  * back) plus a codegen island break.
  *
  * These expressions read the input ArrayData directly, run the exact
  * same [[graft.functions.Geometry]] kernels (one deterministic
  * implementation shared by interpreted eval and generated code — the
  * generated Java calls the kernel adapter through GeomKernels'
  * static forwarders), and return UnsafeArrayData. The projection
  * stays inside whole-stage codegen; only the kernel call itself is a
  * (non-virtual, JIT-friendly) method call. Degenerate inputs yield
  * SQL NULL exactly as the UDFs did (P9 guard semantics,
  * CvatApi.py:360-369), and so do arrays carrying NULL ELEMENTS —
  * containsNull inputs are reachable from both the SQL registry and
  * the Column API, and toDoubleArray would otherwise coerce the NULLs
  * to 0.0 vertices (silently wrong geometry).
  */
object GeomKernels {

  private def out(a: Array[Double]): ArrayData =
    if (a == null) null else UnsafeArrayData.fromPrimitiveArray(a)

  /** True when the array carries a NULL element. The expressions accept
    * ArrayType(double, containsNull=true) (the Column API and the SQL
    * registry both produce containsNull arrays), but
    * ArrayData.toDoubleArray coerces NULL elements to 0.0 — a
    * NULL-bearing coordinate list must yield SQL NULL, not a silently
    * zeroed vertex. O(n) bit test, negligible next to the kernels.
    */
  private def hasNullElem(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** F-G5: null below 1 point, matching the former UDF guard. */
  def seg2bbox(seg: ArrayData): ArrayData = {
    if (seg.numElements() < 2 || hasNullElem(seg)) return null
    out(Geometry.segmentation2bbox(seg.toDoubleArray()))
  }

  /** F-G6: [x,y,w,h] → open 8-coord rectangle; null below 4 coords. */
  def aabb2poly(aabb: ArrayData): ArrayData = {
    if (aabb.numElements() < 4 || hasNullElem(aabb)) return null
    out(Geometry.aabb2poly(aabb.toDoubleArray()))
  }

  /** F-G7: CVAT [l,t,r,b] → closed polygon; null below 4 coords. */
  def rect2poly(pts: ArrayData): ArrayData = {
    if (pts.numElements() < 4 || hasNullElem(pts)) return null
    out(Geometry.rectToPolygon(pts.toDoubleArray()))
  }

  /** F-G1 rcoco [x,y,w,h,theta]; null on short or degenerate input. */
  def rbbFromSeg(seg: ArrayData): ArrayData = {
    if (seg.numElements() < 5 || hasNullElem(seg)) return null
    out(Geometry.rbbCocoFromSeg(seg.toDoubleArray()).map(_._1).orNull)
  }

  /** F-G1 both outputs from ONE kernel run: struct(rcoco, coco), null
    * on short or degenerate input (the kernel defines them together —
    * rcoco and coco are never null independently). Callers needing
    * both must use this instead of rbbFromSeg + cocoFromSeg, which
    * each run the full hull+calipers and discard half the result.
    */
  def rbbCoco(seg: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    if (seg.numElements() < 5 || hasNullElem(seg)) return null
    Geometry.rbbCocoFromSeg(seg.toDoubleArray()) match {
      case Some((rcoco, coco)) =>
        org.apache.spark.sql.catalyst.InternalRow(out(rcoco), out(coco))
      case None => null
    }
  }

  /** F-G1 coco [xmin,ymin,w,h]; null on short or degenerate input. */
  def cocoFromSeg(seg: ArrayData): ArrayData = {
    if (seg.numElements() < 5 || hasNullElem(seg)) return null
    out(Geometry.rbbCocoFromSeg(seg.toDoubleArray()).map(_._2).orNull)
  }

  /** F-G8 make_bbox; null below one (x,y) pair or on a non-positive
    * canvas. (The former UDF guarded only isEmpty — a malformed
    * 1-element seg crashed the kernel's empty-min; found by
    * GeomExprPropSpec's sweep.)
    */
  def yoloBbox(width: Double, height: Double, seg: ArrayData): ArrayData = {
    if (seg.numElements() < 2 || width <= 0 || height <= 0 || hasNullElem(seg))
      return null
    out(Geometry.yoloBbox(width, height, seg.toDoubleArray()))
  }

  /** F-G8 make_segmentation; null on non-positive canvas (empty seg
    * normalizes to an empty list, matching the former UDF).
    */
  def yoloSeg(width: Double, height: Double, seg: ArrayData): ArrayData = {
    if (width <= 0 || height <= 0 || hasNullElem(seg)) return null
    out(Geometry.yoloSegmentation(width, height, seg.toDoubleArray()))
  }
}

/** Shared shape: array<double> → array<double> through one GeomKernels
  * adapter, nullable because the kernels null degenerate inputs.
  * Inputs must already be array<double> — the GeomFunctions Column
  * wrappers insert an explicit cast (a no-op when types match), since
  * ImplicitCastInputTypes' AbstractDataType is private[sql].
  */
abstract class GeomArrayExpr extends UnaryExpression {
  /** GeomKernels method name — must match a static forwarder; the
    * generated Java calls it directly.
    */
  protected def kernel: String
  /** The same kernel as a direct reference for interpreted eval. */
  protected def run(a: ArrayData): ArrayData

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    run(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.plans.GeomKernels.$kernel($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}

case class Seg2BboxF(child: Expression) extends GeomArrayExpr {
  override protected def kernel: String = "seg2bbox"
  override protected def run(a: ArrayData): ArrayData = GeomKernels.seg2bbox(a)
  override def prettyName: String = "graft_seg2bbox"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Aabb2PolyF(child: Expression) extends GeomArrayExpr {
  override protected def kernel: String = "aabb2poly"
  override protected def run(a: ArrayData): ArrayData = GeomKernels.aabb2poly(a)
  override def prettyName: String = "graft_aabb2poly"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RectToPolyF(child: Expression) extends GeomArrayExpr {
  override protected def kernel: String = "rect2poly"
  override protected def run(a: ArrayData): ArrayData = GeomKernels.rect2poly(a)
  override def prettyName: String = "graft_rect2poly"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RbbFromSegF(child: Expression) extends GeomArrayExpr {
  override protected def kernel: String = "rbbFromSeg"
  override protected def run(a: ArrayData): ArrayData = GeomKernels.rbbFromSeg(a)
  override def prettyName: String = "graft_rbb_from_seg"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CocoFromSegF(child: Expression) extends GeomArrayExpr {
  override protected def kernel: String = "cocoFromSeg"
  override protected def run(a: ArrayData): ArrayData = GeomKernels.cocoFromSeg(a)
  override def prettyName: String = "graft_coco_from_seg"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** F-G1 both outputs as struct(rcoco, coco) from one kernel run — the
  * form for call sites needing both (exporter/ingestion projections):
  * two field extracts over one non-cheap expression, which
  * CollapseProject's cost guard keeps in its own projection instead of
  * re-inlining the calipers into every reference.
  */
case class RbbCocoF(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rbb_coco expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("rcoco", ArrayType(DoubleType, containsNull = false)),
    StructField("coco", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rbb_coco"

  override protected def nullSafeEval(a: Any): Any =
    GeomKernels.rbbCoco(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (InternalRow) graft.plans.GeomKernels.rbbCoco($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared shape for the YOLO normalizers: (width, height, seg). */
abstract class YoloExpr extends TernaryExpression {
  protected def kernel: String
  protected def run(w: Double, h: Double, s: ArrayData): ArrayData
  def first: Expression; def second: Expression; def third: Expression

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, double, array<double>), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(w: Any, h: Any, s: Any): Any =
    run(w.asInstanceOf[Double], h.asInstanceOf[Double], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, s) => {
      s"""
         |${ev.value} = graft.plans.GeomKernels.$kernel($w, $h, $s);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}

case class YoloBboxF(first: Expression, second: Expression, third: Expression)
    extends YoloExpr {
  override protected def kernel: String = "yoloBbox"
  override protected def run(w: Double, h: Double, s: ArrayData): ArrayData =
    GeomKernels.yoloBbox(w, h, s)
  override def prettyName: String = "graft_yolo_bbox"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class YoloSegF(first: Expression, second: Expression, third: Expression)
    extends YoloExpr {
  override protected def kernel: String = "yoloSeg"
  override protected def run(w: Double, h: Double, s: ArrayData): ArrayData =
    GeomKernels.yoloSeg(w, h, s)
  override def prettyName: String = "graft_yolo_seg"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
