package graft.functions

import graft.plans.{Aabb2PolyF, CocoFromSegF, RbbCocoF, RbbFromSegF, RectToPolyF, Seg2BboxF, YoloBboxF, YoloSegF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Column API over the native geometry expressions
  * ([[graft.plans.GeomKernels]]). Formerly Scala UDFs;
  * promoted to codegen-participating Catalyst expressions so the
  * per-annotation export projections never leave whole-stage codegen
  * and pay no Row↔Scala encoder tax. Semantics (including
  * null-on-degenerate, the P9 guard) are identical — the same
  * Geometry kernels run underneath, and the f_g*, s10 and s11 oracle
  * gates pin the outputs cross-engine.
  */
object GeomFunctions {

  // The expressions require exact array<double>/double inputs; these
  // casts reproduce the implicit coercion the UDF signatures got for
  // free and are no-ops (removed by Catalyst) when types already match.
  private def arr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    expression(c.cast("array<double>"))
  private def dbl(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    expression(c.cast("double"))

  /** F-G5 (xmin, ymin, w, h) from a flat polygon. */
  def segmentation2bbox(seg: Column): Column = column(Seg2BboxF(arr(seg)))

  /** F-G6 [x,y,w,h] → open 8-coord rectangle. */
  def aabb2poly(aabb: Column): Column = column(Aabb2PolyF(arr(aabb)))

  /** F-G7 CVAT [l,t,r,b] → closed polygon. */
  def rectToPolygon(pts: Column): Column = column(RectToPolyF(arr(pts)))

  /** F-G1 rcoco [x,y,w,h,theta] or null on degenerate input (P9 guard). */
  def rbbFromSeg(seg: Column): Column = column(RbbFromSegF(arr(seg)))

  /** F-G1 coco [xmin,ymin,w,h] or null on degenerate input. */
  def cocoFromSeg(seg: Column): Column = column(CocoFromSegF(arr(seg)))

  /** F-G1 struct(rcoco, coco) from ONE calipers run — use this when a
    * projection needs both outputs; the separate functions each run
    * the full kernel.
    */
  def rbbCoco(seg: Column): Column = column(RbbCocoF(arr(seg)))

  /** F-G8 YOLO center-format bbox normalized to the canvas. */
  def yoloBbox(width: Column, height: Column, seg: Column): Column =
    column(YoloBboxF(dbl(width), dbl(height), arr(seg)))

  /** F-G8 normalized flat coordinate list. */
  def yoloSegmentation(width: Column, height: Column, seg: Column): Column =
    column(YoloSegF(dbl(width), dbl(height), arr(seg)))
}
