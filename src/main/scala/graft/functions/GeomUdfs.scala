package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Spark UDF registrations for the Geometry kernels.
  *
  * Scalar UDFs sit outside whole-stage codegen; these are deliberately
  * tiny, allocation-light, and applied after filters/projections so the
  * non-codegen island stays narrow. Promotion to Catalyst Expressions is
  * the optimization path if they ever dominate a profile.
  */
object GeomUdfs {

  val segmentation2bbox: UserDefinedFunction =
    udf((seg: Seq[Double]) =>
      if (seg == null || seg.length < 2) null
      else Geometry.segmentation2bbox(seg.toArray))

  val aabb2poly: UserDefinedFunction =
    udf((aabb: Seq[Double]) =>
      if (aabb == null || aabb.length < 4) null
      else Geometry.aabb2poly(aabb.toArray))

  val rectToPolygon: UserDefinedFunction =
    udf((pts: Seq[Double]) =>
      if (pts == null || pts.length < 4) null
      else Geometry.rectToPolygon(pts.toArray))

  /** rcoco [x,y,w,h,theta] or null on degenerate input (P9 guard). */
  val rbbFromSeg: UserDefinedFunction =
    udf((seg: Seq[Double]) =>
      if (seg == null || seg.length < 5) null
      else Geometry.rbbCocoFromSeg(seg.toArray).map(_._1).orNull)

  /** coco [xmin,ymin,w,h] or null on degenerate input. */
  val cocoFromSeg: UserDefinedFunction =
    udf((seg: Seq[Double]) =>
      if (seg == null || seg.length < 5) null
      else Geometry.rbbCocoFromSeg(seg.toArray).map(_._2).orNull)

  val yoloBbox: UserDefinedFunction =
    udf((width: Double, height: Double, seg: Seq[Double]) =>
      if (seg == null || seg.isEmpty || width <= 0 || height <= 0) null
      else Geometry.yoloBbox(width, height, seg.toArray))

  val yoloSegmentation: UserDefinedFunction =
    udf((width: Double, height: Double, seg: Seq[Double]) =>
      if (seg == null || width <= 0 || height <= 0) null
      else Geometry.yoloSegmentation(width, height, seg.toArray))
}
