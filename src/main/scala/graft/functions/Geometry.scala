package graft.functions

/** Geometry kernels — Spark-native re-expression of the reference's
  * shapely/numpy compute layer (ref: COCOUtils.py:8-101,
  * CvatApi.py:317-325, create_yolo_from_feather.py:9-23).
  *
  * Pure deterministic Scala so the functions can be unit/property tested
  * in isolation and registered as UDFs (GeomFunctions); the min-rotated-
  * rectangle replaces shapely's `minimum_rotated_rectangle` with a convex
  * hull + rotating-calipers implementation (no JTS offline).
  *
  * Deviation (documented): shapely's corner ordering for the min rect is
  * a GEOS implementation detail; we emit corners counter-clockwise
  * starting from the lexicographically smallest corner, closed (first
  * point repeated). Downstream `corners2rotatedbbox` permutes corners
  * anyway (COCOUtils.py:51-52), so the rectangle semantics are identical.
  */
object Geometry {

  type Pt = (Double, Double)

  /** De-interleave [x0,y0,x1,y1,...] into points (COCOUtils.py:18-21). */
  def toPoints(seg: Array[Double]): Array[Pt] =
    Array.tabulate(seg.length / 2)(i => (seg(2 * i), seg(2 * i + 1)))

  /** F-G5 segmentation2bbox (COCOUtils.py:82-89): (xmin, ymin, w, h). */
  def segmentation2bbox(seg: Array[Double]): Array[Double] = {
    val pts = toPoints(seg)
    val xmin = pts.map(_._1).min; val xmax = pts.map(_._1).max
    val ymin = pts.map(_._2).min; val ymax = pts.map(_._2).max
    Array(xmin, ymin, xmax - xmin, ymax - ymin)
  }

  /** F-G6 aabb2poly (COCOUtils.py:91-101): [x,y,w,h] → 8-coord rect. */
  def aabb2poly(aabb: Array[Double]): Array[Double] = {
    val Array(x, y, w, h) = aabb.take(4)
    Array(x, y, x + w, y, x + w, y + h, x, y + h)
  }

  /** F-G7 rect_to_polygon (CvatApi.py:317-325): CVAT [l,t,r,b] →
    * closed 10-coord polygon TL,TR,BR,BL,TL.
    */
  def rectToPolygon(points: Array[Double]): Array[Double] = {
    val Array(l, t, r, b) = points.take(4)
    Array(l, t, r, t, r, b, l, b, l, t)
  }

  /** F-G3 calc_bearing (COCOUtils.py:28-37). */
  def calcBearing(p0: Pt, p1: Pt): Double = {
    var theta = math.atan2(p1._2 - p0._2, p1._1 - p0._1)
    if (theta > math.Pi) theta -= 2 * math.Pi
    if (theta < -math.Pi) theta += 2 * math.Pi
    theta
  }

  /** F-G3 _corners2rotatedbbox (COCOUtils.py:40-48): 4 corners →
    * [x, y, w, h, theta] in the NVIDIA ODTK convention.
    */
  def cornersToRbbRaw(corners: Array[Pt]): Array[Double] = {
    val n = corners.length
    val cx = corners.map(_._1).sum / n
    val cy = corners.map(_._2).sum / n
    val theta = calcBearing(corners(0), corners(1))
    val (cos, sin) = (math.cos(theta), math.sin(theta))
    // row-vector × [[cos,-sin],[sin,cos]] as in the reference's matmul
    def rot(p: Pt): Pt = {
      val (px, py) = (p._1 - cx, p._2 - cy)
      (px * cos + py * sin + cx, -px * sin + py * cos + cy)
    }
    val out = corners.map(rot)
    val (x, y) = out(0)
    Array(x, y, out(2)._1 - out(0)._1, out(2)._2 - out(0)._2, theta)
  }

  /** F-G4 corners2rotatedbbox (COCOUtils.py:50-80): permutation search
    * over the closed corner list until w,h > 0, with min_hw/min_area
    * clamping preserved exactly (including the 0.1 floor and sqrt
    * rescale). Returns None only when filterSmall exhausts every
    * permutation (the reference's implicit-None path, :74-80).
    */
  def corners2rotatedbbox(closedCorners: Array[Pt], minArea: Double = 4.0,
                          minHw: Double = 1.0, filterSmall: Boolean = false): Option[Array[Double]] = {
    val n = closedCorners.length
    var idx = 0
    while (idx < n - 1) {
      val permuted = closedCorners.slice(idx, n - 1) ++ closedCorners.slice(0, idx)
      val raw = cornersToRbbRaw(permuted)
      val Array(xmin, ymin, origW, origH, theta) = raw
      var w = origW; var h = origH
      if (w > 0 && h > 0) {
        if (w < minHw || h < minHw || w * h < minArea) {
          if (filterSmall) { idx += 1 }
          else {
            w = math.max(0.1, w); h = math.max(0.1, h)
            if (w * h < minArea) {
              val scale = math.sqrt(minArea / w / h)
              w *= scale; h *= scale
            }
            w = math.max(minHw, w); h = math.max(minHw, h)
            return Some(Array(xmin, ymin, w, h, theta))
          }
        } else return Some(Array(xmin, ymin, w, h, theta))
      } else idx += 1
    }
    // loop exhausted (ref :74-80): recompute on the unpermuted corners
    val raw = cornersToRbbRaw(closedCorners.dropRight(1))
    if (!filterSmall) {
      val w = math.max(minHw, raw(2)); val h = math.max(minHw, raw(3))
      Some(Array(raw(0), raw(1), w, h, raw(4)))
    } else None
  }

  /** Monotone-chain convex hull, CCW, no duplicate endpoint. Collinear
    * points on the hull boundary are dropped (strict turns).
    */
  def convexHull(points: Array[Pt]): Array[Pt] = {
    val pts = points.distinct.sorted
    if (pts.length <= 2) return pts
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Array[Pt]): Array[Pt] = {
      val st = scala.collection.mutable.ArrayBuffer[Pt]()
      for (p <- ps) {
        while (st.length >= 2 && cross(st(st.length - 2), st.last, p) <= 0)
          st.remove(st.length - 1)
        st += p
      }
      st.toArray
    }
    val lower = half(pts)
    val upper = half(pts.reverse)
    lower.dropRight(1) ++ upper.dropRight(1)
  }

  /** F-G2 min rotated rectangle (replaces shapely
    * `minimum_rotated_rectangle`, COCOUtils.py:17-26): rotating calipers
    * over the convex hull. Returns the 5 closed exterior corners (CCW
    * from the lexicographically smallest), or None for degenerate input
    * (all points collinear — shapely's no-`exterior` path, :24-25).
    */
  def minRotatedRect(seg: Array[Double]): Option[Array[Pt]] = {
    val hull = convexHull(toPoints(seg))
    if (hull.length < 3) return None
    var best = Double.MaxValue
    var bestCorners: Array[Pt] = null
    var i = 0
    while (i < hull.length) {
      val p0 = hull(i); val p1 = hull((i + 1) % hull.length)
      val len = math.hypot(p1._1 - p0._1, p1._2 - p0._2)
      if (len > 0) {
        val ux = (p1._1 - p0._1) / len; val uy = (p1._2 - p0._2) / len
        // left normal (90° CCW)
        val nx = -uy; val ny = ux
        var smin = Double.MaxValue; var smax = Double.MinValue
        var tmin = Double.MaxValue; var tmax = Double.MinValue
        for ((x, y) <- hull) {
          val s = x * ux + y * uy; val t = x * nx + y * ny
          if (s < smin) smin = s; if (s > smax) smax = s
          if (t < tmin) tmin = t; if (t > tmax) tmax = t
        }
        val area = (smax - smin) * (tmax - tmin)
        if (area < best) {
          best = area
          def corner(s: Double, t: Double): Pt = (ux * s + nx * t, uy * s + ny * t)
          // CCW because n is the left normal of u
          bestCorners = Array(corner(smin, tmin), corner(smax, tmin),
                              corner(smax, tmax), corner(smin, tmax))
        }
      }
      i += 1
    }
    if (bestCorners == null) return None
    val start = bestCorners.zipWithIndex.minBy(_._1)._2
    val rotated = Array.tabulate(4)(k => bestCorners((start + k) % 4))
    Some(rotated :+ rotated(0))
  }

  /** F-G1 rbb_coco_from_seg (COCOUtils.py:8-15): polygon → (rcoco[5],
    * coco[4]); None on degenerate input.
    */
  def rbbCocoFromSeg(seg: Array[Double], minArea: Double = 4.0, minHw: Double = 1.0,
                     filterSmall: Boolean = false): Option[(Array[Double], Array[Double])] =
    minRotatedRect(seg).flatMap { corners =>
      corners2rotatedbbox(corners, minArea, minHw, filterSmall)
        .map(rcoco => (rcoco, segmentation2bbox(seg)))
    }

  /** F-G8 make_bbox (create_yolo_from_feather.py:13-23): polygon →
    * YOLO center-format bbox normalized to image size.
    */
  def yoloBbox(width: Double, height: Double, seg: Array[Double]): Array[Double] = {
    val pts = toPoints(seg).map { case (x, y) => (x / width, y / height) }
    val x1 = pts.map(_._1).min; val x2 = pts.map(_._1).max
    val y1 = pts.map(_._2).min; val y2 = pts.map(_._2).max
    Array((x1 + x2) / 2, (y2 + y1) / 2, x2 - x1, y2 - y1)
  }

  /** F-G8 make_segmentation (create_yolo_from_feather.py:9-11):
    * normalized flat coord list.
    */
  def yoloSegmentation(width: Double, height: Double, seg: Array[Double]): Array[Double] =
    Array.tabulate(seg.length)(i => if (i % 2 == 0) seg(i) / width else seg(i) / height)
}
