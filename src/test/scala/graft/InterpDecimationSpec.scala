package graft

import graft.operators.TrackInterpolation
import graft.operators.TrackInterpolation.TrackShape
import org.scalatest.funsuite.AnyFunSuite

/** Decimation subclass used by the `interp_decimation` gate, verified
  * directly against the kernel: a FIXED 16×8 rectangle sampled densely
  * (bottom edge subdivided every 4 units → 7 points) on one keyframe
  * and coarsely (4 corners) on the other, translating between
  * positions. The asymmetric sampling makes the arc-length matching
  * non-trivial (runs of dense points share one coarse match), so
  * reduce_interpolation's interior-drop loop AND its 2-point collapse
  * both engage — the code paths the translation-only rect gate
  * (identity matching → per-point emission) never reaches.
  *
  * With keyframe gap 5 (t = g/5) every keep/drop comparison sits at
  * least 1/15 away from its threshold, so IEEE rounding can never flip
  * a branch, and every surviving coordinate is an exact-integer lerp
  * (plus one exact midpoint average) that DuckDB reproduces — the
  * numbers asserted here are the ones the gate's oracle SQL computes.
  */
class InterpDecimationSpec extends AnyFunSuite {

  private def dense(x: Double, y: Double) = Array(
    x, y, x + 4, y, x + 8, y, x + 12, y, x + 16, y,
    x + 16, y + 8, x, y + 8)
  private def coarse(x: Double, y: Double) = Array(
    x, y, x + 16, y, x + 16, y + 8, x, y + 8)

  private def shape(frame: Int, pts: Array[Double]) =
    TrackShape(frame, "polygon", pts, outside = false, keyframe = false, Seq.empty)

  private def run(left: Array[Double], right: Array[Double]) =
    TrackInterpolation.interpolateShapes(0,
      Seq(shape(0, left), shape(5, right)), endFrame = 5)
      .filter(!_.keyframe).map(s => s.frame -> s.points).toMap

  test("dense→coarse: interior drop + pair collapse at g=4 only") {
    val (ax, ay, bx, by) = (7.0, 3.0, 30.0, 19.0)
    val out = run(dense(ax, ay), coarse(bx, by))
    assert(out.keySet == Set(1, 2, 3, 4))
    // g=1..3: all 7 matched points survive (interior spacing ≥ threshold)
    for (g <- 1 to 3) {
      val t = g.toDouble / 5
      val yb = ay + (by - ay) * t
      val yt = (ay + 8) + (by - ay) * t
      val exp = Array(
        ax + (bx - ax) * t, yb,
        (ax + 4) + (bx - (ax + 4)) * t, yb,
        (ax + 8) + (bx - (ax + 8)) * t, yb,
        (ax + 12) + ((bx + 16) - (ax + 12)) * t, yb,
        (ax + 16) + (bx - ax) * t, yb,
        (ax + 16) + (bx - ax) * t, yt,
        ax + (bx - ax) * t, yt)
      assert(out(g).toSeq == exp.toSeq, s"g=$g")
    }
    // g=4: bottom-edge interior point decimated (spacing 4(1-t) < w/8
    // threshold region) and the (12,16)-pair collapses to its average
    val t = 4.0 / 5
    val yb = ay + (by - ay) * t
    val yt = (ay + 8) + (by - ay) * t
    val i3 = (ax + 12) + ((bx + 16) - (ax + 12)) * t
    val i4 = (ax + 16) + (bx - ax) * t
    val exp4 = Array(
      ax + (bx - ax) * t, yb,
      (ax + 8) + (bx - (ax + 8)) * t, yb,
      (i3 + i4) / 2, yb,
      (ax + 16) + (bx - ax) * t, yt,
      ax + (bx - ax) * t, yt)
    assert(out(4).toSeq == exp4.toSeq)
  }

  test("coarse→dense: mirror — collapse at g=1, full at g≥2") {
    val (ax, ay, bx, by) = (11.0, 6.0, 2.0, 27.0)
    val out = run(coarse(ax, ay), dense(bx, by))
    assert(out.keySet == Set(1, 2, 3, 4))
    for (g <- 2 to 4) {
      val t = g.toDouble / 5
      val yb = ay + (by - ay) * t
      val yt = (ay + 8) + (by - ay) * t
      val exp = Array(
        ax + (bx - ax) * t, yb,
        ax + ((bx + 4) - ax) * t, yb,
        ax + ((bx + 8) - ax) * t, yb,
        (ax + 16) + ((bx + 12) - (ax + 16)) * t, yb,
        (ax + 16) + (bx - ax) * t, yb,
        (ax + 16) + (bx - ax) * t, yt,
        ax + (bx - ax) * t, yt)
      assert(out(g).toSeq == exp.toSeq, s"g=$g")
    }
    val t = 1.0 / 5
    val yb = ay + (by - ay) * t
    val yt = (ay + 8) + (by - ay) * t
    val i3 = (ax + 16) + ((bx + 12) - (ax + 16)) * t
    val i4 = (ax + 16) + (bx - ax) * t
    val exp1 = Array(
      ax + (bx - ax) * t, yb,
      ax + ((bx + 8) - ax) * t, yb,
      (i3 + i4) / 2, yb,
      (ax + 16) + (bx - ax) * t, yt,
      ax + (bx - ax) * t, yt)
    assert(out(1).toSeq == exp1.toSeq)
  }
}
