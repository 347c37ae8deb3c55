package graft

import graft.functions.Geometry
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Geometry kernels vs golden vectors minted by EXECUTING the reference's
  * own Python (tools/mint_geometry_golden.py → geometry_golden.json), plus
  * property tests for the rotating-calipers min rotated rectangle that
  * replaces shapely (which has no goldens mintable offline).
  */
class GeometrySpec extends AnyFunSuite {

  private val root: JsonNode = {
    val mapper = new ObjectMapper()
    mapper.readTree(new java.io.File("src/test/resources/geometry_golden.json"))
  }

  private def darr(n: JsonNode): Array[Double] =
    n.elements().asScala.map(_.asDouble()).toArray

  private def pts(n: JsonNode): Array[Geometry.Pt] =
    n.elements().asScala.map(p => (p.get(0).asDouble(), p.get(1).asDouble())).toArray

  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def closeArr(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => close(x, y) }

  test("calc_bearing matches reference goldens") {
    for (c <- root.get("corner_cases").elements().asScala) {
      val corners = pts(c.get("corners"))
      assert(close(Geometry.calcBearing(corners(0), corners(1)), c.get("bearing").asDouble()))
    }
  }

  test("_corners2rotatedbbox matches reference goldens") {
    for (c <- root.get("corner_cases").elements().asScala) {
      val corners = pts(c.get("corners"))
      val got = Geometry.cornersToRbbRaw(corners.dropRight(1))
      assert(closeArr(got, darr(c.get("raw"))), s"got ${got.toSeq} want ${darr(c.get("raw")).toSeq}")
    }
  }

  test("corners2rotatedbbox (incl. clamp paths) matches reference goldens") {
    for (c <- root.get("corner_cases").elements().asScala) {
      val corners = pts(c.get("corners"))
      val got = Geometry.corners2rotatedbbox(corners)
      val want = Option(c.get("rbb")).filter(!_.isNull).map(darr)
      (got, want) match {
        case (Some(g), Some(w)) => assert(closeArr(g, w), s"got ${g.toSeq} want ${w.toSeq}")
        case (None, None) =>
        case other => fail(s"mismatch: $other")
      }
    }
  }

  test("corners2rotatedbbox filter_small=true matches reference goldens") {
    for (c <- root.get("corner_cases").elements().asScala) {
      val corners = pts(c.get("corners"))
      val got = Geometry.corners2rotatedbbox(corners, filterSmall = true)
      val want = Option(c.get("rbb_filter_small")).filter(!_.isNull).map(darr)
      (got, want) match {
        case (Some(g), Some(w)) => assert(closeArr(g, w), s"got ${g.toSeq} want ${w.toSeq}")
        case (None, None) =>
        case other => fail(s"mismatch: $other")
      }
    }
  }

  test("segmentation2bbox and aabb2poly match reference goldens") {
    for (c <- root.get("seg_cases").elements().asScala)
      assert(closeArr(Geometry.segmentation2bbox(darr(c.get("seg"))), darr(c.get("bbox"))))
    for (c <- root.get("aabb_cases").elements().asScala)
      assert(closeArr(Geometry.aabb2poly(darr(c.get("aabb"))), darr(c.get("poly"))))
  }

  // ---- min rotated rect properties (shapely replacement, F-G2) ----

  private def randSeg(rnd: Random, n: Int): Array[Double] =
    Array.fill(2 * n)(rnd.nextDouble() * 200 - 100)

  test("minRotatedRect: closed CCW rectangle containing every input point") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val seg = randSeg(rnd, 3 + rnd.nextInt(18))
      val rect = Geometry.minRotatedRect(seg)
      assert(rect.isDefined, s"unexpected degenerate for ${seg.toSeq}")
      val corners = rect.get
      assert(corners.length == 5 && corners(0) == corners(4))
      // right angles: adjacent edges orthogonal
      for (i <- 0 until 3) {
        val e1 = (corners(i + 1)._1 - corners(i)._1, corners(i + 1)._2 - corners(i)._2)
        val e2 = (corners(i + 2)._1 - corners(i + 1)._1, corners(i + 2)._2 - corners(i + 1)._2)
        assert(math.abs(e1._1 * e2._1 + e1._2 * e2._2) < 1e-6 * (math.hypot(e1._1, e1._2) * math.hypot(e2._1, e2._2) + 1))
      }
      // CCW: shoelace positive
      val area2 = (0 until 4).map { i =>
        corners(i)._1 * corners(i + 1)._2 - corners(i + 1)._1 * corners(i)._2
      }.sum
      assert(area2 > 0, "corners not CCW")
      // containment: every point inside (project onto the rect's axes)
      val (ox, oy) = corners(0)
      val u = (corners(1)._1 - ox, corners(1)._2 - oy)
      val v = (corners(3)._1 - ox, corners(3)._2 - oy)
      val lu = u._1 * u._1 + u._2 * u._2
      val lv = v._1 * v._1 + v._2 * v._2
      for ((x, y) <- Geometry.toPoints(seg)) {
        val du = ((x - ox) * u._1 + (y - oy) * u._2) / lu
        val dv = ((x - ox) * v._1 + (y - oy) * v._2) / lv
        assert(du > -1e-7 && du < 1 + 1e-7 && dv > -1e-7 && dv < 1 + 1e-7,
          s"point ($x,$y) outside rect ${corners.toSeq}")
      }
    }
  }

  test("minRotatedRect: area is minimal across a dense angle sweep") {
    val rnd = new Random(11)
    for (_ <- 1 to 50) {
      val seg = randSeg(rnd, 4 + rnd.nextInt(10))
      val corners = Geometry.minRotatedRect(seg).get
      val e = (corners(1)._1 - corners(0)._1, corners(1)._2 - corners(0)._2)
      val f = (corners(3)._1 - corners(0)._1, corners(3)._2 - corners(0)._2)
      val area = math.hypot(e._1, e._2) * math.hypot(f._1, f._2)
      val pts = Geometry.toPoints(seg)
      for (k <- 0 until 360) {
        val th = k * math.Pi / 360
        val (c, s) = (math.cos(th), math.sin(th))
        val ss = pts.map { case (x, y) => x * c + y * s }
        val tt = pts.map { case (x, y) => -x * s + y * c }
        val sweep = (ss.max - ss.min) * (tt.max - tt.min)
        assert(area <= sweep + 1e-6 * math.max(1, sweep),
          s"angle $th gives smaller rect: $sweep < $area")
      }
    }
  }

  test("minRotatedRect: degenerate (collinear / too few points) → None") {
    assert(Geometry.minRotatedRect(Array(0, 0, 1, 1, 2, 2, 3, 3)).isEmpty)
    assert(Geometry.minRotatedRect(Array(0, 0, 5, 0, 10, 0)).isEmpty)
    assert(Geometry.minRotatedRect(Array(1, 1, 1, 1)).isEmpty)
    assert(Geometry.minRotatedRect(Array(1, 2)).isEmpty)
  }

  test("rbbCocoFromSeg composes: rect input round-trips its own bbox") {
    val seg = Array[Double](0, 0, 10, 0, 10, 6, 0, 6)
    val Some((rcoco, coco)) = Geometry.rbbCocoFromSeg(seg)
    assert(coco.toSeq == Seq(0.0, 0.0, 10.0, 6.0))
    // axis-aligned 10x6 rect: rotated w*h must equal 60 regardless of corner order
    assert(close(math.abs(rcoco(2) * rcoco(3)), 60.0, 1e-9))
  }
}
