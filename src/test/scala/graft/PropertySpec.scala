package graft

import graft.functions.{Geometry, TextSketches}
import graft.operators.TrackInterpolation
import graft.operators.TrackInterpolation.TrackShape
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property suite (SURVEY §5.3): generator-driven invariants
  * for the custom kernels, complementing the golden vectors. (Raw
  * scalacheck — the scalatestplus bridge isn't in the offline cache.)
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val coord = Gen.chooseNum(-1000.0, 1000.0)
  private val polygonGen: Gen[Array[Double]] =
    Gen.chooseNum(3, 16).flatMap(n => Gen.listOfN(2 * n, coord).map(_.toArray))

  test("segmentation2bbox bounds contain every vertex (F-G5)") {
    check("bbox-contains", Prop.forAllNoShrink(polygonGen) { seg =>
      val Array(xmin, ymin, w, h) = Geometry.segmentation2bbox(seg)
      val pts = Geometry.toPoints(seg)
      // tolerance: xmin + (xmax - xmin) can round strictly below xmax
      val eps = 1e-9 * 2000
      w >= 0 && h >= 0 && pts.forall { case (x, y) =>
        x >= xmin && x <= xmin + w + eps && y >= ymin && y <= ymin + h + eps
      }
    })
  }

  test("aabb2poly corners reproduce the box extents (F-G6)") {
    val g = for {
      x <- coord; y <- coord
      w <- Gen.chooseNum(0.0, 500.0); h <- Gen.chooseNum(0.0, 500.0)
    } yield (x, y, w, h)
    check("aabb-roundtrip", Prop.forAllNoShrink(g) { case (x, y, w, h) =>
      val back = Geometry.segmentation2bbox(Geometry.aabb2poly(Array(x, y, w, h)))
      math.abs(back(0) - x) < 1e-9 && math.abs(back(2) - w) < 1e-9 &&
        math.abs(back(1) - y) < 1e-9 && math.abs(back(3) - h) < 1e-9
    })
  }

  test("min rotated rect area never exceeds the axis-aligned bbox area (F-G2)") {
    check("calipers-minimal", Prop.forAllNoShrink(polygonGen) { seg =>
      Geometry.minRotatedRect(seg).forall { corners =>
        val e = (corners(1)._1 - corners(0)._1, corners(1)._2 - corners(0)._2)
        val f = (corners(3)._1 - corners(0)._1, corners(3)._2 - corners(0)._2)
        val rectArea = math.hypot(e._1, e._2) * math.hypot(f._1, f._2)
        val Array(_, _, w, h) = Geometry.segmentation2bbox(seg)
        rectArea <= w * h * (1 + 1e-9) + 1e-9
      }
    })
  }

  test("md5 split hex-string compare equals numeric bucket compare (SP)") {
    check("split-compare", Prop.forAllNoShrink(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { key =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 3)
      val bucket = Integer.parseInt(md5, 16)
      val numeric =
        if (bucket < 409) "val" else if (bucket < 819) "test" else "train"
      val viaStrings =
        if (md5 < f"${409}%03x") "val" else if (md5 < f"${819}%03x") "test" else "train"
      viaStrings == numeric
    })
  }

  test("simhash: single-token change stays in a small hamming ball") {
    val tokGen = Gen.listOfN(60, Gen.identifier.suchThat(_.nonEmpty))
    check("simhash-locality", Prop.forAllNoShrink(tokGen) { toks =>
      toks.size != 60 || {
        val base = TextSketches.simhash(toks)
        val d1 = java.lang.Long.bitCount(base ^ TextSketches.simhash(toks.updated(0, "swapped-a")))
        d1 <= 20
      }
    }, min = 50)
  }

  test("graft_nearest_cell matches a brute-force argmax with NaN/tie rules") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
    // zeros are likely, so zero-norm vectors (NaN scores) are exercised
    val fgen = Gen.frequency(3 -> Gen.chooseNum(-10.0f, 10.0f), 1 -> Gen.const(0.0f))
    val g = for {
      dim <- Gen.chooseNum(1, 6)
      k <- Gen.chooseNum(1, 12)
      vec <- Gen.listOfN(dim, fgen)
      cents <- Gen.listOfN(k, Gen.listOfN(dim, fgen))
    } yield (vec, cents)
    check("nearest-cell", Prop.forAllNoShrink(g) { case (vec, cents) =>
      val e = graft.plans.NearestCellF(
        Literal.create(vec, ArrayType(FloatType)),
        Literal.create(cents, ArrayType(ArrayType(FloatType))),
        Literal.create(cents.indices.toList, ArrayType(IntegerType)))
      val got = e.eval(null).asInstanceOf[Int]
      // SPEC-derived oracle (not the expression's loop): argmax under
      // the documented ordering — NaN ranks above every number, ties
      // go to the lowest cell — expressed as a lexicographic max over
      // (isNaN, score, -index) so a drift in the kernel's conditional
      // cannot be self-confirming
      def norm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nv = norm(vec)
      val scores = cents.map { c =>
        vec.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum / (nv * norm(c))
      }
      // normalize -0.0 to 0.0: the spec ordering treats IEEE-equal
      // zeros as a tie (lowest cell), like Spark's double comparison
      val bi = scores.map(s => if (s == 0.0) 0.0 else s).zipWithIndex
        .maxBy { case (s, i) => (s.isNaN, s, -i) }._2
      got == bi
    })
  }

  test("interpolation covers exactly [first, end) and preserves keyframes") {
    val frameGaps = Gen.listOfN(3, Gen.chooseNum(1, 5))
    check("interp-frames", Prop.forAllNoShrink(frameGaps) { gaps =>
      val frames = gaps.scanLeft(0)(_ + _)
      val shapes = frames.map(f => TrackShape(f, "polygon",
        Array(0.0 + f, 0.0, 10.0 + f, 0.0, 10.0 + f, 8.0, 0.0 + f, 8.0),
        outside = false, keyframe = false, Nil))
      val end = frames.max + 2
      val out = TrackInterpolation.interpolateShapes(0, shapes, end)
      out.map(_.frame) == (frames.head until end).toList &&
        frames.forall { f =>
          val k = out.find(_.frame == f).get
          k.keyframe && k.points(0) == 0.0 + f
        }
    }, min = 50)
  }
}
