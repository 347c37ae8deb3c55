package graft

import graft.functions.Geometry
import graft.plans.{CocoFromSegF, GeomKernels, RbbFromSegF, Seg2BboxF, YoloBboxF}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven parity for the ArrayData adapter layer behind the
  * native geometry expressions: for ARBITRARY double arrays (including
  * empty, odd-length, sub-minimum and degenerate ones) the expression's
  * interpreted eval must agree element-for-element with the raw Scala
  * kernel plus the former UDFs' null guards. This is the layer the
  * fixed-case GeomExprSpec can't sweep — the guards and the
  * ArrayData→Array→UnsafeArrayData round-trip.
  */
class GeomExprPropSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val coord = Gen.chooseNum(-1000.0, 1000.0)
  // any even OR odd length 0..24, so the <2/<4/<5 guards all get hit
  private val rawArray: Gen[Array[Double]] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, coord).map(_.toArray))

  private def lit(a: Array[Double]) =
    Literal.create(a, ArrayType(DoubleType, containsNull = false))

  private def asArr(v: Any): Array[Double] =
    if (v == null) null else v.asInstanceOf[ArrayData].toDoubleArray()

  private def same(a: Array[Double], b: Array[Double]): Boolean =
    (a == null && b == null) || (a != null && b != null && java.util.Arrays.equals(a, b))

  test("seg2bbox expression == kernel + guard on arbitrary arrays") {
    check("seg2bbox", Prop.forAllNoShrink(rawArray) { a =>
      val expected = if (a.length < 2) null else Geometry.segmentation2bbox(a)
      same(asArr(Seg2BboxF(lit(a)).eval(null)), expected)
    })
  }

  test("rbb/coco-from-seg expression == kernel + guard on arbitrary arrays") {
    check("rbbcoco", Prop.forAllNoShrink(rawArray) { a =>
      val exp = if (a.length < 5) None else Geometry.rbbCocoFromSeg(a)
      same(asArr(RbbFromSegF(lit(a)).eval(null)),
        exp.flatMap(e => Option(e._1)).orNull) &&
      same(asArr(CocoFromSegF(lit(a)).eval(null)),
        exp.flatMap(e => Option(e._2)).orNull)
    })
  }

  test("yoloBbox expression == kernel + guards incl non-positive canvas") {
    val g = for {
      a <- rawArray
      w <- Gen.oneOf(Gen.const(0.0), Gen.const(-3.0), Gen.chooseNum(1.0, 2000.0))
      h <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(1.0, 2000.0))
    } yield (a, w, h)
    check("yolo", Prop.forAllNoShrink(g) { case (a, w, h) =>
      // guard strengthened to < 2: a malformed 1-element seg crashed
      // the kernel under the former UDF's isEmpty-only guard
      val expected =
        if (a.length < 2 || w <= 0 || h <= 0) null else Geometry.yoloBbox(w, h, a)
      same(asArr(YoloBboxF(Literal(w), Literal(h), lit(a)).eval(null)), expected)
    })
  }

  test("GeomKernels round-trips UnsafeArrayData losslessly") {
    check("roundtrip", Prop.forAllNoShrink(rawArray.suchThat(_.length >= 2)) { a =>
      // seg2bbox of a bbox's own poly re-derives the bbox: exercises
      // write-then-read of the Unsafe array across two adapter calls
      val bbox = asArr(Seg2BboxF(lit(a)).eval(null))
      val poly = GeomKernels.aabb2poly(ArrayData.toArrayData(bbox))
      bbox.length == 4 && poly.numElements() == 8
    })
  }
}
