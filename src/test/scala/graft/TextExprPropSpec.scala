package graft

import graft.functions.TextSketches
import graft.plans.{MinhashSigF, ShinglesF, SimhashF, TextKernels}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven parity for the text-sketch adapter layer
  * (TextKernels / the native expressions) against the pure kernels and
  * the former UDFs' semantics, over arbitrary strings — unicode,
  * empty tokens from repeated separators, leading/trailing spaces —
  * the shapes the fixed-case TextExprSpec can't sweep.
  */
class TextExprPropSpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // tokens incl. empties and non-ASCII; joined with single spaces the
  // way the kernels split
  private val token: Gen[String] =
    Gen.oneOf(Gen.const(""), Gen.alphaNumStr.map(_.take(6)),
      Gen.const("héllo"), Gen.const("၀0"), Gen.const("日本語"))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, token).map(_.mkString(" ")))

  /** Reference shingling — the former UDF body, verbatim. */
  private def refShingles(text: String): Seq[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) Seq.empty
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + 2 < toks.length) {
        seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
  }

  private def strArray(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  private def litStr(s: String) = Literal.create(UTF8String.fromString(s), StringType)

  test("ShinglesF == the former UDF on arbitrary text") {
    check("shingles", Prop.forAllNoShrink(textGen) { text =>
      strArray(ShinglesF(litStr(text)).eval(null).asInstanceOf[ArrayData]) ==
        refShingles(text)
    })
  }

  test("MinhashSigF == kernel over the expression's own shingles") {
    check("minhash", Prop.forAllNoShrink(textGen) { text =>
      val sh = refShingles(text)
      val in = new GenericArrayData(
        sh.map(s => UTF8String.fromString(s)).toArray[Any])
      val got = MinhashSigF(
        Literal.create(in, ArrayType(StringType)), 8).eval(null)
      if (sh.isEmpty) got == null
      else strArray(got.asInstanceOf[ArrayData]) ==
        TextSketches.minhashSignature(sh, 8)
    })
  }

  test("SimhashF == kernel on arbitrary token lists; null → 0") {
    val tokensGen = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, token))
    check("simhash", Prop.forAllNoShrink(tokensGen) { toks =>
      val in = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      SimhashF(Literal.create(in, ArrayType(StringType))).eval(null) ==
        TextSketches.simhash(toks)
    })
    assert(SimhashF(Literal.create(null, ArrayType(StringType))).eval(null) == 0L)
    assert(TextKernels.simhash(new GenericArrayData(new Array[Any](0))) == 0L)
  }
}
