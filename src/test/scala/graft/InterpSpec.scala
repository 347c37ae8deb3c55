package graft

import graft.operators.TrackInterpolation
import graft.operators.TrackInterpolation.TrackShape
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Track-interpolation port vs golden vectors minted by EXECUTING the
  * reference's interpolate_shapes (tools/mint_interp_golden.py) — covers
  * interpolation, point matching/reduction (unequal point counts),
  * outside-keyframe breaks, end_frame clipping, trailing propagation,
  * and attribute forward-propagation.
  */
class InterpSpec extends AnyFunSuite {

  private val cases: Seq[JsonNode] = {
    val mapper = new ObjectMapper()
    mapper.readTree(new java.io.File("src/test/resources/interp_golden.json"))
      .elements().asScala.toSeq
  }

  private def parseShape(n: JsonNode): TrackShape =
    TrackShape(
      frame = n.get("frame").asInt(),
      shapeType = Option(n.get("type")).map(_.asText()).getOrElse("polygon"),
      points = n.get("points").elements().asScala.map(_.asDouble()).toArray,
      outside = n.get("outside").asBoolean(),
      keyframe = Option(n.get("keyframe")).exists(_.asBoolean()),
      attributes = Option(n.get("attributes")).map(_.elements().asScala.map(a =>
        (a.get("spec_id").asInt(), a.get("value").asText())).toSeq).getOrElse(Nil))

  private def close(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("interpolateShapes matches the reference on all golden cases") {
    for ((c, ci) <- cases.zipWithIndex) {
      val in = c.get("shapes_in").elements().asScala.map(parseShape).toSeq
      val want = c.get("result").elements().asScala.map(parseShape).toSeq
      val got = TrackInterpolation.interpolateShapes(
        c.get("track_frame").asInt(), in, c.get("end_frame").asInt())
      assert(got.length == want.length,
        s"case ${ci + 1}: ${got.length} shapes, want ${want.length} " +
          s"(got frames ${got.map(_.frame)}, want ${want.map(_.frame)})")
      for ((g, w) <- got.zip(want)) {
        assert(g.frame == w.frame, s"case ${ci + 1}: frame ${g.frame} != ${w.frame}")
        assert(g.keyframe == w.keyframe, s"case ${ci + 1} frame ${g.frame}: keyframe")
        assert(g.outside == w.outside, s"case ${ci + 1} frame ${g.frame}: outside")
        assert(g.points.length == w.points.length,
          s"case ${ci + 1} frame ${g.frame}: ${g.points.length} coords, want ${w.points.length}")
        assert(g.points.zip(w.points).forall { case (a, b) => close(a, b) },
          s"case ${ci + 1} frame ${g.frame}: ${g.points.toSeq} != ${w.points.toSeq}")
        assert(g.attributes == w.attributes,
          s"case ${ci + 1} frame ${g.frame}: attrs ${g.attributes} != ${w.attributes}")
      }
    }
  }

  test("keyframe endpoints are preserved verbatim") {
    val sq = Array[Double](0, 0, 10, 0, 10, 10, 0, 10)
    val sq2 = Array[Double](20, 20, 40, 20, 40, 40, 20, 40)
    val out = TrackInterpolation.interpolateShapes(0,
      Seq(TrackShape(0, "polygon", sq, outside = false, keyframe = false, Nil),
          TrackShape(4, "polygon", sq2, outside = false, keyframe = false, Nil)), 5)
    assert(out.head.points.toSeq == sq.toSeq && out.head.keyframe)
    assert(out.last.points.toSeq == sq2.toSeq && out.last.keyframe)
    assert(out.map(_.frame) == Seq(0, 1, 2, 3, 4))
  }

  test("non-polygon tracks are rejected") {
    val r = Array[Double](0, 0, 1, 1)
    assertThrows[IllegalArgumentException] {
      TrackInterpolation.interpolateShapes(0,
        Seq(TrackShape(0, "rectangle", r, outside = false, keyframe = false, Nil),
            TrackShape(2, "rectangle", r, outside = false, keyframe = false, Nil)), 5)
    }
  }
}
