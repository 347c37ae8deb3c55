package graft

import graft.operators.TrackOps
import graft.operators.TrackOps.TrackRow

/** Distributed track interpolation wrapper: attributes must survive the
  * groupByKey/flatMapGroups round-trip and propagate forward exactly as
  * the kernel does (ref CvatApi.py:700-703) — a keyframe missing an
  * attribute inherits the previous keyframe's resolved value,
  * interpolated rows carry the LEFT keyframe's resolved set, trailing
  * propagation copies the last keyframe's.
  */
class TrackOpsSpec extends SparkSpec {
  import spark.implicits._

  test("attributes ride the distributed wrapper and propagate forward") {
    val sq = Seq(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0)
    val rows = Seq(
      TrackRow(1L, 0, sq, outside = false, attributes = Seq(1 -> "a", 2 -> "x")),
      TrackRow(1L, 3, sq.map(_ + 3), outside = false, attributes = Seq(1 -> "b")),
      TrackRow(1L, 6, sq, outside = false, attributes = Nil)
    ).toDS()
    val out = TrackOps.interpolateTracks(spark, rows, endFrameOffset = 2)
      .collect().map(r => r.frame -> ((r.keyframe, r.attributes.toMap))).toMap
    assert(out.keySet == (0 to 7).toSet)
    // keyframes: own attrs, then inherited ones filling the gaps
    assert(out(0) == ((true, Map(1 -> "a", 2 -> "x"))))
    assert(out(3) == ((true, Map(1 -> "b", 2 -> "x"))))
    assert(out(6) == ((true, Map(1 -> "b", 2 -> "x"))))
    // interpolated rows carry the left keyframe's RESOLVED set
    assert(!out(1)._1 && out(1)._2 == Map(1 -> "a", 2 -> "x"))
    assert(!out(4)._1 && out(4)._2 == Map(1 -> "b", 2 -> "x"))
    // trailing propagation copies the last keyframe's set
    assert(!out(7)._1 && out(7)._2 == Map(1 -> "b", 2 -> "x"))
  }
}
