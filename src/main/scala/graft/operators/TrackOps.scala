package graft.operators

import graft.operators.TrackInterpolation.TrackShape
import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed form of track interpolation: one group per track via
  * `groupByKey.flatMapGroups` (SURVEY §2.9). Parallelism = number of
  * tracks; per-group state is one track's keyframes (bounded), so the
  * operator scales with the corpus without any shuffle beyond the
  * group-by.
  */
object TrackOps {

  /** Input row: one keyframe shape of a track. `attributes` are CVAT
    * (spec_id, value) pairs; missing attributes inherit forward from
    * the previous keyframe (ref CvatApi.py:700-703).
    */
  final case class TrackRow(track_id: Long, frame: Int, points: Seq[Double],
                            outside: Boolean,
                            attributes: Seq[(Int, String)])

  /** Output row: keyframe or interpolated shape, with the shape's
    * resolved (post-propagation) attributes.
    */
  final case class InterpRow(track_id: Long, frame: Int, keyframe: Boolean,
                             points: Seq[Double],
                             attributes: Seq[(Int, String)])

  /** Interpolate every track; each track's end frame is its last
    * keyframe + `endFrameOffset` (the trailing-propagation window).
    */
  def interpolateTracks(spark: SparkSession, rows: Dataset[TrackRow],
                        endFrameOffset: Int): Dataset[InterpRow] = {
    import spark.implicits._
    rows.groupByKey(_.track_id).flatMapGroups { (tid, it) =>
      val keyframes = it.toSeq.map(r =>
        TrackShape(r.frame, "polygon", r.points.toArray, r.outside,
          keyframe = false, attributes = r.attributes))
      if (keyframes.isEmpty) Iterator.empty
      else {
        val trackFrame = keyframes.map(_.frame).min
        val endFrame = keyframes.map(_.frame).max + endFrameOffset
        TrackInterpolation.interpolateShapes(trackFrame, keyframes, endFrame)
          .iterator.map(s =>
            InterpRow(tid, s.frame, s.keyframe, s.points.toSeq, s.attributes))
      }
    }
  }
}
