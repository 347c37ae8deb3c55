package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Track interpolation — the reference's one genuinely stateful sequence
  * operator (CvatApi.py:427-731, itself adapted from CVAT upstream, MIT).
  *
  * Re-expressed as a pure Scala function over one track's keyframe
  * shapes; the distributed form is
  * `ds.groupByKey(_.trackId).flatMapGroups` (see [[TrackInterpolation.interpolateTracks]]) —
  * tracks are bounded (≤ thousands of frames), so per-group in-memory
  * processing is safe at any corpus scale; parallelism comes from the
  * number of tracks.
  *
  * Semantics preserved from the reference, validated against golden
  * vectors minted by executing the reference code
  * (tools/mint_interp_golden.py):
  *  - arc-length parameterization of both polygons (curve_to_offset_vec,
  *    CvatApi.py:479-488)
  *  - nearest-pair left↔right point matching (:490-517)
  *  - lerp of matched points by frame offset (:622-631)
  *  - distance-threshold decimation (reduce_interpolation, :519-612)
  *  - attribute forward-propagation (:700-703); `outside` keyframes break
  *    interpolation (:705-706); trailing keyframe propagates to
  *    end_frame (:664-665,712-715); results clipped to
  *    [track.frame, end_frame) with outside non-keyframes dropped
  *    (:717-729); polygon-only (:638-639).
  */
object TrackInterpolation {

  /** One CVAT track shape. `attributes` preserves insertion order
    * (propagation appends, ref :700-703).
    */
  final case class TrackShape(
      frame: Int,
      shapeType: String,
      points: Array[Double],
      outside: Boolean,
      keyframe: Boolean,
      attributes: Seq[(Int, String)])

  private type Pt = (Double, Double)

  private def curveLength(points: IndexedSeq[Pt]): Double = {
    var len = 0.0
    var i = 1
    while (i < points.length) {
      val dx = points(i)._1 - points(i - 1)._1
      val dy = points(i)._2 - points(i - 1)._2
      len += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    len
  }

  /** ref curve_to_offset_vec (:479-488). Division by a zero length
    * yields NaN exactly as numpy does — downstream nearest-pair search
    * then degenerates to index 0, matching the reference.
    */
  private def curveToOffsetVec(points: IndexedSeq[Pt], length: Double): IndexedSeq[Double] = {
    val out = ArrayBuffer(0.0)
    var acc = 0.0
    var i = 1
    while (i < points.length) {
      val dx = points(i)._1 - points(i - 1)._1
      val dy = points(i)._2 - points(i - 1)._2
      acc += math.sqrt(dx * dx + dy * dy)
      out += acc / length
      i += 1
    }
    out.toIndexedSeq
  }

  /** ref find_nearest_pair (:490-497): strict-< keeps the first minimum. */
  private def findNearestPair(value: Double, curve: IndexedSeq[Double]): Int = {
    var bestIdx = 0
    var bestDist = math.abs(value - curve(0))
    var i = 1
    while (i < curve.length) {
      val d = math.abs(value - curve(i))
      if (d < bestDist) { bestIdx = i; bestDist = d }
      i += 1
    }
    bestIdx
  }

  /** ref match_left_right + match_right_left (:499-517): every left point
    * gets its nearest right; unmatched right points attach to their
    * nearest left; match lists sorted.
    */
  private def matchPoints(leftCurve: IndexedSeq[Double],
                          rightCurve: IndexedSeq[Double]): IndexedSeq[IndexedSeq[Int]] = {
    val matching = Array.tabulate(leftCurve.length)(i =>
      ArrayBuffer(findNearestPair(leftCurve(i), rightCurve)))
    val matched = matching.flatten.toSet
    for (r <- rightCurve.indices if !matched.contains(r))
      matching(findNearestPair(rightCurve(r), leftCurve)) += r
    matching.map(_.sorted.toIndexedSeq).toIndexedSeq
  }

  /** ref reduce_interpolation (:519-612): segment-wise decimation with a
    * base-length/(2n) threshold; 2-point segments below threshold
    * collapse to their average.
    */
  private def reduceInterpolation(interpolated: IndexedSeq[Pt],
                                  matching: IndexedSeq[IndexedSeq[Int]],
                                  leftPoints: IndexedSeq[Pt],
                                  rightPoints: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    def averagePoint(points: Seq[Pt]): Pt =
      (points.map(_._1).sum / points.length, points.map(_._2).sum / points.length)
    def dist(a: Pt, b: Pt): Double =
      math.sqrt((a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2))

    def minimizeSegment(baseLength: Double, n: Int,
                        startI: Int, stopI: Int): Seq[Pt] = {
      val threshold = baseLength / (2 * n)
      val minimized = ArrayBuffer(interpolated(startI))
      var latest = startI
      var i = startI + 1
      while (i < stopI) {
        if (dist(interpolated(latest), interpolated(i)) >= threshold) {
          minimized += interpolated(i)
          latest = i
        }
        i += 1
      }
      minimized += interpolated(stopI)
      if (minimized.length == 2 && dist(interpolated(startI), interpolated(stopI)) < threshold)
        Seq(averagePoint(minimized.toSeq))
      else minimized.toSeq
    }

    // flat index of each (left point, match ordinal) pair
    val interpolatedIndexes = {
      var acc = 0
      matching.map { m => val xs = (0 until m.length).map(_ + acc); acc += m.length; xs }
    }

    val reduced = ArrayBuffer[Pt]()

    def leftSegment(start: Int, stop: Int): Unit = {
      val startI = interpolatedIndexes(start)(0)
      val stopI = interpolatedIndexes(stop)(0)
      if (startI == stopI) { reduced += interpolated(startI); return }
      val baseLength = curveLength(leftPoints.slice(start, stop + 1))
      reduced ++= minimizeSegment(baseLength, stop - start + 1, startI, stopI)
    }

    def rightSegment(leftPoint: Int): Unit = {
      val start = matching(leftPoint).head
      val stop = matching(leftPoint).last
      val startI = interpolatedIndexes(leftPoint).head
      val stopI = interpolatedIndexes(leftPoint).last
      val baseLength = curveLength(rightPoints.slice(start, stop + 1))
      reduced ++= minimizeSegment(baseLength, stop - start + 1, startI, stopI)
    }

    var previousOpened: Option[Int] = None
    for (i <- leftPoints.indices) {
      if (matching(i).length == 1) {
        previousOpened match {
          case Some(p) if matching(i)(0) == matching(p)(0) => // continue
          case Some(p) =>
            leftSegment(p, i - 1)
            previousOpened = Some(i)
          case None =>
            previousOpened = Some(i)
        }
      } else {
        previousOpened.foreach { p => leftSegment(p, i - 1); previousOpened = None }
        rightSegment(i)
      }
    }
    previousOpened.foreach(p => leftSegment(p, leftPoints.length - 1))
    reduced.toIndexedSeq
  }

  /** ref interpolate_position (:464-635): closed left/right polygons →
    * reduced lerped points at `offset`.
    */
  private[operators] def interpolatePosition(leftFlat: Array[Double], rightFlat: Array[Double],
                                             offset: Double): Array[Double] = {
    def toPts(a: Array[Double]): IndexedSeq[Pt] =
      (0 until a.length / 2).map(i => (a(2 * i), a(2 * i + 1)))
    val leftPoints = toPts(leftFlat)
    val rightPoints = toPts(rightFlat)
    val leftOffsets = curveToOffsetVec(leftPoints, curveLength(leftPoints))
    val rightOffsets = curveToOffsetVec(rightPoints, curveLength(rightPoints))
    val matching = matchPoints(leftOffsets, rightOffsets)

    val interpolated = for {
      (lp, li) <- leftPoints.zipWithIndex
      ri <- matching(li)
    } yield {
      val rp = rightPoints(ri)
      (lp._1 + (rp._1 - lp._1) * offset, lp._2 + (rp._2 - lp._2) * offset)
    }
    reduceInterpolation(interpolated, matching, leftPoints, rightPoints)
      .flatMap(p => Seq(p._1, p._2)).toArray
  }

  /** ref interpolate (:637-662): all intermediate frames between two
    * polygon keyframes; the temporary closing point is stripped again.
    */
  private def interpolate(s0: TrackShape, s1: TrackShape): Seq[TrackShape] = {
    require(s0.shapeType == "polygon" && s1.shapeType == "polygon",
      s"only polygon tracks are interpolatable (got ${s0.shapeType}/${s1.shapeType})")
    val closed0 = s0.points ++ s0.points.take(2)
    val closed1 = s1.points ++ s1.points.take(2)
    val distance = s1.frame - s0.frame
    for (frame <- (s0.frame + 1) until s1.frame) yield {
      val offset = (frame - s0.frame).toDouble / distance
      val pts = interpolatePosition(closed0, closed1, offset)
      s0.copy(frame = frame, keyframe = false, points = pts.dropRight(2))
    }
  }

  /** ref propagate (:664-665). */
  private def propagate(s: TrackShape, endFrame: Int): Seq[TrackShape] =
    for (f <- (s.frame + 1) until endFrame) yield s.copy(frame = f, keyframe = false)

  /** ref main loop (:667-731). `trackFrame` is the track's start frame. */
  def interpolateShapes(trackFrame: Int, trackShapes: Seq[TrackShape],
                        endFrame: Int): Seq[TrackShape] = {
    val shapes = ArrayBuffer[TrackShape]()
    var prevShape: Option[TrackShape] = None
    var broke = false

    val it = trackShapes.sortBy(_.frame).iterator
    while (it.hasNext && !broke) {
      var shape = it.next()
      val currFrame = shape.frame

      if (prevShape.isDefined && endFrame <= currFrame) {
        // interpolate past end_frame up to the next keyframe, keep < end
        val interpolated = interpolate(prevShape.get, shape)
        shapes ++= (interpolated :+ shape).sortBy(_.frame).takeWhile(_.frame < endFrame)
        prevShape = Some(shape.copy(keyframe = true))
        broke = true
      } else {
        prevShape.foreach { prev =>
          // propagate attributes missing on this keyframe (ref :700-703)
          val have = shape.attributes.map(_._1).toSet
          val inherited = prev.attributes.filterNot(a => have.contains(a._1))
          if (inherited.nonEmpty)
            shape = shape.copy(attributes = shape.attributes ++ inherited)
          if (!prev.outside) shapes ++= interpolate(prev, shape)
        }
        shape = shape.copy(keyframe = true)
        shapes += shape
        prevShape = Some(shape)
      }
    }

    if (!broke)
      prevShape.filter(!_.outside).foreach(p => shapes ++= propagate(p, endFrame))

    shapes.filter(s => trackFrame <= s.frame && s.frame < endFrame)
      .filter(s => s.keyframe || !s.outside)
      .toSeq
  }
}
