package graft.queries

import graft.Tables.t
import graft.operators.TrackOps
import graft.operators.TrackOps.TrackRow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY §2.9 — track interpolation as a distributed operator, driven
  * by keyframe tracks synthesized deterministically from `orders`
  * (~300 tracks, keyframes every 3 frames → 2 interpolated frames per
  * gap).
  *
  * Two gate angles:
  *  - `interp_tracks`: full output incl. coordinate arity — rows-only
  *    (the interpolation math is not SQL-expressible); the kernel is
  *    golden-tested in InterpSpec against the reference's own output.
  *  - `interp_counts`: hash-checked. The state machine's row accounting
  *    (ref CvatApi.py:637-665,712-729) IS SQL-expressible: per
  *    (track, keyframe-pair) the operator must emit exactly
  *    gap-1 interpolated frames when the left keyframe is not outside
  *    and none when it is; the trailing keyframe propagates
  *    endFrameOffset-1 frames unless outside; every keyframe row
  *    survives the [trackFrame, endFrame) clip. DuckDB predicts all of
  *    that from the synthesized keyframes with lead() arithmetic, so a
  *    drift in break/clip/propagation logic hash-fails.
  */
object InterpQueries extends QueryPack {

  /** Deterministic keyframe synth shared by both gate queries:
    * ≤8 keyframes per track at frames 0,3,6,…; outside on every
    * o_orderkey % 17 == 0 keyframe.
    */
  private def keyframes(s: SparkSession, d: String) = {
    import s.implicits._
    t(s, d, "orders")
      .withColumn("track_id", col("o_orderkey") % 300)
      .withColumn("seq", row_number().over(
        Window.partitionBy("track_id").orderBy("o_orderkey")))
      .filter(col("seq") <= 8) // ≤8 keyframes per track
      .withColumn("frame", (col("seq") - 1) * 3)
      .withColumn("x", (col("o_custkey") % 100).cast("double"))
      .withColumn("y", (col("o_orderkey") % 80).cast("double"))
      .withColumn("sz", (col("o_custkey") % 9 + 2).cast("double"))
      .select(col("track_id"), col("frame").cast("int").as("frame"),
        array(col("x"), col("y"), col("x") + col("sz"), col("y"),
              col("x") + col("sz"), col("y") + col("sz"), col("x"), col("y") + col("sz"))
          .as("points"),
        (col("o_orderkey") % 17 === 0).as("outside"),
        typedlit(Seq.empty[(Int, String)]).as("attributes"))
      .as[TrackRow]
  }

  private def interpolated(s: SparkSession, d: String): DataFrame =
    TrackOps.interpolateTracks(s, keyframes(s, d), endFrameOffset = 3).toDF()

  /** Translation-only rectangle tracks: per track a FIXED w×h rectangle
    * whose position varies per keyframe. On this subclass the full
    * interpolation kernel is exactly predictable: identical shapes have
    * identical arc-length offset vectors, so the nearest-pair matching
    * is the identity; every corner lerps independently
    * (c0 + (c1-c0)·offset, all exact-integer differences, so the IEEE
    * double is engine-identical); and the decimation keeps all corners
    * because each side ≥ perimeter/10 for the bounded aspect ratios
    * used here (w∈[3,10], h∈[4,8]). All outside=false, so the only
    * state-machine paths are interpolate + trailing propagation.
    */
  private def rectKeyframes(s: SparkSession, d: String) = {
    import s.implicits._
    t(s, d, "orders")
      .withColumn("track_id", col("o_orderkey") % 200)
      .withColumn("seq", row_number().over(
        Window.partitionBy("track_id").orderBy("o_orderkey")))
      .filter(col("seq") <= 6)
      .withColumn("frame", ((col("seq") - 1) * 3).cast("int"))
      .withColumn("w", (col("track_id") % 8 + 3).cast("double"))
      .withColumn("h", (col("track_id") % 5 + 4).cast("double"))
      .withColumn("x0", (col("o_custkey") % 50).cast("double"))
      .withColumn("y0", (col("o_orderkey") % 40).cast("double"))
      .select(col("track_id"), col("frame"),
        array(col("x0"), col("y0"),
              col("x0") + col("w"), col("y0"),
              col("x0") + col("w"), col("y0") + col("h"),
              col("x0"), col("y0") + col("h")).as("points"),
        lit(false).as("outside"),
        typedlit(Seq.empty[(Int, String)]).as("attributes"))
      .as[TrackRow]
  }

  /** Keyframes exercising attribute forward-propagation
    * (ref CvatApi.py:700-703): attr 1 re-stated on every 3rd keyframe
    * (value encodes which), attr 2 stated only on the first — every
    * later shape must inherit both, latest statement winning.
    */
  private def attrKeyframes(s: SparkSession, d: String) = {
    import s.implicits._
    t(s, d, "orders")
      .withColumn("track_id", col("o_orderkey") % 250)
      .withColumn("seq", row_number().over(
        Window.partitionBy("track_id").orderBy("o_orderkey")))
      .filter(col("seq") <= 8)
      .withColumn("frame", ((col("seq") - 1) * 3).cast("int"))
      .withColumn("x", (col("o_custkey") % 60).cast("double"))
      .withColumn("y", (col("o_orderkey") % 45).cast("double"))
      .withColumn("attributes",
        when(col("seq") === 1,
          array(struct(lit(1).as("_1"),
                  concat(lit("v"), col("seq").cast("string")).as("_2")),
                struct(lit(2).as("_1"), lit("w").as("_2"))))
        .when(col("seq") % 3 === 1,
          array(struct(lit(1).as("_1"),
                  concat(lit("v"), col("seq").cast("string")).as("_2"))))
        .otherwise(typedlit(Seq.empty[(Int, String)])))
      .select(col("track_id"), col("frame"),
        array(col("x"), col("y"), col("x") + 5, col("y"),
              col("x") + 5, col("y") + 4, col("x"), col("y") + 4).as("points"),
        lit(false).as("outside"), col("attributes"))
      .as[TrackRow]
  }

  /** Decimation subclass (see InterpDecimationSpec): a FIXED 16×8
    * rectangle, alternately sampled densely (bottom edge subdivided
    * every 4 units → 7 points, odd keyframes) and coarsely (4 corners,
    * even keyframes), translating between integer positions with
    * keyframe gap 5. The asymmetric sampling drives
    * reduce_interpolation's interior-drop loop and 2-point collapse —
    * the paths the identity-matching rect subclass never reaches —
    * and every branch decision sits ≥1/15 from its threshold, so the
    * kept-point sets and their exact-integer-lerp coordinates are
    * engine-independent and DuckDB-predictable.
    */
  private def decimationKeyframes(s: SparkSession, d: String) = {
    import s.implicits._
    t(s, d, "orders")
      .withColumn("track_id", col("o_orderkey") % 200)
      .withColumn("seq", row_number().over(
        Window.partitionBy("track_id").orderBy("o_orderkey")))
      .filter(col("seq") <= 4)
      .withColumn("frame", ((col("seq") - 1) * 5).cast("int"))
      .withColumn("x", (col("o_custkey") % 50).cast("double"))
      .withColumn("y", (col("o_orderkey") % 40).cast("double"))
      .select(col("track_id"), col("frame"),
        when(col("seq") % 2 === 1,
          array(col("x"), col("y"), col("x") + 4, col("y"),
                col("x") + 8, col("y"), col("x") + 12, col("y"),
                col("x") + 16, col("y"), col("x") + 16, col("y") + 8,
                col("x"), col("y") + 8))
        .otherwise(
          array(col("x"), col("y"), col("x") + 16, col("y"),
                col("x") + 16, col("y") + 8, col("x"), col("y") + 8))
        .as("points"),
        lit(false).as("outside"),
        typedlit(Seq.empty[(Int, String)]).as("attributes"))
      .as[TrackRow]
  }

  val defs: Map[String, QueryFn] = Map(
    "interp_tracks" -> ((s, d) =>
      interpolated(s, d)
        .select(col("track_id"), col("frame"), col("keyframe"),
          size(col("points")).as("n_coords"))
        .orderBy("track_id", "frame")),

    // Row accounting of the same operator output, grouped per
    // (track, segment): a keyframe row is its own segment; an
    // interpolated/propagated row belongs to the keyframe that opened
    // it (frames are multiples of 3 by construction, so
    // frame - frame % 3 is exactly the left keyframe's frame — also
    // for trailing propagation, which sits right after the last
    // keyframe).
    "interp_counts" -> ((s, d) =>
      interpolated(s, d)
        .withColumn("seg", when(col("keyframe"), col("frame"))
          .otherwise(col("frame") - col("frame") % 3))
        .groupBy("track_id", "seg", "keyframe")
        .agg(count(lit(1)).as("n_rows"),
          min("frame").as("first_frame"),
          max("frame").as("last_frame"))
        .orderBy("track_id", "seg", "keyframe")),

    // Interpolated COORDINATES, hash-checked, on the translation-only
    // rectangle subclass (see rectKeyframes): the operator's output
    // points must equal the per-corner lerp DuckDB computes with the
    // same double arithmetic — matching, decimation and propagation all
    // exercised through the general kernel.
    "interp_rect_values" -> ((s, d) =>
      TrackOps.interpolateTracks(s, rectKeyframes(s, d), endFrameOffset = 3).toDF()
        .select(col("track_id"), col("frame"), col("keyframe"),
          col("points")(0).as("px0"), col("points")(1).as("py0"),
          col("points")(2).as("px1"), col("points")(3).as("py1"),
          col("points")(4).as("px2"), col("points")(5).as("py2"),
          col("points")(6).as("px3"), col("points")(7).as("py3"))
        .orderBy("track_id", "frame")),

    // Decimation branch (reduce_interpolation, ref CvatApi.py:519-612),
    // hash-checked per COORDINATE: every output point of the decimation
    // subclass, exploded to (idx, px, py) rows so the variable-length
    // kept-point sets are compared numerically (no float→string
    // formatting). Which points survive — interior drops on the
    // dense-sampled runs, the 2-point collapse to an exact midpoint
    // average — and their lerped values must equal DuckDB's prediction.
    "interp_decimation" -> ((s, d) =>
      TrackOps.interpolateTracks(s, decimationKeyframes(s, d), endFrameOffset = 3).toDF()
        .select(col("track_id"), col("frame"), col("keyframe"),
          expr("posexplode(transform(sequence(0, cast(size(points)/2 as int) - 1), " +
            "i -> struct(points[2*i] AS px, points[2*i+1] AS py)))"))
        .select(col("track_id"), col("frame"), col("keyframe"),
          col("pos").as("idx"), col("col.px").as("px"), col("col.py").as("py"))
        .orderBy("track_id", "frame", "idx")),

    // Attribute propagation, hash-checked: every output shape's
    // resolved attribute set (canonicalized: sorted by id, id=value
    // joined with ';') must equal the forward-fill DuckDB predicts —
    // a keyframe missing an attribute inherits the latest earlier
    // statement; interpolated/propagated rows carry their left
    // keyframe's resolved set.
    "interp_attrs" -> ((s, d) =>
      TrackOps.interpolateTracks(s, attrKeyframes(s, d), endFrameOffset = 3).toDF()
        .select(col("track_id"), col("frame"), col("keyframe"),
          expr("array_join(transform(array_sort(attributes), " +
            "a -> concat(cast(a._1 AS string), '=', a._2)), ';')").as("attrs"))
        .orderBy("track_id", "frame"))
  )

  val oracle: Map[String, String] = Map(
    // Formerly rows-only. The synthesized tracks are SQUARES, whose
    // arc-length offsets are {0, ¼, ½, ¾, 1} for ANY size — so the
    // nearest-pair matching is the identity at every keyframe pair,
    // per-point emission keeps all 4 corners, and n_coords is the
    // constant 8 on every output row. That makes the full per-row
    // output (the row set interp_counts checks in aggregate, plus the
    // coordinate arity) DuckDB-predictable: keyframes always emit,
    // non-outside keyframes with a successor emit gap-1 interpolated
    // frames, the non-outside trailing keyframe propagates 2.
    "interp_tracks" ->
      """WITH kf AS (
           SELECT track_id, CAST((seq - 1) * 3 AS INT) AS frame, outside FROM (
             SELECT o_orderkey % 300 AS track_id,
                    row_number() OVER (PARTITION BY o_orderkey % 300 ORDER BY o_orderkey) AS seq,
                    (o_orderkey % 17 = 0) AS outside
             FROM orders) WHERE seq <= 8),
         seg AS (
           SELECT track_id, frame, outside,
                  lead(frame) OVER (PARTITION BY track_id ORDER BY frame) AS nf
           FROM kf)
         SELECT track_id, CAST(frame AS INT) AS frame, keyframe,
                CAST(8 AS INT) AS n_coords FROM (
           SELECT track_id, frame, TRUE AS keyframe FROM kf
           UNION ALL
           SELECT track_id, frame + g, FALSE
           FROM (SELECT *, UNNEST(generate_series(1, nf - frame - 1)) AS g
                 FROM seg WHERE NOT outside AND nf IS NOT NULL AND nf - frame > 1)
           UNION ALL
           SELECT track_id, frame + g, FALSE
           FROM (SELECT *, UNNEST([1, 2]) AS g
                 FROM seg WHERE NOT outside AND nf IS NULL)
         ) ORDER BY track_id, frame""",
    // Pure frame-gap arithmetic over the same synthesized keyframes:
    // every keyframe emits itself (kept by the clip even when outside);
    // a non-outside keyframe with a successor emits gap-1 interpolated
    // frames; the non-outside trailing keyframe propagates
    // endFrameOffset-1 = 2 frames.
    "interp_counts" ->
      """WITH kf AS (
           SELECT track_id, CAST((seq - 1) * 3 AS INT) AS frame, outside FROM (
             SELECT o_orderkey % 300 AS track_id,
                    row_number() OVER (PARTITION BY o_orderkey % 300 ORDER BY o_orderkey) AS seq,
                    (o_orderkey % 17 = 0) AS outside
             FROM orders) WHERE seq <= 8),
         seg AS (
           SELECT track_id, frame, outside,
                  lead(frame) OVER (PARTITION BY track_id ORDER BY frame) AS next_frame
           FROM kf)
         SELECT track_id, seg, keyframe, n_rows, first_frame, last_frame FROM (
           SELECT track_id, frame AS seg, TRUE AS keyframe,
                  CAST(1 AS BIGINT) AS n_rows,
                  frame AS first_frame, frame AS last_frame FROM kf
           UNION ALL
           SELECT track_id, frame, FALSE, CAST(next_frame - frame - 1 AS BIGINT),
                  frame + 1, next_frame - 1
           FROM seg WHERE NOT outside AND next_frame IS NOT NULL AND next_frame - frame > 1
           UNION ALL
           SELECT track_id, frame, FALSE, CAST(2 AS BIGINT), frame + 1, frame + 2
           FROM seg WHERE NOT outside AND next_frame IS NULL
         ) ORDER BY track_id, seg, keyframe""",
    // Per-corner lerp with the kernel's exact expression shape:
    // corner + (next_corner - corner) * (g / gap). All corner
    // differences are exact-integer doubles, so the one inexact step
    // (the multiply-add against g/gap) is the same IEEE operation in
    // both engines. Trailing propagation copies the last keyframe.
    "interp_rect_values" ->
      """WITH kf AS (
           SELECT track_id, CAST((seq - 1) * 3 AS INT) AS frame,
                  CAST(track_id % 8 + 3 AS DOUBLE) AS w,
                  CAST(track_id % 5 + 4 AS DOUBLE) AS h,
                  CAST(o_custkey % 50 AS DOUBLE) AS x0,
                  CAST(o_orderkey % 40 AS DOUBLE) AS y0
           FROM (
             SELECT o_orderkey, o_custkey, o_orderkey % 200 AS track_id,
                    row_number() OVER (PARTITION BY o_orderkey % 200 ORDER BY o_orderkey) AS seq
             FROM orders) WHERE seq <= 6),
         seg AS (
           SELECT track_id, frame, w, h, x0, y0,
                  lead(frame) OVER tw AS nf,
                  lead(x0) OVER tw AS nx,
                  lead(y0) OVER tw AS ny
           FROM kf WINDOW tw AS (PARTITION BY track_id ORDER BY frame))
         SELECT track_id, frame, keyframe,
                px0, py0, px1, py1, px2, py2, px3, py3 FROM (
           SELECT track_id, frame, TRUE AS keyframe,
                  x0 AS px0, y0 AS py0, x0 + w AS px1, y0 AS py1,
                  x0 + w AS px2, y0 + h AS py2, x0 AS px3, y0 + h AS py3
           FROM kf
           UNION ALL
           SELECT track_id, frame + CAST(g AS INT), FALSE,
                  x0 + (nx - x0) * (CAST(g AS DOUBLE) / (nf - frame)),
                  y0 + (ny - y0) * (CAST(g AS DOUBLE) / (nf - frame)),
                  (x0 + w) + (nx - x0) * (CAST(g AS DOUBLE) / (nf - frame)),
                  y0 + (ny - y0) * (CAST(g AS DOUBLE) / (nf - frame)),
                  (x0 + w) + (nx - x0) * (CAST(g AS DOUBLE) / (nf - frame)),
                  (y0 + h) + (ny - y0) * (CAST(g AS DOUBLE) / (nf - frame)),
                  x0 + (nx - x0) * (CAST(g AS DOUBLE) / (nf - frame)),
                  (y0 + h) + (ny - y0) * (CAST(g AS DOUBLE) / (nf - frame))
           FROM (SELECT *, UNNEST(generate_series(1, nf - frame - 1)) AS g
                 FROM seg WHERE nf IS NOT NULL)
           UNION ALL
           SELECT track_id, frame + CAST(g AS INT), FALSE,
                  x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h
           FROM (SELECT *, UNNEST([1, 2]) AS g
                 FROM seg WHERE nf IS NULL)
         ) ORDER BY track_id, frame""",
    // The decimation subclass is fully predictable (see
    // InterpDecimationSpec for the derivation): dense→coarse segments
    // keep all 7 matched points for g ≤ 3 and decimate to 5 (dropping
    // the bottom-edge interior survivor and collapsing the (12,16)
    // pair to its exact midpoint) at g = 4; coarse→dense mirrors it
    // with the 5-point form at g = 1. Every coordinate is the kernel's
    // own lerp expression shape — corner + (delta) * (g/gap) over
    // exact-integer operands — so the IEEE doubles agree bit-for-bit.
    "interp_decimation" ->
      """WITH kf AS (
           SELECT track_id, seq, CAST((seq - 1) * 5 AS INT) AS frame,
                  CAST(o_custkey % 50 AS DOUBLE) AS ax,
                  CAST(o_orderkey % 40 AS DOUBLE) AS ay,
                  (seq % 2 = 1) AS dense
           FROM (
             SELECT o_orderkey, o_custkey, o_orderkey % 200 AS track_id,
                    row_number() OVER (PARTITION BY o_orderkey % 200 ORDER BY o_orderkey) AS seq
             FROM orders) WHERE seq <= 4),
         seg AS (
           SELECT track_id, frame, ax, ay, dense,
                  lead(frame) OVER tw AS nf,
                  lead(ax) OVER tw AS bx,
                  lead(ay) OVER tw AS b_y
           FROM kf WINDOW tw AS (PARTITION BY track_id ORDER BY frame)),
         interp AS (
           SELECT s.*, g.g, CAST(g.g AS DOUBLE) / (s.nf - s.frame) AS t
           FROM seg s CROSS JOIN generate_series(1, 4) AS g(g)
           WHERE s.nf IS NOT NULL AND g.g <= s.nf - s.frame - 1)
         SELECT track_id, CAST(frame AS INT) AS frame, keyframe,
                CAST(idx AS INT) AS idx, px, py FROM (
           -- dense keyframes: 7 points
           SELECT track_id, frame, TRUE AS keyframe, i.idx,
                  ax + CASE i.idx WHEN 0 THEN 0 WHEN 1 THEN 4 WHEN 2 THEN 8
                                  WHEN 3 THEN 12 WHEN 4 THEN 16 WHEN 5 THEN 16
                                  ELSE 0 END AS px,
                  ay + CASE WHEN i.idx >= 5 THEN 8 ELSE 0 END AS py
           FROM kf CROSS JOIN generate_series(0, 6) AS i(idx) WHERE dense
           UNION ALL
           -- coarse keyframes: 4 corners
           SELECT track_id, frame, TRUE, i.idx,
                  ax + CASE i.idx WHEN 1 THEN 16 WHEN 2 THEN 16 ELSE 0 END,
                  ay + CASE WHEN i.idx IN (2, 3) THEN 8 ELSE 0 END
           FROM kf CROSS JOIN generate_series(0, 3) AS i(idx) WHERE NOT dense
           UNION ALL
           -- dense→coarse, g ≤ 3: all 7 matched points survive
           SELECT track_id, frame + g, FALSE, i.idx,
                  CASE i.idx
                    WHEN 0 THEN ax + (bx - ax) * t
                    WHEN 1 THEN (ax + 4) + (bx - (ax + 4)) * t
                    WHEN 2 THEN (ax + 8) + (bx - (ax + 8)) * t
                    WHEN 3 THEN (ax + 12) + ((bx + 16) - (ax + 12)) * t
                    ELSE (CASE WHEN i.idx = 6 THEN ax ELSE ax + 16 END) + (bx - ax) * t
                  END,
                  CASE WHEN i.idx >= 5 THEN (ay + 8) + (b_y - ay) * t
                       ELSE ay + (b_y - ay) * t END
           FROM interp CROSS JOIN generate_series(0, 6) AS i(idx)
           WHERE dense AND g <= 3
           UNION ALL
           -- dense→coarse, g = 4: interior dropped, (12,16) pair → midpoint
           SELECT track_id, frame + g, FALSE, i.idx,
                  CASE i.idx
                    WHEN 0 THEN ax + (bx - ax) * t
                    WHEN 1 THEN (ax + 8) + (bx - (ax + 8)) * t
                    WHEN 2 THEN (((ax + 12) + ((bx + 16) - (ax + 12)) * t)
                               + ((ax + 16) + (bx - ax) * t)) / 2
                    WHEN 3 THEN (ax + 16) + (bx - ax) * t
                    ELSE ax + (bx - ax) * t
                  END,
                  CASE WHEN i.idx >= 3 THEN (ay + 8) + (b_y - ay) * t
                       ELSE ay + (b_y - ay) * t END
           FROM interp CROSS JOIN generate_series(0, 4) AS i(idx)
           WHERE dense AND g = 4
           UNION ALL
           -- coarse→dense, g ≥ 2: all 7 matched points survive
           SELECT track_id, frame + g, FALSE, i.idx,
                  CASE i.idx
                    WHEN 1 THEN ax + ((bx + 4) - ax) * t
                    WHEN 2 THEN ax + ((bx + 8) - ax) * t
                    WHEN 3 THEN (ax + 16) + ((bx + 12) - (ax + 16)) * t
                    WHEN 4 THEN (ax + 16) + (bx - ax) * t
                    WHEN 5 THEN (ax + 16) + (bx - ax) * t
                    ELSE ax + (bx - ax) * t
                  END,
                  CASE WHEN i.idx >= 5 THEN (ay + 8) + (b_y - ay) * t
                       ELSE ay + (b_y - ay) * t END
           FROM interp CROSS JOIN generate_series(0, 6) AS i(idx)
           WHERE NOT dense AND g >= 2
           UNION ALL
           -- coarse→dense, g = 1: decimated 5-point form
           SELECT track_id, frame + g, FALSE, i.idx,
                  CASE i.idx
                    WHEN 0 THEN ax + (bx - ax) * t
                    WHEN 1 THEN ax + ((bx + 8) - ax) * t
                    WHEN 2 THEN (((ax + 16) + ((bx + 12) - (ax + 16)) * t)
                               + ((ax + 16) + (bx - ax) * t)) / 2
                    WHEN 3 THEN (ax + 16) + (bx - ax) * t
                    ELSE ax + (bx - ax) * t
                  END,
                  CASE WHEN i.idx >= 3 THEN (ay + 8) + (b_y - ay) * t
                       ELSE ay + (b_y - ay) * t END
           FROM interp CROSS JOIN generate_series(0, 4) AS i(idx)
           WHERE NOT dense AND g = 1
           UNION ALL
           -- trailing propagation: 2 copies of the last keyframe
           SELECT track_id, frame + g, FALSE, i.idx,
                  ax + CASE i.idx WHEN 0 THEN 0 WHEN 1 THEN 4 WHEN 2 THEN 8
                                  WHEN 3 THEN 12 WHEN 4 THEN 16 WHEN 5 THEN 16
                                  ELSE 0 END,
                  ay + CASE WHEN i.idx >= 5 THEN 8 ELSE 0 END
           FROM seg CROSS JOIN generate_series(1, 2) AS g(g)
                    CROSS JOIN generate_series(0, 6) AS i(idx)
           WHERE nf IS NULL AND dense
           UNION ALL
           SELECT track_id, frame + g, FALSE, i.idx,
                  ax + CASE i.idx WHEN 1 THEN 16 WHEN 2 THEN 16 ELSE 0 END,
                  ay + CASE WHEN i.idx IN (2, 3) THEN 8 ELSE 0 END
           FROM seg CROSS JOIN generate_series(1, 2) AS g(g)
                    CROSS JOIN generate_series(0, 3) AS i(idx)
           WHERE nf IS NULL AND NOT dense
         ) ORDER BY track_id, frame, idx""",
    // Forward fill in SQL: the latest keyframe seq m ≤ s with
    // m % 3 = 1 is m = s - ((s-1) % 3), so attr 1 resolves to 'v'||m
    // and attr 2 (stated once on seq 1) to 'w' everywhere. Interpolated
    // and trailing rows copy their left keyframe's resolved string.
    "interp_attrs" ->
      """WITH kf AS (
           SELECT track_id, CAST((seq - 1) * 3 AS INT) AS frame, seq FROM (
             SELECT o_orderkey % 250 AS track_id,
                    row_number() OVER (PARTITION BY o_orderkey % 250 ORDER BY o_orderkey) AS seq
             FROM orders) WHERE seq <= 8),
         res AS (
           SELECT track_id, frame,
                  '1=v' || CAST(seq - ((seq - 1) % 3) AS VARCHAR) || ';2=w' AS attrs,
                  lead(frame) OVER (PARTITION BY track_id ORDER BY frame) AS nf
           FROM kf)
         SELECT track_id, frame, keyframe, attrs FROM (
           SELECT track_id, frame, TRUE AS keyframe, attrs FROM res
           UNION ALL
           SELECT track_id, frame + CAST(g AS INT), FALSE, attrs
           FROM (SELECT *, UNNEST(generate_series(1, nf - frame - 1)) AS g
                 FROM res WHERE nf IS NOT NULL)
           UNION ALL
           SELECT track_id, frame + CAST(g AS INT), FALSE, attrs
           FROM (SELECT *, UNNEST([1, 2]) AS g
                 FROM res WHERE nf IS NULL)
         ) ORDER BY track_id, frame"""
  )
}
