package graft.queries

import graft.Tables.t
import graft.functions.GeomFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** SURVEY §2.8 F-G* geometry + P9 degenerate guard, exercised over
  * polygons synthesized deterministically from the `part` table (integer
  * coordinates, so UDF outputs are exact and the DuckDB oracle can
  * reproduce them arithmetically where the math is SQL-expressible).
  *
  * The rotated-rect pipeline (F-G1/G2/G3/G4) is not SQL-expressible;
  * f_g1_rbb_pipeline is instead hash-checked against a golden parquet
  * minted by EXECUTING the reference's own geometry code
  * (tools/mint_rbb_golden.py, the interp_golden pattern), with the
  * rectangle/contract companions (f_g1_rect_rcoco, f_g1_aa_coco,
  * f_g1_rbb_area_law) staying pure-SQL oracles.
  *
  * Scale notes: all queries are scan → project → scalar UDF, a pure map
  * with no shuffle; the UDF island is one projection wide.
  */
object GeomQueries extends QueryPack {

  /** Deterministic triangle per part row: integer coords, positive area. */
  private def withTriangle(df: DataFrame): DataFrame =
    df.withColumn("x0", (col("p_partkey") % 50).cast("double"))
      .withColumn("y0", (col("p_partkey") % 30).cast("double"))
      .withColumn("x1", col("x0") + 1 + (col("p_size") % 20).cast("double"))
      .withColumn("y1", col("y0"))
      .withColumn("x2", col("x0"))
      .withColumn("y2", col("y0") + 1 + (col("p_partkey") % 17).cast("double"))
      .withColumn("seg", array(col("x0"), col("y0"), col("x1"), col("y1"),
                               col("x2"), col("y2")))

  /** Deterministic axis-aligned rectangle per part row: integer coords,
    * sides ≥2 × ≥3 (clamps idle). Open 8-coord polygon TL,TR,BR,BL.
    */
  private def withRect(df: DataFrame): DataFrame =
    df.withColumn("rx0", (col("p_partkey") % 50).cast("double"))
      .withColumn("ry0", (col("p_partkey") % 37).cast("double"))
      .withColumn("rx1", col("rx0") + 2 + (col("p_size") % 13).cast("double"))
      .withColumn("ry1", col("ry0") + 3 + (col("p_partkey") % 7).cast("double"))
      .withColumn("rseg", array(col("rx0"), col("ry0"), col("rx1"), col("ry0"),
                                col("rx1"), col("ry1"), col("rx0"), col("ry1")))

  /** Deterministic parallelogram per part row for f_g1_rbb_pipeline:
    * P, P+u, P+u+v, P+v with u=(a,1), v=(2,b), a ∈ [5,20], b ∈ [5,15]
    * (integer coords; convex since cross(u,v)=ab−2>0; unique min-rect
    * alignment — see the query comment). Every 10th row is collinear
    * (degenerate: no min rect exists → kernel nulls it).
    */
  private def withParallelogram(df: DataFrame): DataFrame =
    df.withColumn("px0", (col("p_partkey") % 41).cast("double"))
      .withColumn("py0", (col("p_partkey") % 29).cast("double"))
      .withColumn("pa", (col("p_size") % 16 + 5).cast("double"))
      .withColumn("pb", (col("p_partkey") % 11 + 5).cast("double"))
      .withColumn("pseg", when(col("p_partkey") % 10 === 0,
        array(col("px0"), col("py0"),
              col("px0") + col("pa"), col("py0"),
              col("px0") + col("pa") * 2, col("py0")))
        .otherwise(array(
          col("px0"), col("py0"),
          col("px0") + col("pa"), col("py0") + 1,
          col("px0") + col("pa") + 2, col("py0") + 1 + col("pb"),
          col("px0") + 2, col("py0") + col("pb"))))

  private val triangleSqlCtes =
    """WITH tri AS (
         SELECT p_partkey, p_size,
                CAST(p_partkey % 50 AS DOUBLE) AS x0,
                CAST(p_partkey % 30 AS DOUBLE) AS y0,
                CAST(p_partkey % 50 AS DOUBLE) + 1 + CAST(p_size % 20 AS DOUBLE) AS x1,
                CAST(p_partkey % 30 AS DOUBLE) AS y1,
                CAST(p_partkey % 50 AS DOUBLE) AS x2,
                CAST(p_partkey % 30 AS DOUBLE) + 1 + CAST(p_partkey % 17 AS DOUBLE) AS y2
         FROM part)"""

  val defs: Map[String, QueryFn] = Map(
    // F-G5: segmentation → axis-aligned bbox via the Scala kernel.
    "f_g5_seg2bbox" -> ((s, d) =>
      withTriangle(t(s, d, "part"))
        .withColumn("bbox", GeomFunctions.segmentation2bbox(col("seg")))
        .select(col("p_partkey"),
                col("bbox")(0).as("xmin"), col("bbox")(1).as("ymin"),
                col("bbox")(2).as("w"), col("bbox")(3).as("h"))
        .orderBy("p_partkey")),

    // F-G6: aabb → rectangle polygon, emitted as canonical JSON so both
    // engines stringify the exact-integer list identically.
    "f_g6_aabb2poly" -> ((s, d) =>
      withTriangle(t(s, d, "part"))
        .withColumn("poly", GeomFunctions.aabb2poly(
          array(col("x0"), col("y0"), lit(1) + col("p_size").cast("double"),
                lit(2) + (col("p_partkey") % 9).cast("double"))))
        .select(col("p_partkey"),
                to_json(col("poly").cast("array<bigint>")).as("poly_json"))
        .orderBy("p_partkey")),

    // F-G7: CVAT rect → closed polygon, same JSON canonicalization.
    "f_g7_rect2poly" -> ((s, d) =>
      withTriangle(t(s, d, "part"))
        .withColumn("poly", GeomFunctions.rectToPolygon(
          array(col("x0"), col("y0"), col("x1"), col("y2"))))
        .select(col("p_partkey"),
                to_json(col("poly").cast("array<bigint>")).as("poly_json"))
        .orderBy("p_partkey")),

    // F-G8: YOLO center-format normalized bbox (640x480 canvas).
    "f_g8_yolo_bbox" -> ((s, d) =>
      withTriangle(t(s, d, "part"))
        .withColumn("bb", GeomFunctions.yoloBbox(lit(640.0), lit(480.0), col("seg")))
        .select(col("p_partkey"),
                col("bb")(0).as("cx"), col("bb")(1).as("cy"),
                col("bb")(2).as("w"), col("bb")(3).as("h"))
        .orderBy("p_partkey")),

    // A6: min/max over (x,y) array pairs via pure higher-order functions
    // (no UDF — stays inside codegen; the UDF variant is f_g5).
    "a6_array_minmax" -> ((s, d) =>
      withTriangle(t(s, d, "part"))
        .select(col("p_partkey"),
          array_min(expr("filter(seg, (x, i) -> i % 2 = 0)")).as("xmin"),
          array_min(expr("filter(seg, (x, i) -> i % 2 = 1)")).as("ymin"),
          array_max(expr("filter(seg, (x, i) -> i % 2 = 0)")).as("xmax"),
          array_max(expr("filter(seg, (x, i) -> i % 2 = 1)")).as("ymax"))
        .orderBy("p_partkey")),

    // F-G1..G4 + P9: full rotated-bbox pipeline with degenerate-input
    // guard, HASH-CHECKED against a golden parquet minted by EXECUTING
    // the reference's own geometry code (tools/mint_rbb_golden.py; the
    // atan2/cos rcoco values are not SQL-expressible, so the oracle
    // reads the minted fixture keyed by the part-table row count).
    // Inputs are integer PARALLELOGRAMS u=(a,1), v=(2,b) — for a
    // triangle every side alignment of the min rect ties at area 2A,
    // so the calipers winner would be rounding-order-dependent and
    // un-goldenable; the parallelogram's two alignment classes differ
    // by ≥0.2% (equal only at a²=b²+3, impossible for a,b ≥ 5), and
    // the clamp thresholds are idle by ≥4.5×, so no cross-engine ulp
    // can flip a branch. Every 10th part gets a collinear "polygon"
    // whose min rect does not exist; the guard nulls it and the filter
    // drops it (CvatApi.py:360-369 skip semantics). Numeric columns
    // (not JSON strings) so the driver's %.9g float canonicalization
    // absorbs ulp noise between the JVM and reference-Python kernels.
    "f_g1_rbb_pipeline" -> ((s, d) =>
      withParallelogram(t(s, d, "part"))
        // one calipers run for both box forms (struct; the filter's
        // pushed-down copy is the one remaining re-evaluation)
        .withColumn("rc", GeomFunctions.rbbCoco(col("pseg")))
        .filter(col("rc").isNotNull) // P9: degenerate guard
        .select(col("p_partkey"),
                col("rc.rcoco")(0).as("rx"), col("rc.rcoco")(1).as("ry"),
                col("rc.rcoco")(2).as("rw"), col("rc.rcoco")(3).as("rh"),
                col("rc.rcoco")(4).as("rtheta"),
                col("rc.coco")(0).as("cxmin"), col("rc.coco")(1).as("cymin"),
                col("rc.coco")(2).as("cw"), col("rc.coco")(3).as("ch"))
        .orderBy("p_partkey")),

    // F-G2→G4 rectangle subclass, HASH-CHECKED (COCOUtils.py:17-80): an
    // axis-aligned rectangle degenerates the min rotated rect to its own
    // aabb with theta = 0 — yet every step of the GENERAL path still
    // runs (hull, rotating calipers, corner permutation, bearing,
    // rotation matrix), and on this subclass each one is exact integer
    // arithmetic DuckDB predicts: rcoco = [x0, y0, w, h, 0]. Sides are
    // ≥2 × ≥3 so the min_hw/min_area clamps stay idle; the atan2 theta
    // is exactly 0.0 (atan2(0, +w)). Hash-pins the calipers/permutation
    // code the rows-only f_g1_rbb_pipeline can only row-count.
    "f_g1_rect_rcoco" -> ((s, d) =>
      withRect(t(s, d, "part"))
        .withColumn("rcoco", GeomFunctions.rbbFromSeg(col("rseg")))
        .select(col("p_partkey"),
          col("rcoco")(0).as("x"), col("rcoco")(1).as("y"),
          col("rcoco")(2).as("w"), col("rcoco")(3).as("h"),
          col("rcoco")(4).as("theta"))
        .orderBy("p_partkey")),

    // F-G1 axis-aligned half, HASH-CHECKED (COCOUtils.py:82-89): the
    // same degenerate-marked pipeline and live P9 rcoco guard as
    // f_g1_rbb_pipeline, but emitting only the SQL-expressible `coco`
    // bbox. The oracle predicts both the surviving row set (for this
    // data, degenerate ⇔ p_partkey % 10 = 0 — a guard that wrongly
    // passes collinear input or drops a real triangle diverges the row
    // count) and the aa-bbox arithmetic. The atan2-based rcoco VALUES
    // are golden-parquet-checked in f_g1_rbb_pipeline.
    "f_g1_aa_coco" -> ((s, d) =>
      withTriangle(t(s, d, "part"))
        .withColumn("seg", when(col("p_partkey") % 10 === 0,
          array(col("x0"), col("y0"), col("x1"), col("y0"), col("x1") + 1, col("y0"))
        ).otherwise(col("seg")))
        .withColumn("rc", GeomFunctions.rbbCoco(col("seg")))
        .filter(col("rc").isNotNull) // P9: degenerate guard
        .select(col("p_partkey"),
                col("rc.coco")(0).as("xmin"), col("rc.coco")(1).as("ymin"),
                col("rc.coco")(2).as("w"), col("rc.coco")(3).as("h"))
        .orderBy("p_partkey")),

    // F-G1/G2 GENERAL-path contract, hash-checked on oblique input:
    // for ANY triangle the rotating-calipers minimum rectangle is
    // side-aligned with area EXACTLY 2× the triangle area (every side
    // alignment gives base·height = 2A, and calipers only considers
    // side alignments). These scalene triangles have no axis-aligned
    // side, so hull → calipers → bearing → rotation all run with
    // nontrivial angles — unlike the rect subclass (θ = 0) — and the
    // law w·h = 2A must still hold to 1e-6 relative. Geometry keeps
    // the min_hw/min_area clamps idle (min rect height ≥ ~4, area
    // ≥ 23). Like a9, the VALUES are not SQL-expressible (atan2/cos)
    // but the CONTRACT is: the oracle predicts four constant-TRUE
    // booleans per row, and any calipers/permutation/clamp regression
    // flips one and hash-fails.
    "f_g1_rbb_area_law" -> ((s, d) => {
      val twoA = col("a") * col("b") - 2
      t(s, d, "part")
        .withColumn("x0", (col("p_partkey") % 40).cast("double"))
        .withColumn("y0", (col("p_partkey") % 23).cast("double"))
        .withColumn("a", (col("p_size") % 16 + 5).cast("double"))
        .withColumn("b", (col("p_partkey") % 11 + 5).cast("double"))
        .withColumn("seg", array(
          col("x0"), col("y0"),
          col("x0") + col("a"), col("y0") + 1,
          col("x0") + 2, col("y0") + col("b")))
        .withColumn("rcoco", GeomFunctions.rbbFromSeg(col("seg")))
        .select(col("p_partkey"),
          col("rcoco").isNotNull.as("defined"),
          (abs(col("rcoco")(2) * col("rcoco")(3) - twoA) <= twoA * 1e-6)
            .as("area_law"),
          (col("rcoco")(2) >= 1 && col("rcoco")(3) >= 1).as("hw_unclamped"),
          (abs(col("rcoco")(4)) <= math.Pi).as("theta_bounded"))
        .orderBy("p_partkey")
    })
  )

  val oracle: Map[String, String] = Map(
    // The calipers/rotation VALUES are not SQL-expressible; the oracle
    // reads a golden parquet minted ONCE by executing the reference's
    // own geometry code (tools/mint_rbb_golden.py → COCOUtils.py via
    // exec), keyed by the part-table row count so the same SQL holds
    // at every SF the driver runs. The fixture path is deliberately
    // ABSOLUTE (the only one in any oracle): the driver executes this
    // SQL in DuckDB from an unspecified working directory, so a
    // relative path would break the gate; the repo root is fixed by
    // the build environment. Re-rooting the checkout means re-pointing
    // this one literal.
    "f_g1_rbb_pipeline" ->
      """SELECT p_partkey, rx, ry, rw, rh, rtheta, cxmin, cymin, cw, ch
         FROM read_parquet('/root/repo/src/test/resources/rbb_golden.parquet')
         WHERE npart = (SELECT count(*) FROM part)
         ORDER BY p_partkey""",
    "f_g5_seg2bbox" ->
      s"""$triangleSqlCtes
          SELECT p_partkey,
                 least(x0,x1,x2) AS xmin, least(y0,y1,y2) AS ymin,
                 greatest(x0,x1,x2) - least(x0,x1,x2) AS w,
                 greatest(y0,y1,y2) - least(y0,y1,y2) AS h
          FROM tri ORDER BY p_partkey""",
    "f_g6_aabb2poly" ->
      s"""$triangleSqlCtes
          SELECT p_partkey,
                 to_json(LIST_VALUE(
                   CAST(x0 AS BIGINT), CAST(y0 AS BIGINT),
                   CAST(x0 + 1 + p_size AS BIGINT), CAST(y0 AS BIGINT),
                   CAST(x0 + 1 + p_size AS BIGINT), CAST(y0 + 2 + p_partkey % 9 AS BIGINT),
                   CAST(x0 AS BIGINT), CAST(y0 + 2 + p_partkey % 9 AS BIGINT))) AS poly_json
          FROM tri ORDER BY p_partkey""",
    "f_g7_rect2poly" ->
      s"""$triangleSqlCtes
          SELECT p_partkey,
                 to_json(LIST_VALUE(
                   CAST(x0 AS BIGINT), CAST(y0 AS BIGINT),
                   CAST(x1 AS BIGINT), CAST(y0 AS BIGINT),
                   CAST(x1 AS BIGINT), CAST(y2 AS BIGINT),
                   CAST(x0 AS BIGINT), CAST(y2 AS BIGINT),
                   CAST(x0 AS BIGINT), CAST(y0 AS BIGINT))) AS poly_json
          FROM tri ORDER BY p_partkey""",
    "a6_array_minmax" ->
      s"""$triangleSqlCtes
          SELECT p_partkey,
                 least(x0,x1,x2) AS xmin, least(y0,y1,y2) AS ymin,
                 greatest(x0,x1,x2) AS xmax, greatest(y0,y1,y2) AS ymax
          FROM tri ORDER BY p_partkey""",
    "f_g1_rect_rcoco" ->
      """WITH rect AS (
           SELECT p_partkey,
                  CAST(p_partkey % 50 AS DOUBLE) AS x0,
                  CAST(p_partkey % 37 AS DOUBLE) AS y0,
                  2 + CAST(p_size % 13 AS DOUBLE) AS w,
                  3 + CAST(p_partkey % 7 AS DOUBLE) AS h
           FROM part)
         SELECT p_partkey, x0 AS x, y0 AS y, w, h, CAST(0.0 AS DOUBLE) AS theta
         FROM rect ORDER BY p_partkey""",
    "f_g1_aa_coco" ->
      s"""$triangleSqlCtes
          SELECT p_partkey,
                 least(x0,x1,x2) AS xmin, least(y0,y1,y2) AS ymin,
                 greatest(x0,x1,x2) - least(x0,x1,x2) AS w,
                 greatest(y0,y1,y2) - least(y0,y1,y2) AS h
          FROM tri WHERE p_partkey % 10 <> 0 ORDER BY p_partkey""",
    "f_g8_yolo_bbox" ->
      s"""$triangleSqlCtes
          SELECT p_partkey,
                 (least(x0,x1,x2)/640.0 + greatest(x0,x1,x2)/640.0)/2 AS cx,
                 (greatest(y0,y1,y2)/480.0 + least(y0,y1,y2)/480.0)/2 AS cy,
                 greatest(x0,x1,x2)/640.0 - least(x0,x1,x2)/640.0 AS w,
                 greatest(y0,y1,y2)/480.0 - least(y0,y1,y2)/480.0 AS h
          FROM tri ORDER BY p_partkey""",
    // The calipers/rotation values are not SQL-expressible; their
    // CONTRACT is (see the query comment): four constant-TRUE booleans
    // per part row.
    "f_g1_rbb_area_law" ->
      """SELECT p_partkey, TRUE AS defined, TRUE AS area_law,
                TRUE AS hw_unclamped, TRUE AS theta_bounded
         FROM part ORDER BY p_partkey"""
  )
}
