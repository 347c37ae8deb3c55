package graft

import graft.functions.{GeomFunctions, Geometry}
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Native geometry expressions (the promoted GeomUdfs): value parity
  * with the Scala kernels, null/degenerate handling, codegen
  * participation (no ScalaUDF node), and proof every expression's
  * generated Java actually compiles (fallback=false) — the
  * nearest-cell regression showed "in the plan" does not imply
  * "compiled".
  */
class GeomExprSpec extends SparkSpec {
  import spark.implicits._

  private def polys = Seq(
    (1L, Seq(0.0, 0.0, 10.0, 0.0, 10.0, 6.0, 0.0, 6.0)),   // rectangle
    (2L, Seq(3.0, 1.0, 9.0, 2.0, 5.0, 8.0)),               // triangle
    (3L, Seq(0.0, 0.0, 4.0, 0.0, 8.0, 0.0)),               // collinear → degenerate
    (4L, null.asInstanceOf[Seq[Double]])
  ).toDF("id", "seg")

  test("native expressions match the Geometry kernels bitwise") {
    val rows = polys.filter(col("seg").isNotNull)
      .select(col("id"), col("seg"),
        GeomFunctions.segmentation2bbox(col("seg")).as("bbox"),
        GeomFunctions.rbbFromSeg(col("seg")).as("rcoco"),
        GeomFunctions.cocoFromSeg(col("seg")).as("coco"),
        GeomFunctions.yoloBbox(lit(640.0), lit(480.0), col("seg")).as("yb"),
        GeomFunctions.yoloSegmentation(lit(640.0), lit(480.0), col("seg")).as("ys"))
      .collect()
    for (r <- rows) {
      val seg = r.getSeq[Double](1).toArray
      def arr(i: Int): Array[Double] =
        if (r.isNullAt(i)) null else r.getSeq[Double](i).toArray
      assert(java.util.Arrays.equals(arr(2), Geometry.segmentation2bbox(seg)))
      val expected = Geometry.rbbCocoFromSeg(seg)
      assert(java.util.Arrays.equals(arr(3), expected.map(_._1).orNull),
        s"rcoco mismatch for id=${r.getLong(0)}")
      assert(java.util.Arrays.equals(arr(4), expected.map(_._2).orNull))
      assert(java.util.Arrays.equals(arr(5),
        if (seg.isEmpty) null else Geometry.yoloBbox(640.0, 480.0, seg)))
      assert(java.util.Arrays.equals(arr(6),
        Geometry.yoloSegmentation(640.0, 480.0, seg)))
    }
    // the degenerate collinear polygon nulls the rotated path (P9) but
    // keeps the axis-aligned bbox
    val degen = rows.find(_.getLong(0) == 3L).get
    assert(degen.isNullAt(3) && degen.isNullAt(4) && !degen.isNullAt(2))
  }

  test("aabb2poly / rectToPolygon parity and short-input nulls") {
    val r = Seq((Seq(2.0, 3.0, 4.0, 5.0), Seq(1.0, 2.0, 7.0, 9.0), Seq(1.0)))
      .toDF("aabb", "ltrb", "short")
      .select(GeomFunctions.aabb2poly(col("aabb")).as("p1"),
        GeomFunctions.rectToPolygon(col("ltrb")).as("p2"),
        GeomFunctions.aabb2poly(col("short")).as("n1"),
        GeomFunctions.rectToPolygon(col("short")).as("n2"),
        GeomFunctions.segmentation2bbox(array().cast("array<double>")).as("n3"))
      .head()
    assert(r.getSeq[Double](0).toArray.sameElements(
      Geometry.aabb2poly(Array(2.0, 3.0, 4.0, 5.0))))
    assert(r.getSeq[Double](1).toArray.sameElements(
      Geometry.rectToPolygon(Array(1.0, 2.0, 7.0, 9.0))))
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("null input and non-positive canvas → null output") {
    val r = polys.filter(col("id") === 4)
      .select(GeomFunctions.rbbFromSeg(col("seg")),
        GeomFunctions.yoloBbox(lit(0.0), lit(480.0),
          array(lit(1.0), lit(2.0))))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("expressions stay inside codegen and compile under fallback=false") {
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // parquet-backed frame: local relations fold away before codegen
      val p = spark.read.parquet(s"${sf()}/part.parquet")
        .select(col("p_partkey"),
          array((col("p_partkey") % 50).cast("double"),
                (col("p_partkey") % 30).cast("double"),
                (col("p_partkey") % 50 + 7).cast("double"),
                (col("p_partkey") % 30).cast("double"),
                (col("p_partkey") % 50).cast("double"),
                (col("p_partkey") % 30 + 5).cast("double")).as("seg"))
      val out = p.select(
          GeomFunctions.segmentation2bbox(col("seg")).as("bbox"),
          GeomFunctions.rbbFromSeg(col("seg")).as("rcoco"),
          GeomFunctions.cocoFromSeg(col("seg")).as("coco"),
          GeomFunctions.rbbCoco(col("seg")).as("rc"),
          GeomFunctions.aabb2poly(col("seg")).as("poly"),
          GeomFunctions.rectToPolygon(col("seg")).as("rp"),
          GeomFunctions.yoloBbox(lit(640.0), lit(480.0), col("seg")).as("yb"),
          GeomFunctions.yoloSegmentation(lit(640.0), lit(480.0), col("seg")).as("ys"))
      assert(out.filter(col("rcoco").isNotNull).count() > 0)
      // the struct form must agree with the separate expressions
      assert(out.filter((col("rc").isNull =!= col("rcoco").isNull) ||
        (col("rc.rcoco") =!= col("rcoco")) || (col("rc.coco") =!= col("coco")))
        .count() == 0, "rbbCoco struct diverges from rbbFromSeg/cocoFromSeg")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("UDF(") && !plan.contains("ScalaUDF"), plan.take(2000))
      for (name <- Seq("graft_seg2bbox", "graft_rbb_from_seg", "graft_coco_from_seg",
                       "graft_rbb_coco", "graft_aabb2poly", "graft_rect2poly",
                       "graft_yolo_bbox", "graft_yolo_seg"))
        assert(plan.contains(name), s"$name missing from plan")
      // SQL-registered forms resolve too
      assert(spark.sql(
        "SELECT graft_seg2bbox(array(0.0d, 0.0d, 3.0d, 4.0d)) AS b").head() != null)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("type mismatch is rejected at analysis for non-castable input") {
    GraftFunctions.register(spark)
    val bad = Seq(("abc")).toDF("s")
    val e = intercept[Exception](
      bad.selectExpr("graft_rbb_from_seg(s)").collect())
    assert(e.getMessage.contains("graft_rbb_from_seg") ||
      e.getMessage.contains("DATATYPE"), e.getMessage.take(300))
  }
}
