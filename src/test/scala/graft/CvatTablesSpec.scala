package graft

import graft.ingest.CvatTables
import org.apache.spark.sql.functions._

/** Ingestion tabularization: rect→polygon conversion, degenerate guards,
  * geometry application, filename normalization, gt_attr JSON — the
  * distributed re-expression of the reference's per-row loop
  * (CvatApi.py:327-425).
  */
class CvatTablesSpec extends SparkSpec {
  import spark.implicits._

  private def shapesFixture = Seq(
    // polygon with iid + text attrs
    (1L, 0, 11, "polygon", Seq(0.0, 0.0, 10.0, 0.0, 10.0, 8.0, 0.0, 8.0),
      Seq((5, "42"), (6, "note")), -1L),
    // rectangle → becomes 10-coord polygon
    (2L, 1, 12, "rectangle", Seq(1.0, 2.0, 5.0, 6.0), Seq.empty[(Int, String)], -1L),
    // too few points → dropped
    (3L, 0, 11, "polygon", Seq(1.0, 2.0), Seq.empty[(Int, String)], -1L),
    // collinear (degenerate min-rect) → dropped
    (4L, 1, 11, "polygon", Seq(0.0, 0.0, 5.0, 0.0, 10.0, 0.0), Seq.empty[(Int, String)], -1L)
  ).toDF("anno_uid", "frame", "label_id", "shape_type", "points", "attributes", "track_id")
    .withColumn("attributes",
      expr("transform(attributes, a -> named_struct('spec_id', a._1, 'value', a._2))"))

  private def labels = Seq((11, "dog"), (12, "cat")).toDF("label_id", "category")
  private def images = Seq((0, "t3_scene_a.jpg.jpeg"), (1, "plain.png"))
    .toDF("frame", "image_name")
  private def attrTypes = Seq((5, "Item ID"), (6, "Text")).toDF("spec_id", "attr_name")

  test("anno table: guards, geometry, names, gt_attr") {
    val out = CvatTables.buildAnnoTable(spark, shapesFixture, labels, images, attrTypes,
      projectId = 7, taskId = 1, jobId = 100)
    val rows = out.orderBy("image_name").collect()
    assert(rows.length == 2) // two guards dropped two shapes

    val byCat = rows.map(r => r.getAs[String]("category") -> r).toMap
    val dog = byCat("dog")
    assert(dog.getAs[String]("image_name") == "t3_scene_a") // ext + embedded .jpg removed
    assert(dog.getAs[String]("gt_attr") == """[{"iid": "42"}, {"text": "note"}]""")
    assert(dog.getAs[scala.collection.Seq[Float]]("coco") == Seq(0f, 0f, 10f, 8f))
    assert(dog.getAs[scala.collection.Seq[Float]]("rcoco").length == 5)

    val cat = byCat("cat")
    assert(cat.getAs[String]("image_name") == "plain")
    assert(cat.getAs[scala.collection.Seq[Float]]("segmentation").length == 10) // closed rect polygon
    assert(cat.getAs[String]("gt_attr") == "[]")
    assert(cat.getAs[Long]("project_id") == 7L)
  }

  test("anno table: dropPrefix removes the task prefix") {
    val out = CvatTables.buildAnnoTable(spark, shapesFixture, labels, images, attrTypes,
      7, 1, 100, dropPrefix = true)
    val names = out.select("image_name").collect().map(_.getString(0)).toSet
    assert(names.contains("scene_a")) // "t3_" prefix dropped
    assert(names.contains("plain"))   // single-segment name untouched
  }

  test("image table: tags joined per frame, missing tags → empty array") {
    val images2 = Seq((0, "a.png", Array[Byte](1, 2)), (1, "b.png", Array[Byte](3)))
      .toDF("frame", "image_name", "image_bytes")
    val tags = Seq((0, "badimage"), (0, "night")).toDF("frame", "tag")
    val out = CvatTables.buildImageTable(spark, images2, tags, 7, 1, 100,
      normalizeExif = false)
    val rows = out.orderBy("image_name").collect()
    assert(rows(0).getAs[String]("image_name") == "a")
    assert(rows(0).getAs[scala.collection.Seq[String]]("tags").toSet == Set("badimage", "night"))
    assert(rows(1).getAs[scala.collection.Seq[String]]("tags").isEmpty)
    assert(rows(0).getAs[Array[Byte]]("image_bytes").toSeq == Seq[Byte](1, 2))
  }
}
