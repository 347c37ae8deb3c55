package graft

import graft.lake.Lake
import graft.schemas.Schemas
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

/** Schema-catalog dispatch (ref TrainDatasets.py:165-171): each dataset
  * name must select the reference's (schema, projection) pair, and the
  * pair must drive a declared-schema lake read end-to-end.
  */
class SchemasSpec extends SparkSpec {

  test("od_rbb selects the default anno schema with the rotated-box projection") {
    val (schema, proj) = Schemas.forDataset("od_rbb")
    assert(schema == Schemas.anno)
    assert(proj == Schemas.rbbAnnoProj)
    // the rbb projection drops track_id and gt_attr (TrainDatasets.py:25-36)
    val names = proj.map(_._1)
    assert(!names.contains("track_id") && !names.contains("gt_attr"))
    assert(names.contains("rcoco") && names.contains("coco"))
  }

  test("4d_od swaps in the 4d schema AND projection") {
    val (schema, proj) = Schemas.forDataset("4d_od")
    assert(schema == Schemas.fourDAnno)
    assert(proj == Schemas.fourDAnnoProj)
    assert(proj.map(_._1).contains("report_id"))
  }

  test("any other dataset id gets the axis-aligned projection over the default schema") {
    for (name <- Seq("od_aa", "something_else", "")) {
      val (schema, proj) = Schemas.forDataset(name)
      assert(schema == Schemas.anno)
      assert(proj == Schemas.aaAnnoProj)
    }
    // the aa projection reads the legacy `bbox` field (TrainDatasets.py:60-68)
    assert(Schemas.aaAnnoProj.map(_._1).contains("bbox"))
  }

  test("aa projection mirrors the reference's legacy-bbox pairing") {
    import spark.implicits._
    val (_, proj) = Schemas.forDataset("od_aa")
    // over a legacy-shaped frame that carries bbox, the projection works
    val legacy = Seq((1L, 2L, 3L, "img.jpg", "cat", Seq(1f, 2f, 3f, 4f),
      new java.sql.Timestamp(0L)))
      .toDF("project_id", "task_id", "job_id", "image_name", "category", "bbox", "ts")
    val out = Schemas.projectionWithCast(legacy, proj)
    assert(out.columns.toSeq == proj.map(_._1) && out.count() == 1)
    // over an anno-schema frame WITHOUT bbox it fails to resolve — the
    // reference's own inconsistency (aa_anno_proj vs anno_schema),
    // preserved deliberately (see Schemas.forDataset scaladoc)
    val annoShaped = legacy.drop("bbox")
    intercept[org.apache.spark.sql.AnalysisException] {
      Schemas.projectionWithCast(annoShaped, proj)
    }
  }

  test("dispatch pair drives a declared read + projection end-to-end (od_rbb)") {
    val dir = Files.createTempDirectory("graft-schemas").toString
    val rows = (1 to 6).map { i =>
      Row(i.toLong, i.toLong, i.toLong % 2, -1L, s"img_$i.jpg", "tool",
        Seq(1f, 2f, 3f, 4f, 5f, 6f), Seq(1f, 1f, 4f, 2f, 0.5f),
        Seq(1f, 1f, 3f, 1f), i.toLong, """[{"iid": 1}]""",
        Timestamp.valueOf("2024-01-01 00:00:00"))
    }
    val (schema, proj) = Schemas.forDataset("od_rbb")
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    new Lake(spark).appendPartitioned(df, dir, Seq("project_id", "job_id"))
    val back = Schemas.projectionWithCast(
      new Lake(spark).readDeclared(dir, schema), proj)
    assert(back.columns.toSeq == proj.map(_._1))
    assert(back.schema("project_id").dataType == LongType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.count() == 6)
  }
}
