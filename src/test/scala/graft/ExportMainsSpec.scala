package graft

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}

/** S12 CLI entry points end-to-end: parquet inputs → main(args) → output
  * files. (The reference's YOLO CLI is unrunnable — missing required
  * arg, create_yolo_from_feather.py:86 — so the spec here is the
  * function-signature behavior.)
  */
class ExportMainsSpec extends SparkSpec {
  import spark.implicits._

  private def writeInputs(dir: String): (String, String) = {
    val annos = Seq(
      ("img_a", "cat", 1L, Seq(0.0, 0.0, 8.0, 0.0, 8.0, 4.0, 0.0, 4.0), Seq(0.0, 0.0, 8.0, 4.0, 0.0)),
      ("img_b", "dog", 2L, Seq(2.0, 2.0, 6.0, 2.0, 6.0, 6.0, 2.0, 6.0), Seq(2.0, 2.0, 4.0, 4.0, 0.0))
    ).toDF("image_name", "category", "anno_key", "segmentation", "rcoco")
      .withColumn("rbox", org.apache.spark.sql.functions.col("segmentation"))
    val images = Seq(("img_a", 100L, 50L), ("img_b", 200L, 100L))
      .toDF("image_name", "width", "height")
    val (ap, ip) = (s"$dir/annos", s"$dir/images")
    annos.write.parquet(ap)
    images.write.parquet(ip)
    (ap, ip)
  }

  test("CocoMain CLI writes a parseable COCO document") {
    val dir = Files.createTempDirectory("clicoco").toString
    val (ap, ip) = writeInputs(dir)
    val out = s"$dir/out.json"
    graft.export.ExportMains.CocoMain.main(Array(ap, ip, out))
    val root = new ObjectMapper().readTree(Files.readString(Paths.get(out)))
    assert(root.get("annotations").size() == 2)
    assert(root.get("categories").get(0).get("name").asText() == "cat")
  }

  test("YoloMain CLI writes one txt per image") {
    val dir = Files.createTempDirectory("cliyolo").toString
    val (ap, ip) = writeInputs(dir)
    val out = s"$dir/labels"
    graft.export.ExportMains.YoloMain.main(Array(ap, ip, out))
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("img_a.txt", "img_b.txt"))
    val line = Files.readString(Paths.get(out, "img_a.txt")).trim
    assert(line.startsWith("1 ")) // cat → id 1
  }

  test("bad usage is rejected") {
    assertThrows[IllegalArgumentException] {
      graft.export.ExportMains.CocoMain.main(Array("only-one-arg"))
    }
  }
}
