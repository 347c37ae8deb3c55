package graft

import graft.export.{Coco, Yolo}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Differential test: our YOLO files vs the reference's own
  * write_yolo_dataset output on a shared fixture
  * (tools/mint_yolo_golden.py). Lines are compared token-wise with
  * numeric tolerance (Java and Python shortest-roundtrip float
  * formatting differ below 1e-3).
  */
class YoloFidelitySpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val golden: JsonNode =
    mapper.readTree(new java.io.File("src/test/resources/yolo_golden.json"))

  private def fixtureFrames = {
    val annos = golden.get("fixture").get("annos").elements().asScala.toSeq.map { a =>
      (a.get(0).asText(), a.get(1).asText(), a.get(2).asLong(),
        a.get(3).elements().asScala.map(_.asDouble()).toSeq)
    }.toDF("image_name", "category", "anno_key", "segmentation")
    val images = golden.get("fixture").get("images").elements().asScala.toSeq
      .map(i => (i.get(0).asText(), i.get(1).asLong(), i.get(2).asLong()))
      .toDF("image_name", "width", "height")
    (annos, images)
  }

  private def assertFilesMatch(dir: String, want: JsonNode, variant: String): Unit = {
    val wantFiles = want.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    val gotFiles = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(gotFiles == wantFiles.keySet, s"$variant: $gotFiles vs ${wantFiles.keySet}")
    for ((fn, refBody) <- wantFiles) {
      val mineLines = Files.readString(Paths.get(dir, fn)).trim.split("\n")
      val refLines = refBody.trim.split("\n")
      assert(mineLines.length == refLines.length, s"$variant/$fn line count")
      for ((m, r) <- mineLines.zip(refLines)) {
        val (mt, rt) = (m.split(" "), r.split(" "))
        assert(mt.length == rt.length, s"$variant/$fn token count: '$m' vs '$r'")
        assert(mt.head == rt.head, s"$variant/$fn category: '$m' vs '$r'")
        for ((a, b) <- mt.tail.zip(rt.tail))
          assert(math.abs(a.toDouble - b.toDouble) <= 1e-12 * math.max(1, math.abs(b.toDouble)),
            s"$variant/$fn: $a != $b in '$m' vs '$r'")
      }
    }
  }

  test("YOLO output matches the reference exporter (bbox + segmentation modes)") {
    val (annos, images) = fixtureFrames
    val catMap = Coco.categoryDim(annos) // lexicographic ids from 1 = golden cat_map
    for ((variant, seg) <- Seq(("bbox", false), ("segmentation", true))) {
      val dir = Files.createTempDirectory(s"yolofid-$variant").toString
      Yolo.writeYoloDataset(annos, images, catMap, "anno_key", dir, segmentation = seg)
      assertFilesMatch(dir, golden.get(variant), variant)
    }
  }
}
