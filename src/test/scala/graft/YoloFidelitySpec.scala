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

  test("written directory tree matches the yoloLines manifest (names + line counts)") {
    // The file sink's contract is exactly its relational manifest
    // (yoloLines, hash-checked as s11_yolo_lines): one {image_name}.txt
    // per ANNOTATED image — an image with no annotations must produce
    // no file (P8 semi-filter) — whose content is the manifest body and
    // whose line count is n_annos. Driven by the full Synth frames at
    // the test scale, not a hand fixture, so the executor-side fan-out
    // path is exercised across real partitions.
    val annos = graft.queries.Synth.annos(spark, sf())
    val images = graft.queries.Synth.images(spark, sf())
      .unionByName(spark.sql(
        "SELECT 'img_unannotated' AS image_name, CAST(640 AS BIGINT) AS width, " +
        "CAST(480 AS BIGINT) AS height, CAST(array() AS array<string>) AS tags"))
    val catMap = Coco.categoryDim(annos)
    val dir = Files.createTempDirectory("yolofid-layout").toString
    Yolo.writeYoloDataset(annos, images, catMap, "anno_key", dir)
    val manifest = Yolo.yoloLines(annos, images, catMap, "anno_key")
      .select("image_name", "body", "n_annos").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(manifest.nonEmpty)
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files == manifest.keySet.map(_ + ".txt"),
      s"file tree diverges from manifest: ${files.size} files vs ${manifest.size} manifest rows")
    assert(!files.contains("img_unannotated.txt"),
      "an image with no annotations must produce no file")
    for ((name, (body, n)) <- manifest) {
      val content = Files.readString(Paths.get(dir, name + ".txt"))
      assert(content == body + "\n", s"$name.txt content diverges from manifest body")
      assert(content.trim.split("\n").length.toLong == n,
        s"$name.txt line count != n_annos=$n")
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
