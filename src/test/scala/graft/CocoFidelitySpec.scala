package graft

import graft.export.Coco
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Differential test: our COCO document vs the output of the
  * reference's own write_coco_dataset executed on the same fixture
  * (tools/mint_coco_golden.py). Fixture rows are pre-sorted so the
  * reference's insertion-order ids coincide with our deterministic
  * sort-order ids; info/licenses are deliberately neutral on our side
  * and excluded from the comparison.
  */
class CocoFidelitySpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val golden: JsonNode =
    mapper.readTree(new java.io.File("src/test/resources/coco_golden.json"))

  private def fixtureFrames = {
    val annos = golden.get("fixture").get("annos").elements().asScala.toSeq.map { a =>
      def arr(i: Int) = a.get(i).elements().asScala.map(_.asDouble()).toSeq
      (a.get(0).asText(), a.get(1).asText(), a.get(2).asLong(), arr(3), arr(4), arr(5))
    }.toDF("image_name", "category", "anno_key", "segmentation", "rcoco", "rbox")
    val images = golden.get("fixture").get("images").elements().asScala.toSeq
      .map(i => (i.get(0).asText(), i.get(1).asLong(), i.get(2).asLong()))
      .toDF("image_name", "width", "height")
    (annos, images)
  }

  private def assertSameDoc(mine: JsonNode, ref: JsonNode, variant: String): Unit = {
    // categories: identical content and order
    assert(mine.get("categories").toString == ref.get("categories").toString, variant)
    // images: same ids/dims/file names
    val (mi, ri) = (mine.get("images"), ref.get("images"))
    assert(mi.size() == ri.size(), variant)
    for (k <- 0 until mi.size(); f <- Seq("file_name", "height", "width", "id"))
      assert(mi.get(k).get(f).toString == ri.get(k).get(f).toString, s"$variant images[$k].$f")
    // annotations: field-by-field, numeric tolerance on floats
    val (ma, ra) = (mine.get("annotations"), ref.get("annotations"))
    assert(ma.size() == ra.size(), variant)
    for (k <- 0 until ma.size()) {
      val (m, r) = (ma.get(k), ra.get(k))
      for (f <- Seq("iscrowd", "image_id", "category_id", "id"))
        assert(m.get(f).asLong() == r.get(f).asLong(), s"$variant annos[$k].$f")
      assert(math.abs(m.get("area").asDouble() - r.get("area").asDouble()) < 1e-9,
        s"$variant annos[$k].area")
      val (mb, rb) = (m.get("bbox"), r.get("bbox"))
      assert(mb.size() == rb.size(), s"$variant annos[$k].bbox size")
      for (j <- 0 until mb.size())
        assert(math.abs(mb.get(j).asDouble() - rb.get(j).asDouble()) < 1e-9,
          s"$variant annos[$k].bbox[$j]")
      assert(m.has("segmentation") == r.has("segmentation"), s"$variant annos[$k].seg?")
      if (r.has("segmentation")) {
        val (ms, rs) = (m.get("segmentation").get(0), r.get("segmentation").get(0))
        assert(ms.size() == rs.size(), s"$variant annos[$k].seg size")
        for (j <- 0 until ms.size())
          assert(math.abs(ms.get(j).asDouble() - rs.get(j).asDouble()) < 1e-9,
            s"$variant annos[$k].seg[$j]")
      }
    }
  }

  test("COCO output matches the reference exporter on all three variants") {
    val (annos, images) = fixtureFrames
    for ((variant, train, odtk) <- Seq(("odtk_eval", false, true),
                                       ("odtk_train", true, true), ("d2", true, false))) {
      val mine = mapper.readTree(Coco.cocoDocument(annos, images, "anno_key", train, odtk))
      assertSameDoc(mine, golden.get(variant), variant)
    }
  }
}
