package graft

import graft.export.ImageDataset
import graft.functions.ImageOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** S9 composed pipeline (TrainDatasets.py:318-368): probe → badimage
  * skip → excluderegion redaction → per-image JPEG files + manifest.
  */
class ImageDatasetSpec extends SparkSpec {

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
    ImageOps.encodeJpeg(img).get
  }

  private val imgSchema = StructType(Seq(
    StructField("image_name", StringType),
    StructField("image_bytes", BinaryType),
    StructField("tags", ArrayType(StringType))))
  private val annoSchema = StructType(Seq(
    StructField("image_name", StringType),
    StructField("category", StringType),
    StructField("segmentation", ArrayType(DoubleType))))

  test("writes redacted JPEGs, skips badimage, returns the manifest") {
    val white = 0xFFFFFF
    val images = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("plain", jpeg(20, 16, white), Seq("ok")),
        Row("redactme", jpeg(20, 16, white), Seq[String]()),
        Row("broken", jpeg(12, 10, white), Seq[String]()),
        Row("bad", jpeg(20, 16, white), Seq("x", "badimage")),
        Row("unannotated", jpeg(20, 16, white), Seq[String]())),
      imgSchema)
    // left half of 'redactme' blacked out; 'broken.ext' exercises the
    // splitext normalization on the anno side; 'unannotated' has no
    // anno row so the probe must drop it
    val annos = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("plain", "dog", Seq(0.0, 0.0, 4.0, 0.0, 4.0, 4.0)),
        Row("redactme", "excluderegion", Seq(0.0, 0.0, 10.0, 0.0, 10.0, 16.0, 0.0, 16.0)),
        Row("redactme", "dog", Seq(1.0, 1.0, 2.0, 1.0, 2.0, 2.0)),
        Row("broken.jpg", "dog", Seq(0.0, 0.0, 1.0, 0.0, 1.0, 1.0)),
        Row("bad", "dog", Seq(0.0, 0.0, 1.0, 0.0, 1.0, 1.0))),
      annoSchema)
    val dir = java.nio.file.Files.createTempDirectory("image-ds").toString
    val manifest = ImageDataset.writeImages(annos, images, dir)
      .collect().map(r => r.getString(0) -> r).toMap

    assert(manifest.keySet == Set("plain", "redactme", "broken"),
      s"manifest: ${manifest.keySet}")
    assert(manifest("plain").getInt(1) == 20 && manifest("plain").getInt(2) == 16)
    assert(manifest("plain").getInt(3) == 0)
    assert(manifest("redactme").getInt(3) == 1)

    def file(n: String) = java.nio.file.Paths.get(dir, n + ".jpeg")
    assert(java.nio.file.Files.exists(file("plain")))
    assert(java.nio.file.Files.exists(file("redactme")))
    assert(java.nio.file.Files.exists(file("broken")))
    assert(!java.nio.file.Files.exists(file("bad")), "badimage must be skipped")
    assert(!java.nio.file.Files.exists(file("unannotated")), "probe must drop unannotated")

    // redaction content: left half black, right half still white-ish
    val written = ImageOps.decode(
      java.nio.file.Files.readAllBytes(file("redactme"))).get
    def lum(x: Int, y: Int): Int = {
      val p = written.getRGB(x, y)
      ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3
    }
    assert(lum(2, 8) < 60, s"redacted pixel too bright: ${lum(2, 8)}")
    assert(lum(15, 8) > 180, s"unredacted pixel darkened: ${lum(15, 8)}")
    // the unredacted image survives the re-encode intact
    val plain = ImageOps.decode(java.nio.file.Files.readAllBytes(file("plain"))).get
    assert(plain.getWidth == 20 && plain.getHeight == 16)
  }

  test("writeItemCrops: per-item subdirectories, only requested ids (N1 variant)") {
    val cropSchema = StructType(Seq(
      StructField("item_id", LongType),
      StructField("image_name", StringType),
      StructField("crop_data", BinaryType)))
    val crops = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(7L, "a", jpeg(10, 8, 0xFF0000)),
        Row(7L, "b", jpeg(12, 9, 0x00FF00)),
        Row(9L, "c", jpeg(14, 10, 0x0000FF)),
        // undecodable bytes for a REQUESTED id: documented deviation —
        // dropped from the manifest, no file, no crash
        Row(9L, "junk", Array[Byte](1, 2, 3)),
        Row(11L, "d", jpeg(16, 11, 0x808080))),
      cropSchema)
    val dir = java.nio.file.Files.createTempDirectory("n1-crops").toString
    val manifest = ImageDataset.writeItemCrops(crops, Seq(7L, 9L), dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(manifest == Set((7L, "a", 10, 8), (7L, "b", 12, 9), (9L, "c", 14, 10)))
    def p(iid: Long, n: String) = java.nio.file.Paths.get(dir, iid.toString, n + ".jpeg")
    for ((iid, n) <- Seq((7L, "a"), (7L, "b"), (9L, "c"))) {
      val img = ImageOps.decode(java.nio.file.Files.readAllBytes(p(iid, n))).get
      assert(img.getWidth > 0)
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "11")),
      "unrequested item id must not be exported")
    assert(!java.nio.file.Files.exists(p(9L, "junk")),
      "undecodable crop must be dropped, not written")
  }
}
