package graft

import graft.functions.ImageOps
import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** F-B1..B4 kernels against in-test-generated JPEGs, including a
  * hand-constructed EXIF APP1 segment (no image libs exist in this
  * container to mint one).
  */
class ImageOpsSpec extends AnyFunSuite {

  /** 4x2 image: left half red, right half blue. */
  private def testImage(w: Int = 4, h: Int = 2): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, if (x < w / 2) 0xFF0000 else 0x0000FF)
    img
  }

  private def jpegBytes(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  /** Splice a minimal EXIF APP1 (big-endian TIFF, one IFD entry:
    * orientation) right after SOI.
    */
  private def withExifOrientation(jpeg: Array[Byte], orientation: Int): Array[Byte] = {
    val tiff = Array[Byte](
      'M', 'M', 0, 42, // big-endian TIFF magic
      0, 0, 0, 8, // IFD0 offset
      0, 1, // 1 entry
      0x01, 0x12, // tag 0x0112 orientation
      0, 3, // type SHORT
      0, 0, 0, 1, // count
      (orientation >> 8).toByte, orientation.toByte, 0, 0, // value
      0, 0, 0, 0) // next IFD
    val exif = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val segLen = exif.length + 2
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte,
      (segLen >> 8).toByte, segLen.toByte) ++ exif
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  test("dims reads width/height without full decode (F-B4)") {
    assert(ImageOps.dims(jpegBytes(testImage(7, 3))).contains((7, 3)))
    assert(ImageOps.dims("not an image".getBytes).isEmpty)
  }

  test("exifOrientation parses a hand-built APP1 segment") {
    val plain = jpegBytes(testImage())
    assert(ImageOps.exifOrientation(plain).isEmpty)
    for (o <- Seq(1, 3, 6, 8))
      assert(ImageOps.exifOrientation(withExifOrientation(plain, o)).contains(o))
  }

  test("normalizeOrientation rotates tag-6 (90 CW) images (F-B1)") {
    val src = jpegBytes(testImage(4, 2))
    val rotated = ImageOps.normalizeOrientation(withExifOrientation(src, 6)).get
    assert(ImageOps.dims(rotated).contains((2, 4))) // dimensions swap
    // tag 3 (180°) keeps dims
    assert(ImageOps.dims(ImageOps.normalizeOrientation(withExifOrientation(src, 3)).get)
      .contains((4, 2)))
    // no EXIF → pass-through decode/encode
    assert(ImageOps.dims(ImageOps.normalizeOrientation(src).get).contains((4, 2)))
  }

  test("redact fills polygon regions black (F-B2)") {
    val img = testImage(16, 16)
    val bytes = jpegBytes(img)
    val redacted = ImageOps.redact(bytes,
      Seq(Array(0.0, 0.0, 15.0, 0.0, 15.0, 15.0, 0.0, 15.0))).get
    val back = ImageOps.decode(redacted).get
    // center pixel of a fully-covered image is (near) black after JPEG loss
    val c = back.getRGB(8, 8)
    val lum = ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)
    assert(lum < 60, s"center not blackened: ${c.toHexString}")
    assert(ImageOps.redact("junk".getBytes, Seq(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0))).isEmpty)
  }

  // --- EXIF group-action property (SURVEY §5, F-B1) ---------------------
  // The orientation tags act on the image as the rotation group
  // {1, 3, 6, 8} ≅ Z4: normalizeOrientation must invert each action.
  // ScalaCheck sweeps sizes × quadrant-color permutations × tags; pixel
  // agreement is checked at quadrant centers with a JPEG-loss tolerance
  // (quadrants are ≥8 px so 4:2:0 chroma subsampling can't bleed there).

  private val palette = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00)

  /** Four solid color quadrants (TL, TR, BL, BR). */
  private def quadImage(w: Int, h: Int, cols: Seq[Int]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val q = (if (y < h / 2) 0 else 2) + (if (x < w / 2) 0 else 1)
      img.setRGB(x, y, cols(q))
    }
    img
  }

  /** Source pixel that must land at output (x, y) after the tag-k
    * correction (3 → 180°, 6 → 90° CW, 8 → 270° CW; CvatApi.py:228-237).
    */
  private def srcPixel(k: Int, w: Int, h: Int, x: Int, y: Int): (Int, Int) = k match {
    case 3 => (w - 1 - x, h - 1 - y)
    case 6 => (y, h - 1 - x)
    case 8 => (w - 1 - y, x)
    case _ => (x, y)
  }

  private def channelClose(a: Int, b: Int, tol: Int): Boolean =
    Seq(16, 8, 0).forall(s => math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff)) <= tol)

  /** Quadrant-center agreement between a decoded image and the expected
    * source-quadrant colors under the tag-k mapping.
    */
  private def quadrantsMatch(out: BufferedImage, k: Int, w: Int, h: Int,
                             cols: Seq[Int]): Boolean = {
    val (ow, oh) = (out.getWidth, out.getHeight)
    (for (cx <- Seq(ow / 4, 3 * ow / 4); cy <- Seq(oh / 4, 3 * oh / 4)) yield {
      val (sx, sy) = srcPixel(k, w, h, cx, cy)
      val q = (if (sy < h / 2) 0 else 2) + (if (sx < w / 2) 0 else 1)
      channelClose(out.getRGB(cx, cy), cols(q), 60)
    }).forall(identity)
  }

  test("normalizeOrientation inverts every EXIF group action (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      w <- Gen.oneOf(16, 24, 32)
      h <- Gen.oneOf(16, 24, 32)
      cols <- Gen.oneOf(palette.permutations.toSeq)
      k <- Gen.oneOf(1, 3, 6, 8)
    } yield (w, h, cols, k)
    val prop = Prop.forAll(gen) { case (w, h, cols, k) =>
      val src = jpegBytes(quadImage(w, h, cols))
      val normalized = ImageOps.normalizeOrientation(withExifOrientation(src, k)).get
      val out = ImageOps.decode(normalized).get
      val dimsOk =
        if (k == 6 || k == 8) (out.getWidth, out.getHeight) == (h, w)
        else (out.getWidth, out.getHeight) == (w, h)
      // the normalized image must carry no orientation left to apply,
      // so a second normalize is (up to JPEG re-quantization) a no-op
      val again = ImageOps.decode(ImageOps.normalizeOrientation(normalized).get).get
      val idempotent = (again.getWidth, again.getHeight) ==
        (out.getWidth, out.getHeight) && quadrantsMatch(again, k, w, h, cols)
      dimsOk && quadrantsMatch(out, k, w, h, cols) && idempotent
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150), prop)
    assert(res.passed, s"EXIF group action: ${res.status}")
  }

  test("resize produces exact target dims and preserves gross content") {
    val src = jpegBytes(testImage(16, 8))
    val out = ImageOps.resize(src, 8, 4)
    assert(out.isDefined)
    assert(ImageOps.dims(out.get).contains((8, 4)))
    // left half still red-ish, right half still blue-ish after bilinear
    val img = ImageOps.decode(out.get).get
    val left = new java.awt.Color(img.getRGB(1, 2))
    val right = new java.awt.Color(img.getRGB(6, 2))
    assert(left.getRed > left.getBlue, s"left pixel not red-ish: $left")
    assert(right.getBlue > right.getRed, s"right pixel not blue-ish: $right")
  }

}
