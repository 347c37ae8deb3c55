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
