package graft.functions

import java.awt.geom.AffineTransform
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Binary/image kernels over JPEG/PNG byte columns — the "multimodal
  * column" substance (SURVEY §2.8 F-B1..F-B4; ref CvatApi.py:223-239
  * `load_image_to_bytes`, TrainDatasets.py:296-310 `redact_segmentation`,
  * :354-355 dims, :405-416 decode-at-edge).
  *
  * JDK-only (ImageIO + AWT): the container has no Pillow/OpenCV, and at
  * cluster scale a JVM-native path avoids Python worker round-trips.
  * ImageIO does not expose EXIF, so the orientation tag is parsed by a
  * small hand-rolled JPEG APP1/TIFF walker (F-B1's hard part).
  */
object ImageOps {

  // ImageIO defaults to FILE-backed stream caches: every encode/decode
  // through a byte stream creates, writes and deletes a temp file.
  // This path is small-image/high-count (thousands of JPEGs per
  // partition), so memory-backed caches win; runs once per JVM when
  // the object loads on an executor.
  ImageIO.setUseCache(false)

  /** F-B4: (width, height) without full decode (header read). */
  def dims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(in); Some((r.getWidth(0), r.getHeight(0))) }
        finally r.dispose()
      }
    } finally in.close()
  }

  /** EXIF orientation (tag 0x0112) from JPEG APP1, or None. Walks JPEG
    * markers to APP1 "Exif\0\0", then the TIFF IFD0 entries; handles both
    * endiannesses. (ImageIO has no EXIF API — ref relies on Pillow's
    * `_getexif`, CvatApi.py:228-233.)
    */
  def exifOrientation(bytes: Array[Byte]): Option[Int] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16be(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u16be(0) != 0xFFD8) return None // not a JPEG
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if (u8(pos) != 0xFF) return None
      val marker = u8(pos + 1)
      if (marker == 0xDA || marker == 0xD9) return None // image data reached
      val segLen = u16be(pos + 2)
      if (marker == 0xE1 && pos + 4 + 6 <= bytes.length &&
          new String(bytes, pos + 4, 4, "US-ASCII") == "Exif") {
        val tiff = pos + 10 // after "Exif\0\0"
        if (tiff + 8 > bytes.length) return None
        val le = u8(tiff) == 0x49 // "II" little-endian vs "MM"
        def u16(i: Int): Int = if (le) u8(i) | (u8(i + 1) << 8) else u16be(i)
        def u32(i: Int): Long =
          if (le) (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24))
          else ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
        val ifd0 = tiff + u32(tiff + 4).toInt
        if (ifd0 + 2 > bytes.length) return None
        val n = u16(ifd0)
        var e = 0
        while (e < n) {
          val entry = ifd0 + 2 + 12 * e
          if (entry + 12 > bytes.length) return None
          if (u16(entry) == 0x0112) return Some(u16(entry + 8))
          e += 1
        }
        return None
      }
      pos += 2 + segLen
    }
    None
  }

  /** F-B1: decode, apply the EXIF orientation rotations the reference
    * handles (tag 3 → 180°, 6 → 90° CW, 8 → 270° CW; CvatApi.py:228-237),
    * re-encode as JPEG. Non-image bytes → None.
    */
  def normalizeOrientation(bytes: Array[Byte]): Option[Array[Byte]] = {
    val img = decode(bytes).getOrElse(return None)
    val rotated = exifOrientation(bytes) match {
      case Some(3) => rotate(img, 180)
      case Some(6) => rotate(img, 90)
      case Some(8) => rotate(img, 270)
      case _ => img
    }
    encodeJpeg(rotated)
  }

  /** F-B2: fill polygon regions black and re-encode
    * (redact_segmentation, TrainDatasets.py:296-310).
    */
  def redact(bytes: Array[Byte], polygons: Seq[Array[Double]]): Option[Array[Byte]] = {
    val img = decode(bytes).getOrElse(return None)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.BLACK)
      for (poly <- polygons if poly.length >= 6) {
        val n = poly.length / 2
        g.fillPolygon(Array.tabulate(n)(i => math.round(poly(2 * i)).toInt),
                      Array.tabulate(n)(i => math.round(poly(2 * i + 1)).toInt), n)
      }
    } finally g.dispose()
    encodeJpeg(img)
  }

  /** Resize to exact target dims (bilinear) — the multimodal
    * feature-extraction preprocessing step; runs where the bytes live,
    * one row at a time on the executor.
    */
  def resize(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    // None, not IllegalArgumentException: the file's contract is
    // Option-on-malformed, and one bad config value reaching
    // BufferedImage's ctor would otherwise kill a whole scan
    if (targetW <= 0 || targetH <= 0) None
    else decode(bytes).flatMap { img =>
      val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
      g.dispose()
      encodeJpeg(dst)
    }

  /** Perceptual difference-hash (dHash) for image near-dup: decode,
    * average-pool the luma into a 9×8 grid (integer block partition —
    * block c covers x ∈ [c·w/9, (c+1)·w/9)), then 64 bits where bit
    * (r·8+c) is set iff mean(r,c) < mean(r,c+1). Robust to re-encoding
    * noise when adjacent content blocks differ by more than the codec's
    * error — the property image near-dup detection relies on.
    */
  def dhash(bytes: Array[Byte]): Option[Long] =
    decode(bytes).filter(i => i.getWidth >= 9 && i.getHeight >= 8).map { img =>
      // below 9×8 the integer block partition degenerates to empty
      // blocks whose 0.0-sentinel means make the hash content-
      // independent (all tiny images would collide into one near-dup
      // cluster) — no hash is better than a meaningless one
      val (w, h) = (img.getWidth, img.getHeight)
      val means = Array.ofDim[Double](8, 9)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 9) {
          val (x0, x1) = (c * w / 9, (c + 1) * w / 9)
          val (y0, y1) = (r * h / 8, (r + 1) * h / 8)
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val n = (x1 - x0).toLong * (y1 - y0) * 3
          means(r)(c) = if (n == 0) 0.0 else sum.toDouble / n
          c += 1
        }
        r += 1
      }
      var hash = 0L
      r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (means(r)(c) < means(r)(c + 1)) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      hash
    }

  /** F-B3: decode at the consumer edge. */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null) None
    else Option(ImageIO.read(new ByteArrayInputStream(bytes)))

  def encodeJpeg(img: BufferedImage): Option[Array[Byte]] = {
    // JPEG writer requires no alpha channel
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose(); c
      }
    val out = new ByteArrayOutputStream()
    if (!ImageIO.write(rgb, "jpeg", out)) None else Some(out.toByteArray)
  }

  private def rotate(img: BufferedImage, degrees: Int): BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (nw, nh) = if (degrees == 180) (w, h) else (h, w)
    val dst = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    val t = new AffineTransform()
    degrees match {
      case 90 => t.translate(nw, 0); t.rotate(math.Pi / 2)
      case 180 => t.translate(w, h); t.rotate(math.Pi)
      case 270 => t.translate(0, nh); t.rotate(-math.Pi / 2)
      case _ =>
    }
    g.drawImage(img, t, null)
    g.dispose()
    dst
  }

}
