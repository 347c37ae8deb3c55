package graft.functions

/** Audio-container metadata — the audio leg of the multimodal column
  * surface (brief: image/audio/video as opaque binary + typed metadata).
  * Same policy as ImageOps' hand-rolled JPEG/EXIF readers: the container
  * HEADER parse is real product code; codec work (sample decode) is out
  * of scope in this environment.
  *
  * WAV/RIFF layout: "RIFF" <u32 size> "WAVE", then a chunk walk of
  * <4cc id> <u32 size> <payload>; the "fmt " chunk carries channels /
  * sample-rate / bits-per-sample, the "data" chunk's SIZE field gives
  * the payload length (duration = bytes / byte-rate). All integers are
  * little-endian. The walk is word-aligned (odd chunk sizes pad 1 byte)
  * and tolerates a truncated data payload, so it works on header-only
  * byte ranges — at 100 TB you read the first KB of each object, never
  * the audio itself.
  */
object AudioOps {

  final case class WavMeta(channels: Int, sampleRate: Int,
                           bitsPerSample: Int, dataBytes: Long)

  /** Parse RIFF/WAVE header metadata; None on anything malformed. */
  def wavMeta(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 12) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Long] = None
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val p = pos.toInt
      val id = tag(p)
      val size = u32(p + 4)
      // size >= 16: a malformed fmt chunk declaring fewer bytes would
      // otherwise read channels/rate/bits from the NEXT chunk's bytes.
      if (id == "fmt " && size >= 16 && p + 8 + 16 <= bytes.length)
        fmt = Some((u16(p + 10), u32(p + 12).toInt, u16(p + 22)))
      if (id == "data") data = Some(size)
      pos += 8 + size + (size & 1) // word-aligned; may run past a
                                   // truncated payload, loop then exits
    }
    for {
      (ch, rate, bits) <- fmt
      d <- data
      if ch > 0 && rate > 0 && bits > 0 && bits % 8 == 0
    } yield WavMeta(ch, rate, bits, d)
  }

  /** Seconds of audio described by the header (PCM byte-rate math in
    * LONG: individually-valid hostile header fields — rate 1e9 × 3
    * channels — overflow the Int product to a negative or zero
    * byte-rate, turning the documented None-on-malformed contract into
    * a silent negative/Infinity duration). */
  def durationSec(m: WavMeta): Double =
    m.dataBytes.toDouble /
      (m.sampleRate.toLong * m.channels * (m.bitsPerSample / 8)).toDouble
}
