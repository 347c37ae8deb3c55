package graft

import graft.functions.AudioOps
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream

/** functions.AudioOps — RIFF/WAVE header parsing on crafted byte
  * layouts: canonical headers, extra chunks, odd-size padding,
  * truncation, and malformed input.
  */
class AudioOpsSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  /** Build a WAV header; `extraChunks` are (id, payload) inserted
    * between fmt and data to exercise the chunk walk.
    */
  private def wav(ch: Int, rate: Int, bits: Int, dataBytes: Long,
                  extraChunks: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag("RIFF"); out.write(le(36 + dataBytes, 4)); tag("WAVE")
    tag("fmt "); out.write(le(16, 4))
    out.write(le(1, 2)); out.write(le(ch, 2)); out.write(le(rate, 4))
    out.write(le(rate.toLong * ch * bits / 8, 4))
    out.write(le(ch * bits / 8, 2)); out.write(le(bits, 2))
    extraChunks.foreach { case (id, payload) =>
      tag(id); out.write(le(payload.length, 4)); out.write(payload)
      if (payload.length % 2 == 1) out.write(0) // word-align pad
    }
    tag("data"); out.write(le(dataBytes, 4))
    out.toByteArray
  }

  test("canonical header parses; duration math checks out") {
    val m = AudioOps.wavMeta(wav(2, 44100, 16, 176400L)).get
    assert(m == AudioOps.WavMeta(2, 44100, 16, 176400L))
    assert(AudioOps.durationSec(m) == 1.0) // 176400 / (44100*2*2)
  }

  test("chunk walk skips LIST and odd-size chunks (word-aligned)") {
    val extras = Seq(
      "LIST" -> Array.fill[Byte](26)(7),
      "junk" -> Array.fill[Byte](13)(9)) // odd size → 1 pad byte
    val m = AudioOps.wavMeta(wav(1, 16000, 8, 8000L, extras)).get
    assert(m == AudioOps.WavMeta(1, 16000, 8, 8000L))
    assert(AudioOps.durationSec(m) == 0.5)
  }

  test("malformed inputs return None, never throw") {
    val good = wav(1, 8000, 16, 100L)
    assert(AudioOps.wavMeta(null).isEmpty)
    assert(AudioOps.wavMeta(Array.emptyByteArray).isEmpty)
    assert(AudioOps.wavMeta(good.take(11)).isEmpty)      // shorter than RIFF hdr
    assert(AudioOps.wavMeta(good.take(30)).isEmpty)      // fmt truncated
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(AudioOps.wavMeta(badMagic).isEmpty)
    val notWave = good.clone(); notWave(8) = 'A'.toByte
    assert(AudioOps.wavMeta(notWave).isEmpty)
    assert(AudioOps.wavMeta(wav(0, 8000, 16, 100L)).isEmpty) // zero channels
    assert(AudioOps.wavMeta(wav(1, 8000, 12, 100L)).isEmpty) // non-byte bits
    // fmt present but no data chunk: drop the last 8 bytes
    assert(AudioOps.wavMeta(good.dropRight(8)).isEmpty)
  }

  test("fmt chunk declaring size < 16 is rejected, not read past") {
    // fmt declares 4 payload bytes: accepting it would read channels /
    // rate / bits from the NEXT chunk's bytes (here the data header)
    val out = new ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    tag("RIFF"); out.write(le(20, 4)); tag("WAVE")
    tag("fmt "); out.write(le(4, 4)); out.write(le(1, 2)); out.write(le(2, 2))
    tag("data"); out.write(le(100, 4))
    out.write(Array.fill[Byte](100)(0))
    assert(AudioOps.wavMeta(out.toByteArray).isEmpty)
  }

  test("header-only read: data size field beyond the byte range still parses") {
    // 10 MB of audio declared, only the 44-byte header materialized
    val m = AudioOps.wavMeta(wav(2, 8000, 16, 10L * 1024 * 1024)).get
    assert(m.dataBytes == 10L * 1024 * 1024)
  }
}
