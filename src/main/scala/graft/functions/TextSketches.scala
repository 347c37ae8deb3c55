package graft.functions

import java.security.MessageDigest

/** Text sketching kernels that are not SQL-expressible: 64-bit SimHash
  * over a token list and md5 MinHash signatures (md5-derived hashes,
  * so the sketches are deterministic and engine/cluster-independent).
  * Pure functions — the Spark surface is the native expressions in
  * plans/TextExpressions.scala (TextFunctions Column API), which call
  * these kernels from generated code; the former `udf()` wrappers are
  * gone with them.
  */
object TextSketches {

  // one MD5 instance per thread, reset by digest() on every call —
  // getInstance does a provider lookup + allocation, and this module
  // sits on the hot dedup scan path (k x |shingles| hashes per doc)
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 8 md5 bytes of the UTF-8 token as a big-endian long. */
  def tokenHash64(tok: String): Long = {
    val d = md5.get().digest(tok.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Classic SimHash: per-bit vote of all token hashes, sign → bit. */
  def simhash(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    for (t <- tokens) {
      val h = tokenHash64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  // per-pair hamming distance needs no kernel at all: bit_count(a ^ b)
  // is a codegen'd built-in (used directly by d_simhash)

  private val HEX = "0123456789abcdef".toCharArray

  private def md5HexPrefix8(s: String): String = {
    val d = md5.get().digest(s.getBytes("UTF-8"))
    val out = new Array[Char](8)
    var i = 0
    while (i < 4) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** All k MinHash signature components in one pass over the shingle
    * set: sig_j = min over shingles of substr(md5("j|" + shingle), 1, 8).
    * Identical strings to the SQL form (lowercase hex, same salt), but
    * computed as a pure map — no explode, no shuffle, one digest per
    * (salt, shingle).
    */
  def minhashSignature(shingles: Seq[String], k: Int): Seq[String] = {
    val mins = Array.fill[String](k)(null)
    for (s <- shingles; j <- 0 until k) {
      val h = md5HexPrefix8(s"$j|$s")
      if (mins(j) == null || h < mins(j)) mins(j) = h
    }
    mins.toSeq
  }
}
