package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import java.security.MessageDigest

/** Text sketching kernels that are not SQL-expressible: 64-bit SimHash
  * over a token list (md5-derived token hashes, so the signature is
  * deterministic and engine/cluster-independent) and Hamming distance.
  */
object TextUdfs {

  /** First 8 md5 bytes of the UTF-8 token as a big-endian long. */
  def tokenHash64(tok: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
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

  val simhash64: UserDefinedFunction =
    udf((tokens: Seq[String]) => if (tokens == null) 0L else simhash(tokens))

  val hamming64: UserDefinedFunction =
    udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))
}
