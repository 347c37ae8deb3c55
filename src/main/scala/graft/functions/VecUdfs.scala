package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled vector kernels for the embedding ops. Catalyst's higher-order
  * functions interpret the lambda per element; a JVM while-loop UDF is
  * ~10× faster on 64-dim vectors and keeps the exact left-to-right
  * double accumulation order that the DuckDB oracle
  * (list_dot_product on DOUBLE[]) uses, so hash parity is preserved.
  */
object VecUdfs {

  private def dotD(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Spark hands float arrays to UDFs as ArraySeq.ofFloat; unwrap to the
    * primitive array to avoid per-element boxing on the hot path.
    */
  private def prim(a: Seq[Float]): Array[Float] = a match {
    case s: scala.collection.immutable.ArraySeq.ofFloat => s.unsafeArray
    case other => other.toArray
  }

  /** Dot product of two float vectors, accumulated in double. */
  val dotFF: UserDefinedFunction = udf((as: Seq[Float], bs: Seq[Float]) => {
    val a = prim(as); val b = prim(bs)
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  })

  /** L2 norm of a float vector, accumulated in double. */
  val normF: UserDefinedFunction = udf((as: Seq[Float]) => {
    val a = prim(as)
    var s = 0.0
    var i = 0
    while (i < a.length) { val x = a(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  })

  // The former orderedPairs UDF (bucket → candidate pairs) was promoted
  // to the native graft_pairs generator — plans.OrderedPairsGen, which
  // streams pairs instead of materializing the C(n,2) array.
}
