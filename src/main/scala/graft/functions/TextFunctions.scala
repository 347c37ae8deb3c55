package graft.functions

import graft.plans.{MinhashSigF, ShinglesF, SimhashF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Column API over the native text-sketch expressions
  * ([[graft.plans.TextKernels]]) — the dedup scan path's shingling,
  * MinHash and SimHash kernels as codegen-participating expressions
  * instead of Scala UDFs (same promotion as GeomFunctions; null
  * semantics identical to the former UDFs, pinned by the d_* gates).
  */
object TextFunctions {

  /** Distinct word 3-gram shingles; null text → empty list. */
  def shingles(text: Column): Column = column(ShinglesF(expression(text)))

  /** k-component md5 MinHash signature; null/empty shingles → null. */
  def minhashSig(shingles: Column, k: Int): Column =
    column(MinhashSigF(expression(shingles), k))

  /** 64-bit SimHash of a token list; null list → 0. */
  def simhash(tokens: Column): Column = column(SimhashF(expression(tokens)))
}
