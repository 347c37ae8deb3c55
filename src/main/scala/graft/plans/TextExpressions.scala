package graft.plans

import graft.functions.TextSketches
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup text kernels — the text
  * analogue of GeomExpressions, promoting the hot per-document UDFs
  * (shingling, MinHash signatures, SimHash) on the 100 TB dedup scan
  * path. Same pattern: one deterministic Scala kernel shared by
  * interpreted eval and generated code (called through TextKernels'
  * static forwarders), ArrayData in/out, no Row↔Scala encoder bridge,
  * no codegen island break. Null semantics replicate the former UDFs
  * exactly (hash-pinned by the d_* oracle gates): null text → EMPTY
  * shingle list, null token list → signature 0, null/empty shingle
  * set → null MinHash signature.
  */
object TextKernels {

  private val EmptyStrings = new GenericArrayData(new Array[Any](0))

  def emptyStringArray(): ArrayData = EmptyStrings

  /** Distinct word 3-gram shingles (DedupQueries' former shingleUdf):
    * tokenizes ONCE per document — the reason this is not the
    * declarative transform/element_at form, which Catalyst re-inlines
    * into every lambda reference (documented at the call site).
    */
  def shingles(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return EmptyStrings
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** k-component MinHash signature over a shingle set; null when the
    * set is empty (the former UDF's guard).
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    // null ELEMENTS are skipped deterministically: unguarded,
    // getUTF8String on a null slot NPEs on GenericArrayData but reads
    // an empty string on UnsafeArrayData — the same row would crash or
    // hash differently depending on which representation arrives
    val ss = new scala.collection.mutable.ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) ss += shingles.getUTF8String(i).toString
      i += 1
    }
    if (ss.isEmpty) return null
    val mins = TextSketches.minhashSignature(ss.toSeq, k)
    new GenericArrayData(mins.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  /** One-pass repetition statistics (t_repetition's kernel): tokenize
    * once, count distinct tokens and bigram multiplicities in hash
    * maps — O(d) per document where the declarative
    * array_max(transform(array_distinct(bg), count-filter)) chain is
    * O(d²). Field values replicate the HOF chain bit-for-bit (the
    * hash-checked oracle is unchanged): tokens are the full regex-split
    * including empties, bigrams are space-joined adjacent pairs.
    * Null on fewer than 2 tokens (the query filters those rows out
    * with a cheap scan-side predicate before this runs).
    */
  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2) return null
    val distinctToks = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinctToks.add(toks(i)); i += 1 }
    val bigramCounts = new java.util.HashMap[String, Int]()
    var top = 0
    i = 0
    while (i + 1 < n) {
      val bg = toks(i) + " " + toks(i + 1)
      val c = bigramCounts.merge(bg, 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, n - distinctToks.size, n - 1,
        n - 1 - bigramCounts.size, top))
  }

  /** 64-bit SimHash of a token list (0 for empty — same as the former
    * UDF's null → 0L once ShinglesF/split semantics are accounted).
    */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      // null tokens carry no content — skipped (same representation-
      // divergence hazard as minhashSig)
      if (!tokens.isNullAt(i)) {
        val h = TextSketches.tokenHash64(tokens.getUTF8String(i).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** text → distinct 3-gram shingles; NEVER null (null text → empty
  * list, the former UDF's contract), so downstream size() filters and
  * the SQL oracle's list semantics are unchanged.
  */
case class ShinglesF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextKernels.emptyStringArray()
    else TextKernels.shingles(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $javaType ${ev.value} = ${c.isNull} ?
        graft.plans.TextKernels.emptyStringArray() :
        graft.plans.TextKernels.shingles(${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle set → k-component MinHash signature (array<string>); null
  * on null input or an empty set. `k` is a plan-time constant, not a
  * child expression, so it is Column-API-constructed (GeomFunctions
  * pattern) rather than FunctionRegistry-registered.
  */
case class MinhashSigF(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig needs k > 0, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.minhashSig(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.plans.TextKernels.minhashSig($a, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token list → 64-bit SimHash; NEVER null (null list → 0L, the former
  * UDF's contract).
  */
case class SimhashF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else TextKernels.simhash(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = ${c.isNull} ? 0L :
        graft.plans.TextKernels.simhash(${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → one-pass repetition statistics struct (t_repetition's
  * kernel); null on null text or fewer than 2 tokens. Registered as
  * graft_repetition. The struct return (non-cheap expression) is the
  * collapse guard: Catalyst will not duplicate it into per-field
  * copies when several fields are extracted in the next projection
  * (SCALE.md §audit 6).
  */
case class RepetitionStatsF(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_dup_tokens", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_dup_bigrams", IntegerType, nullable = false),
    StructField("top_bigram_n", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repetition"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.repetitionStats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.plans.TextKernels.repetitionStats($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
