package graft

import graft.functions.{TextFunctions, TextSketches}
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Native text-sketch expressions (the promoted dedup UDFs): parity
  * with the pure kernels, the former UDFs' null semantics, codegen
  * participation, and compilation under fallback=false.
  */
class TextExprSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e"),
    (2L, "a b c d e"),                 // duplicate of 1
    (3L, "x y"),                       // <3 tokens → empty shingles
    (4L, null.asInstanceOf[String]),   // null text → empty shingles
    (5L, "w w w w")                    // repeated token → 1 distinct shingle
  ).toDF("doc_id", "text")

  test("shingles: distinct 3-grams, empty for short/null text") {
    val rows = docs.select(col("doc_id"),
        TextFunctions.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("a b c", "b c d", "c d e"))
    assert(rows(2L) == rows(1L))
    assert(rows(3L).isEmpty && rows(4L).isEmpty)
    assert(rows(5L) == Seq("w w w"))
  }

  test("minhashSig matches the kernel; null on empty shingles") {
    val rows = docs.select(col("doc_id"),
        TextFunctions.minhashSig(TextFunctions.shingles(col("text")), 8).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(rows(1L) ==
      TextSketches.minhashSignature(Seq("a b c", "b c d", "c d e"), 8))
    assert(rows(1L) == rows(2L))
    assert(rows(3L) == null && rows(4L) == null)
  }

  test("simhash matches the kernel; null token list → 0") {
    val rows = docs.select(col("doc_id"),
        TextFunctions.simhash(split(col("text"), " ")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == TextSketches.simhash(Seq("a", "b", "c", "d", "e")))
    assert(rows(1L) == rows(2L))
    assert(rows(4L) == 0L, "null token list must keep the UDF's 0 signature")
  }

  test("a NULL token element is skipped deterministically, not NPE or empty-hashed") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq[String]("a", "b")),
      (3L, Seq[String](null, null))
    ).toDF("id", "toks")
    val got = df.select(col("id"), expr("graft_simhash(toks)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unguarded, getUTF8String on a null slot NPEs on GenericArrayData
    // but hashes an empty string on UnsafeArrayData — here the null
    // tokens simply carry no votes
    assert(got(1L) == got(2L), "null token must not change the signature")
    assert(got(3L) == 0L, "all-null token list hashes like empty")
    val sig = df.filter(col("id") === 1L)
      .select(graft.functions.TextFunctions.minhashSig(col("toks"), 4)).head
    assert(!sig.isNullAt(0), "minhash over the non-null tokens")
  }

  test("expressions stay inside codegen and compile under fallback=false") {
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // parquet-backed: local relations fold away before codegen
      val d = spark.read.parquet(s"${sf()}/documents.parquet")
      val out = d.select(
        TextFunctions.shingles(col("text")).as("sh"),
        TextFunctions.simhash(split(col("text"), " ")).as("sim"))
        .select(TextFunctions.minhashSig(col("sh"), 8).as("sig"), col("sim"))
      assert(out.filter(col("sig").isNotNull).count() > 0)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("UDF(") && !plan.contains("ScalaUDF"), plan.take(1500))
      for (n <- Seq("graft_shingles", "graft_minhash_sig", "graft_simhash"))
        assert(plan.contains(n), s"$n missing from plan")
      // SQL-registered forms resolve
      assert(spark.sql(
        "SELECT graft_simhash(array('a','b')) AS s, size(graft_shingles('a b c d')) AS n")
        .head().getInt(1) == 2)
      // repetition kernel: codegen-compiled under fallback=false, and
      // the struct math on a known case ("a a a a": 3 bigrams all "a a")
      val rep = d.select(expr("graft_repetition(text)").as("r"))
        .filter(col("r").isNotNull)
      assert(rep.count() > 0)
      assert(rep.queryExecution.executedPlan.toString.contains("graft_repetition"))
      val r = spark.sql("SELECT graft_repetition('a a a a') AS r").select("r.*").head()
      assert(r.getInt(0) == 4 && r.getInt(1) == 3 && r.getInt(2) == 3 &&
        r.getInt(3) == 2 && r.getInt(4) == 3)
      // null contract: under 2 tokens → NULL, not a degenerate row
      assert(spark.sql("SELECT graft_repetition('solo') IS NULL AS z").head().getBoolean(0))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
