package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Native graft_dot / graft_norm expressions: value parity with the UDF
  * kernels (and hence the DuckDB oracle), codegen participation (no
  * ScalaUDF node in the plan), null handling, and type checking.
  */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    GraftFunctions.register(spark)
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(-0.5f, 0.25f, 4.0f)),
      (3L, null.asInstanceOf[Seq[Float]])
    ).toDF("id", "v")
  }

  test("graft_dot and graft_norm match the UDF kernels bitwise") {
    val df = vecs.filter(col("v").isNotNull)
      .select(
        expr("graft_dot(v, v)").as("dot_native"),
        graft.functions.VecUdfs.dotFF(col("v"), col("v")).as("dot_udf"),
        expr("graft_norm(v)").as("norm_native"),
        graft.functions.VecUdfs.normF(col("v")).as("norm_udf"))
    for (r <- df.collect()) {
      assert(r.getDouble(0) == r.getDouble(1)) // bitwise, not approx
      assert(r.getDouble(2) == r.getDouble(3))
    }
    val r = vecs.filter(col("id") === 1).select(expr("graft_dot(v, v)")).head()
    assert(r.getDouble(0) == 14.0)
  }

  test("null input → null output") {
    val r = vecs.filter(col("id") === 3)
      .select(expr("graft_dot(v, v)"), expr("graft_norm(v)")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("a NULL array ELEMENT yields NULL, never silent 0.0 math") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // getFloat on a null slot reads 0.0 — unguarded, the dot/norm of a
    // vector with a null element would be silently wrong instead of
    // NULL (the GeomKernels.hasNullElem policy, applied here)
    val df = Seq((1L, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 1.0f)))
      .toDF("id", "a", "b")
    val r = df.select(
      expr("graft_dot(a, b)").as("d1"),
      expr("graft_dot(b, a)").as("d2"),
      expr("graft_norm(a)").as("n1"),
      expr("graft_norm(b)").as("n2")).head
    assert(r.isNullAt(0) && r.isNullAt(1), "null element must null the dot")
    assert(r.isNullAt(2), "null element must null the norm")
    assert(r.getDouble(3) == math.sqrt(2.0), "clean vector unaffected")
    // nearest-cell: null element → null cell (row drops from the join)
    val cells = df.select(expr(
      "graft_nearest_cell(a, array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), array(7))")
      .as("c")).head
    assert(cells.isNullAt(0), "null element must null the cell")
  }

  test("expressions stay inside codegen (no ScalaUDF in plan)") {
    // parquet-backed frame: local relations are fully evaluated at
    // optimization time, which would hide the plan shape
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val plan = e.select(expr("graft_dot(embedding, embedding)").as("d"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF(") && plan.contains("graft_dot"), plan)
    // and the UDF version, by contrast, shows an opaque UDF call
    val udfPlan = e.select(
      graft.functions.VecUdfs.dotFF(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(udfPlan.contains("UDF("), udfPlan)
  }

  test("graft_pairs generator streams ordered pairs without a ScalaUDF") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(3L, 7L, 9L)), (Seq(5L)), (Seq.empty[Long]))
      .toDF("docs")
      .select(expr("graft_pairs(docs)"))
    assert(df.columns.toSeq == Seq("da", "db"))
    val out = df.as[(Long, Long)].collect().toSet
    assert(out == Set((3L, 7L), (3L, 9L), (7L, 9L)), s"got $out")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.contains("graft_pairs"),
      s"expected native generator in plan:\n$plan")
  }

  test("every native expression compiles under codegen fallback=false") {
    // The nearest-cell regression proved a plan can CONTAIN a native
    // expression, return green results, and still run interpreted
    // because its generated Java failed Janino. Execute each native
    // expression over a parquet-backed frame (local relations are
    // folded before codegen) with fallback disabled, so any compile
    // failure throws instead of degrading silently.
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      // graft_dot + graft_norm in one projection
      assert(e.select(expr("graft_dot(embedding, embedding)").as("d"),
          expr("graft_norm(embedding)").as("n"))
        .agg(sum("d"), sum("n")).head() != null)
      // graft_pairs through GenerateExec
      assert(e.limit(64).select(col("vec_id") % 4 as "b", col("vec_id"))
        .groupBy("b").agg(sort_array(collect_list("vec_id")).as("ids"))
        .selectExpr("graft_pairs(ids)").count() > 0)
      // SeqIdAdjustF via the two-pass id operator
      val ids = graft.operators.SeqIds.withSeqId(
        e.select("vec_id"), Seq(col("vec_id")), "sid")
      assert(ids.agg(max("sid")).head().getLong(0) >= 0)
      graft.operators.SeqIds.releaseAll()
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("type mismatch is rejected at analysis") {
    GraftFunctions.register(spark)
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v") // array<double>
    val e = intercept[Exception](bad.select(expr("graft_dot(v, v)")).collect())
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("DATATYPE"),
      e.getMessage.take(300))
  }
}
