package graft

import graft.operators.SeqIds
import org.apache.spark.sql.functions._

/** SeqIds.withSeqId must produce exactly row_number()-1 semantics (dense
  * global ordinals under the sort order) without ever funneling the data
  * through a single partition.
  */
class SeqIdsSpec extends SparkSpec {

  import spark.implicits._

  test("ids are dense global ordinals matching the sort order") {
    val df = (0 until 5000).map(i => ((i * 2654435761L) % 10007, s"k$i"))
      .toDF("key", "tag")
      .repartition(7) // scrambled physical layout
    val out = SeqIds.withSeqId(df, Seq(col("key"), col("tag")), "id")
    val rows = out.select("key", "tag", "id").collect()
    // ids 0..n-1, dense, in exactly (key, tag) order
    val byId = rows.sortBy(_.getLong(2))
    assert(byId.map(_.getLong(2)).toSeq == (0L until 5000L),
      "ids must be the dense sequence 0..n-1")
    assert(byId.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      rows.map(r => (r.getLong(0), r.getString(1))).toSeq.sorted,
      "id order must equal the sort-col order")
  }

  test("duplicate-heavy keys still get dense correct ids (hot bucket)") {
    val df = ((0 until 3000).map(_ => (7L, "dup")) ++
      (0 until 100).map(i => (i.toLong % 5, s"u$i")))
      .toDF("key", "tag").repartition(5)
    val out = SeqIds.withSeqId(df, Seq(col("key"), col("tag")), "id")
      .select("key", "tag", "id").collect()
    val byId = out.sortBy(_.getLong(2))
    assert(byId.map(_.getLong(2)).toSeq == (0L until out.length.toLong))
    assert(byId.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      out.map(r => (r.getLong(0), r.getString(1))).toSeq.sorted)
  }

  test("startAt offsets every id") {
    val df = Seq(3L, 1L, 2L).toDF("k")
    val out = SeqIds.withSeqId(df, Seq(col("k")), "id", startAt = 100L)
    assert(out.select("k", "id").as[(Long, Long)].collect().toSeq.sorted ==
      Seq((1L, 100L), (2L, 101L), (3L, 102L)))
  }

  test("empty input yields empty output with the id column") {
    val df = Seq.empty[Long].toDF("k")
    val out = SeqIds.withSeqId(df, Seq(col("k")), "id")
    assert(out.columns.contains("id") && out.count() == 0)
  }

  test("dim variant matches the general path on a bounded input") {
    val df = Seq("c", "a", "b", "a2", "z").toDF("k")
    val g = SeqIds.withSeqId(df, Seq(col("k")), "id", startAt = 1L)
      .select("k", "id").as[(String, Long)].collect().toSeq
    val s = SeqIds.withSeqIdDim(df, Seq(col("k")), "id", startAt = 1L)
      .select("k", "id").as[(String, Long)].collect().toSeq
    assert(g == s && g == g.sortBy(_._1).zipWithIndex.map { case ((k, _), i) => (k, i + 1L) })
  }

  test("plan has no window at all and no RDD scan") {
    val df = (0 until 1000).map(_.toLong).toDF("k")
    val out = SeqIds.withSeqId(df, Seq(col("k")), "id")
    out.count() // materialize
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"),
      s"no window (single-partition or otherwise) in the id path:\n$physical")
    assert(!physical.contains("ExistingRDD"),
      s"id assignment must stay in Tungsten (no RDD round-trip):\n$physical")
  }

  test("releaseAll unpins every withSeqId cache (gate-query lifecycle)") {
    SeqIds.releaseAll() // start from a clean registry
    val wasEmpty = spark.sharedState.cacheManager.isEmpty
    // A gate query that goes through withSeqId, consumed to completion —
    // the same shape Bench/Verify run before calling releaseAll.
    val out = SparkEntry.queries("a5_dense_ids")(spark, sf())
    out.collect()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "withSeqId must have pinned a cache for the two-pass id assignment")
    SeqIds.releaseAll()
    assert(spark.sharedState.cacheManager.isEmpty == wasEmpty,
      "releaseAll must leave zero SeqIds-pinned InMemoryRelations behind")
  }

  test("post-release re-execution throws at submission, never mis-numbers") {
    SeqIds.releaseAll()
    val df = (0 until 2000).map(i => (i * 31L) % 997).toDF("k").repartition(4)
    val out = SeqIds.withSeqId(df, Seq(col("k")), "id")
    // legitimate consumption while pinned — evaluates the id column
    assert(out.agg(sum("id")).head.getLong(0) == (0L until 2000L).sum)
    SeqIds.releaseAll()
    // The frame's cache is gone and its release token is invalidated:
    // any further execution that evaluates the id must fail at job
    // submission (the token's writeObject fires when Spark serializes
    // the task binary) rather than recompute under resampled range
    // bounds and silently emit wrong ids. (An action that PRUNES the id
    // column — a bare count() — never ships the expression and is
    // legitimately allowed to succeed.)
    val e = intercept[Throwable] { out.agg(sum("id")).head }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage != null && c.getMessage.contains("released")),
      s"expected the SeqIdReleaseToken submission failure, got: $e")
  }

  test("output arrives globally sorted by the sort cols") {
    val df = (0 until 4000).map(i => ((i * 48271L) % 9973, i)).toDF("key", "v")
      .repartition(6)
    val rows = SeqIds.withSeqId(df, Seq(col("key"), col("v")), "id")
      .select("key", "v", "id").collect()
    assert(rows.map(_.getLong(2)).toSeq == (0L until 4000L),
      "output order must equal id order (sorted by sort cols)")
  }
}
