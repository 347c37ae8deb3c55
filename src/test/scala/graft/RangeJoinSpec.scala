package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Generalized interval-point join: exact-once pairing for
  * multi-bucket intervals, inclusive bounds, brute-force equivalence
  * on seeded random data, and the maxReplicas skew guard.
  */
class RangeJoinSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def run(iv: Seq[(Long, Long, Long)], pts: Seq[Long],
                  w: Long): DataFrame = {
    import spark.implicits._
    RangeJoin.intervalPointJoin(
      iv.toDF("iv_id", "s0", "e0"), pts.toDF("p0"), "s0", "e0", "p0", w)
  }

  test("an interval spanning many buckets matches each point exactly once") {
    // interval [0, 100] over W=10 → 11 replicas; every point must pair once
    val got = run(Seq((1L, 0L, 100L)), Seq(0L, 5L, 10L, 50L, 99L, 100L, 101L), 10L)
      .select("iv_id", "p0").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == Seq((1L, 0L), (1L, 5L), (1L, 10L), (1L, 50L), (1L, 99L), (1L, 100L)),
      s"got $got")
  }

  test("bounds are inclusive on both ends") {
    val got = run(Seq((1L, 10L, 20L)), Seq(9L, 10L, 20L, 21L), 7L)
      .select("p0").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 20L))
  }

  test("matches brute force on seeded random intervals of varying length") {
    val rnd = new scala.util.Random(99)
    val iv = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, 0L)).map { case (id, s, _) =>
      (id, s, s + rnd.nextInt(120)) }
    val pts = Seq.fill(300)(rnd.nextInt(1200).toLong)
    val got = run(iv, pts, 40L).select("iv_id", "p0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for ((id, s, e) <- iv; p <- pts if p >= s && p <= e)
      yield (id, p)).sorted
    assert(got == want, s"sizes got=${got.size} want=${want.size}")
  }

  test("inverted intervals match nothing and cannot explode the sequence") {
    // (1e12, 0) reversed: a naive replica count is negative (passes a
    // bare <= cap) and sequence() would explode span-many descending
    // buckets — the row must simply be dropped, like BETWEEN
    val got = run(Seq((1L, 1000000000000L, 0L), (2L, 10L, 20L)), Seq(5L, 15L), 10L)
      .select("iv_id", "p0").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((2L, 15L)), s"got $got")
  }

  test("maxReplicas guard fail-fasts on a pathological span") {
    val ex = intercept[Exception] {
      run(Seq((1L, 0L, 1000000L)), Seq(5L), 10L).collect()
    }
    assert(ex.getMessage.contains("buckets"),
      s"expected the replica-cap error, got: ${ex.getMessage}")
  }
}
