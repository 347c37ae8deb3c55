package graft

import graft.lake.Merge
import org.apache.spark.sql.Row

/** lake.Merge.upsert — MERGE INTO routing semantics on crafted frames. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert routes update / insert / carry-over and honors explicit NULLs") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v")
    val updates = Seq((2L, Option("B"), 200), (4L, None, 400))
      .toDF("k", "name", "v")
    val out = Merge.upsert(base, updates, "k")
      .orderBy("k").collect().map(r =>
        (r.getLong(0), Option(r.getString(1)), r.getInt(2)))
    assert(out.toSeq == Seq(
      (1L, Some("a"), 10),    // carry-over
      (2L, Some("B"), 200),   // matched: update wins
      (3L, Some("c"), 30),    // carry-over
      (4L, None, 400)))       // insert; update's explicit NULL name kept
  }

  test("schema evolution: each side's exclusive columns survive by name") {
    val base = Seq((1L, "a", "legacy"), (2L, "b", "legacy"))
      .toDF("k", "name", "old_col")
    val updates = Seq((2L, "B", 7), (3L, "C", 9))
      .toDF("k", "name", "new_col")
    val out = Merge.upsert(base, updates, "k").orderBy("k").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head ==
      Seq("k", "name", "old_col", "new_col"))
    // matched key: update wins on shared cols, base-only col SURVIVES
    assert(out(1) == Row(2L, "B", "legacy", 7))
    // insert: base-only col null
    assert(out(2) == Row(3L, "C", null, 9))
    // carry-over: update-only col null
    assert(out(0) == Row(1L, "a", "legacy", null))
  }

  test("a NULL-key update row survives intact, not half-nulled") {
    import spark.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val upd = Seq[(java.lang.Long, Long)]((null, 99L)).toDF("k", "v")
    // the null key never equi-joins; routing shared columns on the
    // update KEY's null-ness used to null out v=99 while update-only
    // columns survived — the presence marker keeps the row whole
    val got = graft.lake.Merge.upsert(base, upd, "k").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (-1L, 99L)), s"null-key row mangled: $got")
  }

  test("upsert of an empty batch is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val out = Merge.upsert(base, base.limit(0), "k")
    assert(out.orderBy("k").collect().toSeq ==
      base.orderBy("k").collect().toSeq)
  }

  test("b_/u_ prefix collisions are rejected up front") {
    // base carrying both 'x' and 'b_x' would alias to two 'b_x' columns
    val base = Seq((1L, "v", "w")).toDF("k", "x", "b_x")
    val upd = Seq((1L, "v2")).toDF("k", "x")
    val e = intercept[IllegalArgumentException](Merge.upsert(base, upd, "k"))
    assert(e.getMessage.contains("b_ prefix"))
    val base2 = Seq((1L, "v")).toDF("k", "x")
    val upd2 = Seq((1L, "v", "w")).toDF("k", "x", "u_x")
    intercept[IllegalArgumentException](Merge.upsert(base2, upd2, "k"))
  }
}
