package graft

import graft.lake.{Diff, Snapshot}
import org.apache.spark.sql.functions._

/** Snapshot diff: op classification, NULL-transition semantics,
  * empty-diff identity, and schema-evolution diffing.
  */
class DiffSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("diff-spec").toString + "/t"

  test("I/D/U classification; unchanged rows are absent; identity diff is empty") {
    val root = tmp()
    import spark.implicits._
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val v2 = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    Snapshot.publish(v1, root, 1)
    Snapshot.publish(v2, root, 2)
    val got = Diff.diff(spark, root, 1, 2, "k")
      .select("k", "op").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "U", 3L -> "D", 4L -> "I"),
      s"wrong classification: $got")
    assert(Diff.diff(spark, root, 1, 1, "k").count() == 0,
      "a state diffed against itself must be empty")
  }

  test("NULL-to-value and value-to-NULL transitions are changes; NULL==NULL is not") {
    import spark.implicits._
    val o = Seq[(Long, java.lang.Long)]((1L, null), (2L, 5L), (3L, null))
      .toDF("k", "v")
    val n = Seq[(Long, java.lang.Long)]((1L, 7L), (2L, null), (3L, null))
      .toDF("k", "v")
    val got = Diff.diffFrames(o, n, "k")
      .select("k", "op").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "U", 2L -> "U"), s"null-safe compare broke: $got")
  }

  test("NULL-key rows join null-safely: unchanged is absent, deleted is D") {
    import spark.implicits._
    val o = Seq[(java.lang.Long, Long)]((null, 5L), (1L, 10L))
      .toDF("k", "v")
    // identical NULL-key row on both sides → NOT in the diff
    assert(Diff.diffFrames(o, o, "k").count() == 0,
      "identical states with a NULL key must diff empty")
    // NULL-key row deleted → op D (not a spurious I)
    val n = Seq[(java.lang.Long, Long)]((1L, 10L)).toDF("k", "v")
    val got = Diff.diffFrames(o, n, "k").select("op").collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("D"), s"deleted NULL-key row misclassified: $got")
  }

  test("a column added between the snapshots diffs as NULL-vs-value") {
    import spark.implicits._
    val o = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val n = Seq((1L, 10L, "x"), (2L, 20L, null.asInstanceOf[String]))
      .toDF("k", "v", "note")
    val got = Diff.diffFrames(o, n, "k")
    assert(got.columns.toSeq ==
      Seq("k", "op", "old_v", "new_v", "old_note", "new_note"))
    val byK = got.collect().map(r => r.getLong(0) ->
      (r.getString(1), Option(r.getString(4)), Option(r.getString(5)))).toMap
    // key 1 gained a note value → U with old NULL; key 2's note is NULL
    // on both sides → no change at all
    assert(byK == Map(1L -> ("U", None, Some("x"))), s"evolution diff: $byK")
  }

  test("diff output is churn-sized: a one-row change on a large table yields one row") {
    val root = tmp()
    val v1 = spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
    Snapshot.publish(v1, root, 1)
    Snapshot.publish(
      v1.withColumn("v", when(col("k") === 77L, lit(-1L)).otherwise(col("v"))),
      root, 2)
    val rows = Diff.diff(spark, root, 1, 2, "k").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 77L)
  }
}
