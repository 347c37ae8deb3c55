package graft

import graft.lake.{DeleteWhere, FileStats, ZOrder}
import org.apache.spark.sql.functions._

/** The delete must be priced by touched files (most files referenced
  * verbatim, never rewritten), must equal the full-scan delete exactly,
  * and must never let three-valued logic drop NULL-keyed rows.
  */
class DeleteWhereSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("delete-spec").toString

  test("range delete rewrites only intersecting files and matches the full-scan delete") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.01"), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 16, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))

    val res = DeleteWhere.deleteRange(spark, s"$base/data", s"$base/stats",
      "user_id", lit(80L), lit(110L), s"$base/v2")
    assert(res.filesTotal >= 8, s"expected a fragmented tree, got ${res.filesTotal}")
    // same bound as FileStatsSpec: a within-quarter range on the 16-file
    // z layout touches at most half the files
    assert(res.filesRewritten > 0 && res.filesRewritten <= res.filesTotal / 2,
      s"delete must touch a minority: ${res.filesRewritten} of ${res.filesTotal}")
    assert(res.rowsDeleted > 0)

    // kept files are referenced verbatim: every untouched original path
    // appears in the new manifest unchanged
    val touched = FileStats.prunedFiles(spark, s"$base/stats",
      "user_id", lit(80L), lit(110L)).toSet
    val originals = spark.read.parquet(s"$base/stats")
      .select("path").collect().map(_.getString(0)).toSet
    val manifest = spark.read.parquet(s"$base/v2/manifest")
      .select("path").collect().map(_.getString(0)).toSet
    assert((originals -- touched).subsetOf(manifest),
      "every kept original path must be referenced by the new version")
    assert(manifest.intersect(touched).isEmpty,
      "no touched (pre-delete) file may leak into the new version")

    // content equality with the full-scan delete
    val got = DeleteWhere.read(spark, s"$base/v2")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$base/data")
      .filter(!col("user_id").between(80L, 110L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "delete must equal the full-scan delete")
    assert(res.rowsDeleted == ev.count() - want.length)
  }

  test("a range touching nothing rewrites zero files and keeps the table byte-identical") {
    val base = tmp()
    val ev = graft.Tables.t(spark, sf(), "events")
      .withColumn("bucket", expr("ts div 3600000000000"))
    ZOrder.writeZOrdered(ev, s"$base/data", 4, "user_id", "bucket")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("user_id"))
    val res = DeleteWhere.deleteRange(spark, s"$base/data", s"$base/stats",
      "user_id", lit(1000000L), lit(2000000L), s"$base/v2")
    assert(res.filesRewritten == 0 && res.rowsDeleted == 0)
    assert(DeleteWhere.read(spark, s"$base/v2").count() ==
      spark.read.parquet(s"$base/data").count())
  }

  test("NULL keys survive a range delete (three-valued-logic guard)") {
    val base = tmp()
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (5L, "b"), (null, "null-keyed"), (9L, "c"), (null, "also-null")
    ).toDF("k", "v").repartition(2)
    df.write.parquet(s"$base/data")
    FileStats.writeStats(spark, s"$base/data", s"$base/stats", Seq("k"))
    val res = DeleteWhere.deleteRange(spark, s"$base/data", s"$base/stats",
      "k", lit(4L), lit(6L), s"$base/v2")
    val left = DeleteWhere.read(spark, s"$base/v2")
      .select("v").collect().map(_.getString(0)).sorted
    assert(left.sameElements(Array("a", "also-null", "c", "null-keyed")),
      s"only k=5 may be deleted, got ${left.mkString(",")}")
    assert(res.rowsDeleted == 1)
  }
}
