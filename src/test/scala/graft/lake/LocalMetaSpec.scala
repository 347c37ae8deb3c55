package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** r21 optimization internals: the driver-localized metadata paths
  * must be exactly equivalent to the Spark-job paths they replaced —
  * same bytes on disk, same rows back, same delta classification —
  * and the localize memo must never serve stale content after an
  * in-place rewrite.
  */
class LocalMetaSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("LocalParquet round-trips all supported types incl nulls, Spark-readable") {
    val dir = tmp("lp") + "/t"
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("s", StringType)))
    val rows = Seq(
      Row(1, 2L, 3.5, true, "x"),
      Row(null, null, null, null, null),
      Row(-7, Long.MaxValue, -0.25, false, ""))
    LocalParquet.overwrite(spark, dir, schema, rows)
    val back = spark.read.parquet(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().toSet == rows.toSet)
    // overwrite replaces, not appends
    LocalParquet.overwrite(spark, dir, schema, rows.take(1))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("Snapshot.publish local fast path equals the distributed write") {
    import spark.implicits._
    val rootL = tmp("snap-l") + "/t"; val rootD = tmp("snap-d") + "/t"
    val data = Seq((1, "a"), (2, "b"), (3, "c"))
    // LocalRelation → LocalParquet path
    Snapshot.publish(data.toDF("k", "v"), rootL, 1)
    // repartition defeats the LocalRelation match → df.write path
    Snapshot.publish(data.toDF("k", "v").repartition(2), rootD, 1)
    val l = Snapshot.read(spark, rootL)
    val d = Snapshot.read(spark, rootD)
    assert(l.schema == d.schema)
    assert(l.collect().toSet == d.collect().toSet)
    assert(Snapshot.currentTag(spark, rootL).contains(1L))
  }

  test("localizedParquet never serves stale rows after an in-place rewrite") {
    import spark.implicits._
    val dir = tmp("lmemo") + "/d"
    Seq(1, 2, 3).toDF("x").coalesce(1).write.parquet(dir)
    assert(FileStats.localizedParquet(spark, dir)
      .collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    // memo hit is a LocalRelation and filter folds driver-side
    val again = FileStats.localizedParquet(spark, dir).filter(col("x") > 1)
    assert(again.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(again.collect().map(_.getInt(0)).toSet == Set(2, 3))
    // rewrite the SAME dir (flat, no pointer): the listing-fingerprint
    // key must miss and the read must see the new content
    Seq(10, 20).toDF("x").coalesce(1).write
      .mode("overwrite").parquet(dir)
    assert(FileStats.localizedParquet(spark, dir)
      .collect().map(_.getInt(0)).toSet == Set(10, 20))
  }

  test("localDistinct on a localized frame equals distinct()") {
    import spark.implicits._
    val dir = tmp("ldist") + "/d"
    Seq(("a", 1), ("a", 1), ("b", 2)).toDF("s", "n")
      .coalesce(1).write.parquet(dir)
    val local = FileStats.localizedParquet(spark, dir)
    assert(FileStats.localDistinct(local).collect().toSet ==
      local.distinct().collect().toSet)
    assert(FileStats.localDistinct(local).count() == 2)
    // non-local frames keep the ordinary distinct
    val dist = local.repartition(2)
    assert(FileStats.localDistinct(dist).collect().toSet ==
      dist.distinct().collect().toSet)
  }

  test("deltaOf fast path classifies exactly like the distributed join") {
    val base = tmp("delta")
    def meta(name: String, len: Long, mt: Long) =
      FileStats.FileMeta(s"file:$base/$name", s"$base/$name", len, mt)
    // listing: kept (meta match), changed-len, changed-mtime, new file,
    // suspect-but-matching
    val listing = Seq(
      meta("kept.parquet", 10, 100),
      meta("grew.parquet", 99, 100),
      meta("touched.parquet", 10, 999),
      meta("new.parquet", 5, 50),
      meta("suspect.parquet", 7, 70))
    val oldRows = Seq(
      Row(s"$base/kept.parquet", 10L, 100L),
      Row(s"$base/grew.parquet", 10L, 100L),
      Row(s"$base/touched.parquet", 10L, 100L),
      Row(s"$base/gone.parquet", 3L, 30L),
      Row(s"$base/suspect.parquet", 7L, 70L))
    val schema = StructType(Seq(StructField("path", StringType),
      StructField("f_len", LongType), StructField("f_mtime", LongType)))
    val localDf = spark.createDataFrame(
      java.util.Arrays.asList(oldRows: _*), schema)
    val distDf = localDf.repartition(2) // defeats the fast path
    val suspect = Set(s"$base/suspect.parquet")
    val (rescanL, droppedL) = FileStats.deltaOf(spark, localDf, listing, suspect)
    val (rescanD, droppedD) = FileStats.deltaOf(spark, distDf, listing, suspect)
    assert(rescanL == rescanD, "rescan sets must agree between paths")
    assert(droppedL == droppedD, "dropped sets must agree between paths")
    assert(rescanL.toSet == Set(s"file:$base/grew.parquet",
      s"file:$base/touched.parquet", s"file:$base/new.parquet",
      s"file:$base/suspect.parquet"))
    assert(droppedL == Set(s"$base/grew.parquet", s"$base/touched.parquet",
      s"$base/gone.parquet", s"$base/suspect.parquet"))
    // a manifest WITHOUT meta columns: every matched file reclassifies
    val noMeta = spark.createDataFrame(
      java.util.Arrays.asList(oldRows.map(r => Row(r.getString(0))): _*),
      StructType(Seq(StructField("path", StringType))))
    val (rescanN, droppedN) = FileStats.deltaOf(spark, noMeta, listing)
    val (rescanN2, droppedN2) =
      FileStats.deltaOf(spark, noMeta.repartition(2), listing)
    assert(rescanN == rescanN2 && droppedN == droppedN2)
    assert(rescanN.size == listing.size, "no meta → every listed file rescans")
  }

  test("footerRowCount equals a Spark count over the same dir") {
    import spark.implicits._
    val dir = tmp("fcount") + "/d"
    spark.range(0, 1234).select(col("id")).repartition(3)
      .write.parquet(dir)
    assert(FileStats.footerRowCount(spark, Seq(dir)) == 1234L)
    assert(FileStats.footerRowCount(spark, Seq(dir, tmp("fcount-missing"))) == 1234L)
  }

  test("new stateful stream derives state partitions from input size; conf restored") {
    import spark.implicits._
    val base = tmp("adapt")
    val src = s"$base/src"; val sink = s"$base/sink"; val ckp = s"$base/ckp"
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1).write.parquet(src)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    graft.streaming.EventStreams.runFileToParquet(spark, src,
      spark.read.parquet(src).schema,
      df => df.dropDuplicates("k"), sink, ckp)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "session conf must be restored after stream start")
    // the checkpoint's offset log records the derived count (a KB-scale
    // landing dir → 1 partition)
    val off = new java.io.File(s"$ckp/offsets")
    val recorded = off.listFiles().map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
    assert(recorded.contains("\"spark.sql.shuffle.partitions\":\"1\""),
      s"offset log should record the derived count, got: ${recorded.take(400)}")
    assert(spark.read.parquet(sink).count() == 2)
  }
}
