package graft

import graft.lake.{BloomIndex, FileStats}
import org.apache.spark.sql.functions._

/** Bloom file index: no false negatives (the correctness law), real
  * file skipping on an unsorted column (the point of the index),
  * build/probe hash agreement, and param-mismatch fail-fast via the
  * self-described manifest.
  */
class BloomIndexSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("bloom-spec").toString

  private def writeShuffled(dataDir: String, n: Long, files: Int): Unit =
    spark.range(0, n).select(col("id").as("k"), (col("id") * 7).as("v"))
      .repartition(files).write.parquet(dataDir)

  test("pruned read equals the plain filter for present, absent, and mixed probes") {
    val base = tmp()
    val dataDir = s"$base/data"; val bloomDir = s"$base/bloom"
    writeShuffled(dataDir, 5000, 16)
    BloomIndex.writeBloom(spark, dataDir, bloomDir, "k")
    val plain = spark.read.parquet(dataDir)
    def check(values: Seq[String]): Unit = {
      val got = BloomIndex.prunedReadIn(spark, dataDir, bloomDir, "k", values)
        .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = plain.filter(col("k").cast("string").isin(values: _*))
        .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"pruning changed results for $values")
    }
    check(Seq("17"))                       // single present key
    check(Seq("999999"))                   // absent key → empty
    check((1 to 25).map(i => (i * 111L).toString)) // mixed, some absent
  }

  test("probing a handful of keys opens a small minority of 64 files") {
    val base = tmp()
    val dataDir = s"$base/data"; val bloomDir = s"$base/bloom"
    writeShuffled(dataDir, 20000, 64)
    BloomIndex.writeBloom(spark, dataDir, bloomDir, "k")
    val hit = BloomIndex.survivors(spark, bloomDir, Seq("123", "4567", "19999"))
    // 3 keys live in ≤3 files; at m=2^16, k=3 and ~312 rows/file the
    // false-positive rate is ~1e-6 — anything near 64 means the
    // filter does not discriminate
    assert(hit.nonEmpty && hit.size <= 6,
      s"expected ≤6 surviving files out of 64, got ${hit.size}")
  }

  test("build-side (Spark md5) and probe-side (JVM md5) positions agree") {
    val base = tmp()
    val dataDir = s"$base/data"; val bloomDir = s"$base/bloom"
    spark.range(0, 200).select(col("id").as("k"))
      .repartition(8).write.parquet(dataDir)
    BloomIndex.writeBloom(spark, dataDir, bloomDir, "k")
    // every present key must be found (no false negatives, k by k)
    (0L until 200L by 17L).foreach { k =>
      val got = BloomIndex.prunedReadIn(spark, dataDir, bloomDir, "k",
        Seq(k.toString)).count()
      assert(got == 1L, s"key $k lost by the index — false negative")
    }
  }

  test("a manifest with mixed filter params fail-fasts instead of false-negating") {
    val base = tmp()
    val dataDir = s"$base/data"; val bloomDir = s"$base/bloom"
    writeShuffled(dataDir, 500, 4)
    BloomIndex.writeBloom(spark, dataDir, bloomDir, "k", mLog2 = 12, k = 3)
    // simulate a second interrupted writeBloom with different params
    // leaving extra rows in the same manifest directory
    val extraData = s"$base/data2"
    writeShuffled(extraData, 100, 1)
    BloomIndex.writeBloom(spark, extraData, s"$base/bloom2", "k", mLog2 = 14, k = 2)
    spark.read.parquet(
        graft.lake.FileStats.resolveManifest(spark, s"$base/bloom2"))
      .write.mode("append").parquet(
        graft.lake.FileStats.resolveManifest(spark, bloomDir))
    val ex = intercept[IllegalArgumentException] {
      BloomIndex.survivors(spark, bloomDir, Seq("17"))
    }
    assert(ex.getMessage.contains("rebuild"),
      s"mixed params must demand a rebuild: ${ex.getMessage}")
  }

  test("NULL keys are not indexed and break nothing") {
    val base = tmp()
    val dataDir = s"$base/data"; val bloomDir = s"$base/bloom"
    import spark.implicits._
    Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (2L, "c"))
      .toDF("k", "s").coalesce(1).write.parquet(dataDir)
    BloomIndex.writeBloom(spark, dataDir, bloomDir, "k")
    assert(BloomIndex.prunedReadIn(spark, dataDir, bloomDir, "k", Seq("2"))
      .select("s").head.getString(0) == "c")
  }

  test("an interrupted append-only refresh rescans its suspect files instead of certifying them") {
    val base = tmp()
    val dataDir = s"$base/data"; val bloomDir = s"$base/bloom"
    writeShuffled(dataDir, 2000, 4)
    BloomIndex.writeBloom(spark, dataDir, bloomDir, "k")
    // a successful append-only refresh leaves NO pending marker
    spark.range(2000, 2100).select(col("id").as("k"), (col("id") * 7).as("v"))
      .coalesce(1).write.mode("append").parquet(dataDir)
    assert(BloomIndex.refreshBloom(spark, dataDir, bloomDir, "k") == ((1L, 0L)))
    assert(!new java.io.File(s"$bloomDir/_pending_append").exists(),
      "a completed refresh must clear its pending marker")
    // simulate a crash mid-append: the marker names a current file
    // whose rows may be INCOMPLETE (all its meta is correct, so a
    // naive delta would certify it as kept — silent false negatives).
    // The healing rerun must DROP and RESCAN exactly the suspect file.
    val victim = FileStats.normPath(
      spark.read.parquet(dataDir).inputFiles.min)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$bloomDir/_pending_append"), victim)
    val (scanned, dropped) = BloomIndex.refreshBloom(spark, dataDir, bloomDir, "k")
    assert(scanned == 1 && dropped == 1,
      s"the suspect file must rescan, got scanned=$scanned dropped=$dropped")
    assert(!new java.io.File(s"$bloomDir/_pending_append").exists())
    // probes over the healed index stay exact, including in the victim
    val vKeys = spark.read.parquet(victim).select("k").limit(3)
      .collect().map(_.getLong(0).toString).toSeq
    val got = BloomIndex.prunedReadIn(spark, dataDir, bloomDir, "k", vKeys)
      .count()
    val want = spark.read.parquet(dataDir)
      .filter(col("k").cast("string").isin(vKeys: _*)).count()
    assert(got == want && want > 0, s"healed index lost rows: $got vs $want")
  }
}
