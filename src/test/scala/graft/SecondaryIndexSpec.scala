package graft

import graft.lake.{BucketedUpsert, SecondaryIndex, Snapshot}
import org.apache.spark.sql.functions._

/** Secondary index: lookup equals the full scan, refresh stays
  * bucket-granular, a rewritten bucket's filter forgets removed values
  * (exact deletion), lookups prune to a minority of buckets, and a
  * stale index fail-fasts instead of false-negating.
  */
class SecondaryIndexSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("six-spec").toString

  test("lookup equals the full-scan filter; probes prune to few buckets") {
    val base = tmp()
    val root = s"$base/t"; val ix = s"$base/ix"
    import spark.implicits._
    val batch = (1L to 2000L).map(k => (k, s"name-$k", 1L)).toDF("k", "s", "ver")
    BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets = 32, tag = 1)
    val n1 = SecondaryIndex.refresh(spark, root, ix, "k", "s")
    assert(n1 > 0 && n1 <= 32)
    val probes = Seq("name-17", "name-999", "no-such-name")
    val got = SecondaryIndex.lookup(spark, root, ix, "s", probes)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == Set(17L, 999L))
    // 2 present values live in ≤2 buckets; Bloom fp adds at most a few
    val admitted = SecondaryIndex.lookupBuckets(spark, ix, probes)
    assert(admitted.size <= 6,
      s"expected ≤6 of 32 buckets admitted, got ${admitted.size}")
  }

  test("refresh is bucket-granular and a rebuilt bucket forgets removed values") {
    val base = tmp()
    val root = s"$base/t"; val ix = s"$base/ix"
    import spark.implicits._
    val batch1 = (1L to 500L).map(k => (k, s"name-$k", 1L)).toDF("k", "s", "ver")
    BucketedUpsert.applyBatch(batch1, root, "k", "ver", nBuckets = 8, tag = 1)
    SecondaryIndex.refresh(spark, root, ix, "k", "s")
    // rename ONE key → one bucket rewritten → one filter recomputed
    val batch2 = Seq((42L, "renamed-42", 2L)).toDF("k", "s", "ver")
    BucketedUpsert.applyBatch(batch2, root, "k", "ver", nBuckets = 8, tag = 2)
    val n2 = SecondaryIndex.refresh(spark, root, ix, "k", "s")
    assert(n2 == 1, s"a one-key batch must recompute exactly 1 bucket, got $n2")
    assert(SecondaryIndex.lookup(spark, root, ix, "s", Seq("renamed-42"))
      .select("k").head.getLong(0) == 42L)
    // the OLD name must be gone: its bucket's filter was rebuilt from
    // current rows — this is the deletion support plain Blooms lack
    assert(SecondaryIndex.lookup(spark, root, ix, "s", Seq("name-42"))
      .count() == 0, "stale value survived the bucket rebuild")
  }

  test("randomized multi-batch sweep: lookup equals full scan after every refresh") {
    val rnd = new scala.util.Random(2291)
    import spark.implicits._
    for (trial <- 1 to 3) {
      val base = tmp()
      val root = s"$base/t"; val ix = s"$base/ix"
      val nBuckets = 2 + rnd.nextInt(8)
      for (tag <- 1 to 4) {
        val n = 10 + rnd.nextInt(80)
        val batch = (1 to n).map { _ =>
          val k = rnd.nextInt(400).toLong
          (k, s"name-${rnd.nextInt(150)}", tag.toLong)
        }.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "s", "ver")
        BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets, tag)
        SecondaryIndex.refresh(spark, root, ix, "k", "s")
        val probes = (1 to 5).map(_ => s"name-${rnd.nextInt(170)}")
        val got = SecondaryIndex.lookup(spark, root, ix, "s", probes)
          .select("k").collect().map(_.getLong(0)).toSet
        val want = BucketedUpsert.read(spark, root)
          .filter(col("s").isin(probes: _*))
          .select("k").collect().map(_.getLong(0)).toSet
        assert(got == want,
          s"trial $trial tag $tag (nBuckets=$nBuckets): lookup != scan for $probes")
      }
    }
  }

  test("refreshing with different filter params fail-fasts instead of mixing filters") {
    val base = tmp()
    val root = s"$base/t"; val ix = s"$base/ix"
    import spark.implicits._
    val batch1 = (1L to 100L).map(k => (k, s"name-$k", 1L)).toDF("k", "s", "ver")
    BucketedUpsert.applyBatch(batch1, root, "k", "ver", nBuckets = 4, tag = 1)
    SecondaryIndex.refresh(spark, root, ix, "k", "s", mLog2 = 16, k = 3)
    BucketedUpsert.applyBatch(Seq((7L, "renamed", 2L)).toDF("k", "s", "ver"),
      root, "k", "ver", nBuckets = 4, tag = 2)
    // a mixed-param refresh would carry m=2^16 rows next to m=2^12
    // rows and the probe would silently false-negate — forbidden
    intercept[IllegalArgumentException](
      SecondaryIndex.refresh(spark, root, ix, "k", "s", mLog2 = 12, k = 3))
    SecondaryIndex.refresh(spark, root, ix, "k", "s", mLog2 = 16, k = 3)
    assert(SecondaryIndex.lookup(spark, root, ix, "s", Seq("renamed"))
      .count() == 1)
  }

  test("a stale index fail-fasts on lookup instead of false-negating") {
    val base = tmp()
    val root = s"$base/t"; val ix = s"$base/ix"
    import spark.implicits._
    val batch1 = (1L to 100L).map(k => (k, s"name-$k", 1L)).toDF("k", "s", "ver")
    BucketedUpsert.applyBatch(batch1, root, "k", "ver", nBuckets = 4, tag = 1)
    SecondaryIndex.refresh(spark, root, ix, "k", "s")
    BucketedUpsert.applyBatch(Seq((999L, "brand-new", 2L)).toDF("k", "s", "ver"),
      root, "k", "ver", nBuckets = 4, tag = 2)
    intercept[IllegalArgumentException](
      SecondaryIndex.lookup(spark, root, ix, "s", Seq("brand-new")))
    SecondaryIndex.refresh(spark, root, ix, "k", "s")
    assert(SecondaryIndex.lookup(spark, root, ix, "s", Seq("brand-new"))
      .count() == 1)
    assert(Snapshot.currentTag(spark, ix).contains(2L))
  }

  test("lookup on a fully-emptied table returns an empty frame WITH the table schema") {
    val base = tmp()
    val root = s"$base/t"; val ix = s"$base/ix"
    import spark.implicits._
    val batch1 = (1L to 50L).map(k => (k, s"name-$k", 1L)).toDF("k", "s", "ver")
    BucketedUpsert.applyBatch(batch1, root, "k", "ver", nBuckets = 4, tag = 1)
    SecondaryIndex.refresh(spark, root, ix, "k", "s")
    // delete EVERY key: the current manifest has zero entries, but the
    // previous retained version still pins the old data files
    BucketedUpsert.deleteKeys(spark, root, "k",
      (1L to 50L).toDF("k"), tag = 2)
    val got = SecondaryIndex.lookup(spark, root, ix, "s", Seq("name-7"))
    // downstream callers select the indexed columns — this used to be
    // an AnalysisException on the zero-column emptyDataFrame
    assert(got.select("k", "s").count() == 0)
    assert(got.columns.toSet == Set("k", "s", "ver"),
      s"empty-table lookup must carry the table schema: ${got.columns.toSeq}")
  }

  test("refresh on a FRAGMENTED table indexes every fragment, not only the newest") {
    val base = tmp()
    val root = s"$base/t"; val ix = s"$base/ix"
    import spark.implicits._
    // one bucket: every fragment lands in it. The OLD fragment holds
    // 'alpha'; the NEW fragment (the only thing the change feed would
    // report) holds 'beta'. A feed-fed refresh replaced the bucket's
    // filter with beta-only bits and lookup('alpha') false-negated —
    // the one failure the index forbids.
    BucketedUpsert.appendFragment(
      Seq((1L, "alpha", 1L)).toDF("k", "s", "ver"),
      root, "k", nBuckets = 1, tag = 1, versionCol = "ver")
    BucketedUpsert.appendFragment(
      Seq((2L, "beta", 2L)).toDF("k", "s", "ver"),
      root, "k", nBuckets = 1, tag = 2, versionCol = "ver")
    SecondaryIndex.refresh(spark, root, ix, "k", "s")
    assert(SecondaryIndex.lookup(spark, root, ix, "s", Seq("alpha"))
      .select("k").collect().map(_.getLong(0)).toSeq == Seq(1L),
      "older fragments' values must survive an incremental refresh")
    // and the routed read agrees (resolve hook + exact filter)
    graft.lake.Routing.indexSecondary(spark, root, "k", "s")
    assert(graft.lake.Routing.readWhere(spark, root, col("s") === lit("alpha"))
      .select("k").head().getLong(0) == 1L)
  }
}
