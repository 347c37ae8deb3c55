package graft

import graft.lake.{BucketedUpsert, IncrNdv, Snapshot}
import org.apache.spark.sql.functions._

/** KMV-sketch NDV maintenance: the maintained sketch must equal the
  * from-scratch sketch over the table's current state after every
  * batch (merge-closure of KMV), refresh must stay bucket-granular,
  * small groups must be exact, and cross-bucket duplicate values must
  * merge to one distinct.
  */
class IncrNdvSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("incrndv-spec").toString

  private val K = 16

  /** From-scratch KMV over the table's CURRENT rows — the merge-closure
    * oracle (same math as IncrNdv, built in one pass with no buckets). */
  private def scratch(root: String): Map[String, (Double, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("u"), col("nv"))
    BucketedUpsert.read(spark, root)
      .select(col("g"), col("nv").cast("string").as("nv")).distinct()
      .withColumn("u",
        conv(substring(md5(col("nv")), 1, 15), 16, 10).cast("double")
          / lit(math.pow(16.0, 15)))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= K)
      .groupBy("g").agg(count(lit(1)).as("n_mins"), max("u").as("uk"))
      .select(col("g"),
        when(col("n_mins") < K, col("n_mins").cast("double"))
          .otherwise(lit((K - 1).toDouble) / col("uk")).as("est"),
        col("n_mins"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
  }

  private def mvNdv(mv: String): Map[String, (Double, Long)] =
    IncrNdv.readNdv(spark, mv, Seq("g"), K)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("maintained sketch equals from-scratch after each batch; only touched buckets recompute") {
    val base = tmp()
    val root = s"$base/t"; val mv = s"$base/mv"
    import spark.implicits._
    val nBuckets = 8
    // nv = k % 37 → plenty of cross-bucket duplicates; g0/g1/g2 groups
    val batch1 = (1L to 300L).map(k => (k, s"g${k % 3}", k % 37, 1L))
      .toDF("k", "g", "nv", "ver")
    BucketedUpsert.applyBatch(batch1, root, "k", "ver", nBuckets, tag = 1)
    val n1 = IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K)
    assert(n1 > 0 && n1 <= nBuckets)
    assert(mvNdv(mv) == scratch(root))

    // one-key update MOVES a value into a new group: exactly one bucket
    val batch2 = Seq((7L, "g_new", 999L, 2L)).toDF("k", "g", "nv", "ver")
    BucketedUpsert.applyBatch(batch2, root, "k", "ver", nBuckets, tag = 2)
    val n2 = IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K)
    assert(n2 == 1, s"a one-key batch must recompute exactly 1 bucket, got $n2")
    val got = mvNdv(mv)
    assert(got == scratch(root))
    assert(got("g_new") == (1.0, 1L), "a 1-distinct group reports exactly 1")

    // no-op refresh
    assert(IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K) == 0)
    assert(Snapshot.currentTag(spark, mv).contains(2L))
  }

  test("a value present in MANY buckets is one distinct after the merge") {
    val base = tmp()
    val root = s"$base/t"; val mv = s"$base/mv"
    import spark.implicits._
    // every key carries THE SAME value → every bucket's sketch retains
    // it → the merged NDV must still be exactly 1 (exact branch)
    val batch = (1L to 64L).map(k => (k, "g", 42L, 1L)).toDF("k", "g", "nv", "ver")
    BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets = 8, tag = 1)
    IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K)
    assert(mvNdv(mv) == Map("g" -> (1.0, 1L)))
  }

  test("groups under k are exact; estimate error is KMV-bounded above k") {
    val base = tmp()
    val root = s"$base/t"; val mv = s"$base/mv"
    import spark.implicits._
    // small: 5 distinct (exact). big: 400 distinct (estimated).
    val rows = (1L to 5L).map(k => (k, "small", k, 1L)) ++
      (100L to 499L).map(k => (k, "big", k, 1L))
    BucketedUpsert.applyBatch(rows.toDF("k", "g", "nv", "ver"), root,
      "k", "ver", nBuckets = 8, tag = 1)
    IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K)
    val got = mvNdv(mv)
    assert(got("small") == (5.0, 5L), "under-k group must be exact")
    val (est, nMins) = got("big")
    assert(nMins == K)
    // ~1/sqrt(k-2) relative error; 4 sigma at k=16 is ~107%: loose
    // bound, but catches any merge/dedup bug (those are 10x-offs)
    assert(est > 100 && est < 1200, s"estimate wildly off for 400 distinct: $est")
  }

  test("NULL values do not count as distinct and cannot inflate the sketch") {
    val base = tmp()
    val root = s"$base/t"; val mv = s"$base/mv"
    import spark.implicits._
    // 3 real distinct values + NULLs on other keys: NDV must be exactly
    // 3 (exact branch), not 4 — an unfiltered NULL would hash to a NULL
    // u, sort NULLS FIRST into slot 1, and inflate n_mins
    val rows = Seq[(Long, String, java.lang.Long, Long)](
      (1L, "g", 10L, 1L), (2L, "g", 20L, 1L), (3L, "g", 30L, 1L),
      (4L, "g", null, 1L), (5L, "g", null, 1L))
    BucketedUpsert.applyBatch(rows.toDF("k", "g", "nv", "ver"), root,
      "k", "ver", nBuckets = 4, tag = 1)
    IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K)
    assert(mvNdv(mv) == Map("g" -> (3.0, 3L)))
  }

  test("randomized multi-batch sweep: maintained sketch equals from-scratch after every batch") {
    val rnd = new scala.util.Random(1543)
    import spark.implicits._
    for (trial <- 1 to 5) {
      val base = tmp()
      val root = s"$base/t"; val mv = s"$base/mv"
      val nBuckets = 1 + rnd.nextInt(8)
      var ver = 0L
      for (tag <- 1 to 4) {
        ver += 1
        val n = 20 + rnd.nextInt(120)
        val rows = (1 to n).map { _ =>
          val k = rnd.nextInt(300).toLong
          (k, s"g${rnd.nextInt(3)}", rnd.nextInt(50).toLong, ver)
        }
        // dedup keys within the batch (applyBatch resolves per key, but
        // equal versions tie arbitrarily — keep the invariant clean)
        val batch = rows.groupBy(_._1).map(_._2.head).toSeq
          .toDF("k", "g", "nv", "ver")
        BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets, tag)
        IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K)
        assert(mvNdv(mv) == scratch(root),
          s"trial $trial tag $tag (nBuckets=$nBuckets): maintained != scratch")
      }
    }
  }

  test("reading with k above the stored sketch's fail-fasts") {
    val base = tmp()
    val root = s"$base/t"; val mv = s"$base/mv"
    import spark.implicits._
    val batch = (1L to 50L).map(k => (k, "g", k, 1L)).toDF("k", "g", "nv", "ver")
    BucketedUpsert.applyBatch(batch, root, "k", "ver", nBuckets = 4, tag = 1)
    IncrNdv.refresh(spark, root, mv, "k", Seq("g"), "nv", K)
    intercept[IllegalArgumentException](
      IncrNdv.readNdv(spark, mv, Seq("g"), K + 1).collect())
    // a smaller read-k is fine (prefix property of the sketch)
    assert(IncrNdv.readNdv(spark, mv, Seq("g"), 8).collect().nonEmpty)
  }
}
