package graft

import graft.operators.Salt
import org.apache.spark.sql.functions._

/** operators.Salt — skew-salted shuffle join: result-identical to the
  * plain join, and the hot key's rows really do spread across reducers.
  */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (80% of rows) + a long tail
  private def fact = ((1 to 8000).map(i => (1L, i.toLong)) ++
    (8001 to 10000).map(i => (i.toLong % 50 + 2, i.toLong)))
    .toDF("k", "row_id")
  private def dim = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "label")

  test("salted join is row-for-row identical to the plain join") {
    val salted = Salt.saltedJoin(fact, dim, "k", 8, xxhash64(col("row_id")))
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.select("k", "row_id", "label")
      .except(plain.select("k", "row_id", "label")).count() == 0)
    assert(plain.select("k", "row_id", "label")
      .except(salted.select("k", "row_id", "label")).count() == 0)
  }

  test("a NULL salt seed still salts the row instead of silently dropping it") {
    // a nullable seed column (e.g. an anonymous-user id): pmod(null, n)
    // is null and a null join key would vanish from the equi-join —
    // the row must survive with the same result as the plain join
    val nullSeedFact = fact.withColumn("seed",
      when(col("row_id") % 3 === 0, col("row_id")).otherwise(lit(null)))
    val salted = Salt.saltedJoin(nullSeedFact, dim, "k", 8, col("seed"))
    val plain = nullSeedFact.join(dim, Seq("k"))
    assert(salted.count() == plain.count(),
      "null-seed rows must not be dropped by the salting")
  }

  test("the hot key's rows spread across multiple post-join partitions") {
    // AQE coalesces this toy shuffle into one partition, hiding the
    // spread we're here to observe; measure the static plan (restore in
    // finally — shared session).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def hotSpread(df: org.apache.spark.sql.DataFrame): Long =
        df.filter(col("k") === 1L)
          .select(spark_partition_id().as("p")).distinct().count()
      val salted = Salt.saltedJoin(fact, dim, "k", 8, xxhash64(col("row_id")))
      // plain shuffle join: every k=1 row lands on one reducer
      val plain = fact.join(dim.hint("shuffle_hash"), Seq("k"))
      assert(hotSpread(plain) == 1L, "unsalted hot key should occupy one partition")
      val spread = hotSpread(salted)
      assert(spread > 1L, s"salted hot key should spread, got $spread partition(s)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("deterministic: the same seed column shuffles identically across runs") {
    def run() = Salt.saltedJoin(fact, dim, "k", 4, xxhash64(col("row_id")))
      .select("k", "row_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("a pre-existing graft_salt column is rejected, not clobbered") {
    val poisoned = fact.withColumn("graft_salt", col("row_id"))
    val e = intercept[IllegalArgumentException](
      Salt.saltedJoin(poisoned, dim, "k", 4, xxhash64(col("row_id"))))
    assert(e.getMessage.contains("graft_salt"))
    intercept[IllegalArgumentException](
      Salt.saltedJoin(fact, dim.withColumn("graft_salt", col("k")), "k", 4,
        xxhash64(col("row_id"))))
  }
}
