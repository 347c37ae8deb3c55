package graft

import graft.lake.{BucketedUpsert, Constraints, Snapshot}
import org.apache.spark.sql.functions._

/** Constraint-validated ingestion: exact split, strict NULL semantics,
  * auditable multi-batch quarantine, and crash-window heal between the
  * two publishes.
  */
class ConstraintsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("chk-spec").toString

  test("rows split exactly; NULL constraint result quarantines (strict, not SQL CHECK)") {
    val base = tmp()
    val root = s"$base/t"; val q = s"$base/q"
    import spark.implicits._
    val batch = Seq[(Long, java.lang.Double, Long)](
      (1L, 10.0, 1L), (2L, -5.0, 1L), (3L, null, 1L), (4L, 0.0, 1L)
    ).toDF("k", "v", "ver")
    val (good, bad) = Constraints.applyBatchValidated(batch, root, q,
      "k", "ver", nBuckets = 2, tag = 1, constraint = col("v") >= 0)
    assert((good, bad) == (2L, 2L), s"split wrong: ($good, $bad)")
    assert(BucketedUpsert.read(spark, root).select("k").collect()
      .map(_.getLong(0)).sorted.sameElements(Array(1L, 4L)))
    // the NULL row is quarantined — strict semantics, unlike SQL CHECK
    assert(Constraints.quarantined(spark, q).select("k").collect()
      .map(_.getLong(0)).sorted.sameElements(Array(2L, 3L)))
  }

  test("quarantine accumulates across batches with per-batch audit tags") {
    val base = tmp()
    val root = s"$base/t"; val q = s"$base/q"
    import spark.implicits._
    val b1 = Seq((1L, 1.0, 1L), (2L, -1.0, 1L)).toDF("k", "v", "ver")
    val b2 = Seq((3L, -2.0, 2L), (4L, 4.0, 2L)).toDF("k", "v", "ver")
    Constraints.applyBatchValidated(b1, root, q, "k", "ver", 2, 1, col("v") >= 0)
    Constraints.applyBatchValidated(b2, root, q, "k", "ver", 2, 2, col("v") >= 0)
    assert(Constraints.quarantined(spark, q).count() == 2)
    assert(Constraints.quarantined(spark, q, Some(2L)).select("k")
      .head.getLong(0) == 3L)
    assert(BucketedUpsert.read(spark, root).count() == 2)
  }

  test("a crash between the two halves heals on same-tag retry") {
    val base = tmp()
    val root = s"$base/t"; val q = s"$base/q"
    import spark.implicits._
    val batch = Seq((1L, 1.0, 1L), (2L, -1.0, 1L)).toDF("k", "v", "ver")
    // simulate: quarantine half landed at tag 1 (dir + _SUCCESS),
    // table half did not
    batch.filter(col("v") < 0).write.parquet(s"$q/graft_qtag=1")
    val (good, bad) = Constraints.applyBatchValidated(batch, root, q,
      "k", "ver", 2, 1, col("v") >= 0)
    assert((good, bad) == (1L, 1L))
    // the retry landed only the missing table half; quarantine rows
    // are NOT duplicated
    assert(Constraints.quarantined(spark, q).count() == 1)
    assert(BucketedUpsert.read(spark, root).select("k").head.getLong(0) == 1L)
  }

  test("quarantine appends are per-batch dirs; a clean batch writes nothing") {
    val base = tmp()
    val root = s"$base/t"; val q = s"$base/q"
    import spark.implicits._
    // empty-safe read before any rejection
    assert(Constraints.quarantined(spark, q).count() == 0)
    val clean = Seq((1L, 1.0, 1L), (2L, 2.0, 1L)).toDF("k", "v", "ver")
    Constraints.applyBatchValidated(clean, root, q, "k", "ver", 2, 1,
      col("v") >= 0)
    // a violation-free batch must not create a quarantine partition
    val fs = new java.io.File(q)
    assert(!fs.exists || fs.listFiles.forall(!_.getName.startsWith("graft_qtag=")),
      "clean batch created a quarantine dir")
    val dirty = Seq((3L, -3.0, 2L)).toDF("k", "v", "ver")
    Constraints.applyBatchValidated(dirty, root, q, "k", "ver", 2, 2,
      col("v") >= 0)
    assert(Constraints.quarantined(spark, q, Some(2L)).count() == 1)
  }
}
