package graft

import graft.lake.Snapshot
import org.apache.spark.sql.functions._

/** Snapshot crash-window behavior: a publish that died BETWEEN the
  * v<tag> directory write and the pointer swap leaves an orphan dir and
  * an unswapped pointer. The replay must overwrite the orphan and
  * converge, and GC must never let an orphan consume a retention slot
  * that protects the genuinely-previous published snapshot (whose path
  * in-flight readers still hold).
  */
class SnapshotSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("snap-spec").toString + "/t"

  private def dirs(root: String): Set[String] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSet

  private def df(n: Long, tagVal: Long) =
    spark.range(0, n).select(col("id"), lit(tagVal).as("t"))

  test("replay after a crash between dir write and pointer swap converges") {
    val root = tmp()
    Snapshot.publish(df(10, 0), root, 0)
    // crashed publish of tag 1: the snapshot dir landed (with DIFFERENT,
    // possibly torn content), the pointer did not move
    df(3, 99).write.mode("overwrite").parquet(s"$root/v1")
    assert(Snapshot.currentTag(spark, root).contains(0L),
      "pointer must still resolve the old snapshot after the crash")
    // the batch replays: same tag, the intended content
    Snapshot.publish(df(20, 1), root, 1)
    assert(Snapshot.currentTag(spark, root).contains(1L))
    val got = Snapshot.read(spark, root).select("id", "t").collect()
    assert(got.length == 20 && got.forall(_.getLong(1) == 1L),
      "replay must overwrite the orphan's content wholesale")
  }

  test("a future-tag orphan cannot evict the previous published snapshot") {
    val root = tmp()
    Snapshot.publish(df(1, 0), root, 0)
    Snapshot.publish(df(2, 1), root, 1)
    // crashed FUTURE publish left an orphan that sorts newest
    df(3, 99).write.mode("overwrite").parquet(s"$root/v5")
    Snapshot.publish(df(4, 2), root, 2) // keep=2
    // without the tag<=published guard, GC would retain {v5, v2} and
    // delete v1 — the snapshot in-flight readers of the pre-publish
    // state still hold
    assert(dirs(root) == Set("v1", "v2", "v5"),
      s"v1 must survive, v0 must be collected, the orphan is left: ${dirs(root)}")
    assert(Snapshot.currentTag(spark, root).contains(2L))
    // a later publish that reuses the orphan tag overwrites it and the
    // normal retention resumes
    Snapshot.publish(df(6, 5), root, 5)
    assert(dirs(root) == Set("v2", "v5"), s"got ${dirs(root)}")
    assert(Snapshot.read(spark, root).count() == 6)
  }

  test("time travel resolves each retained published state, floor on gaps") {
    val root = tmp()
    Snapshot.publish(df(10, 1), root, 1, keep = 3)
    Snapshot.publish(df(20, 4), root, 4, keep = 3)
    Snapshot.publish(df(30, 9), root, 9, keep = 3)
    assert(Snapshot.publishedTags(spark, root) == Seq(1L, 4L, 9L))
    assert(Snapshot.readAt(spark, root, 1).count() == 10)
    // asOf between published tags floors to the newest at-or-below state
    assert(Snapshot.readAt(spark, root, 8).count() == 20)
    assert(Snapshot.readAt(spark, root, 100).count() == 30)
    // asOf before the table existed is unreachable
    val e = intercept[IllegalStateException](Snapshot.readAt(spark, root, 0))
    assert(e.getMessage.contains("no retained snapshot"))
  }

  test("time travel never resolves a crashed-publish orphan") {
    val root = tmp()
    Snapshot.publish(df(10, 1), root, 1, keep = 3)
    // a completed-but-never-published dir (crash before pointer swap),
    // then the pipeline moves on: the orphan sits inside the tag range
    df(99, 99).write.mode("overwrite").parquet(s"$root/v2")
    Snapshot.publish(df(30, 3), root, 3, keep = 3)
    assert(Snapshot.publishedTags(spark, root) == Seq(1L, 3L),
      "the orphan tag must not appear in the published history")
    // asOf=2 floors PAST the orphan to the genuinely-published v1
    assert(Snapshot.readAt(spark, root, 2).count() == 10)
  }

  test("time travel past retention fails with the keep hint") {
    val root = tmp()
    Snapshot.publish(df(10, 1), root, 1) // keep=2
    Snapshot.publish(df(20, 2), root, 2)
    Snapshot.publish(df(30, 3), root, 3) // v1 GC'd
    assert(Snapshot.publishedTags(spark, root) == Seq(2L, 3L))
    val e = intercept[IllegalStateException](Snapshot.readAt(spark, root, 1))
    assert(e.getMessage.contains("keep"))
    assert(Snapshot.readAt(spark, root, 2).count() == 20)
  }

  test("keep=3: an orphan cannot evict ANY retained published snapshot") {
    val root = tmp()
    Snapshot.publish(df(1, 10), root, 10, keep = 3)
    Snapshot.publish(df(2, 20), root, 20, keep = 3)
    // crashed publish of 25 (dir written, pointer unswapped)
    df(3, 99).write.mode("overwrite").parquet(s"$root/v25")
    Snapshot.publish(df(4, 30), root, 30, keep = 3)
    // the pointer history says the published states are 30,20,10 —
    // retention protects all three; tag-sorted retention would have
    // let the v25 orphan consume a slot and delete v10
    assert(dirs(root).contains("v10"),
      s"keep=3 must retain the third-newest PUBLISHED state: ${dirs(root)}")
    assert(!dirs(root).contains("v25"), s"orphan must be collected: ${dirs(root)}")
    assert(Snapshot.readAt(spark, root, 10).count() == 1)
  }

  test("a sub-tag orphan cannot push the previous snapshot past retention") {
    val root = tmp()
    Snapshot.publish(df(1, 0), root, 0)
    Snapshot.publish(df(2, 2), root, 2)
    // crashed publish of tag 3 (above published 2), then the pipeline
    // moves on to tag 4 without replaying 3: the orphan sits BETWEEN
    // the new tag and the previous published one in the GC sort
    df(3, 99).write.mode("overwrite").parquet(s"$root/v3")
    Snapshot.publish(df(4, 4), root, 4) // keep=2 → newest two are v4, v3(orphan)
    assert(dirs(root).contains("v2"),
      s"the previously-published v2 must never be deleted by the publish " +
        s"that supersedes it: ${dirs(root)}")
    // the orphan is collected once the published tag has moved past it
    Snapshot.publish(df(5, 5), root, 5)
    assert(!dirs(root).contains("v3"), s"orphan must age out: ${dirs(root)}")
    assert(Snapshot.read(spark, root).count() == 5)
  }
}
