package graft

import graft.lake.{FileStats, Routing}
import org.apache.spark.sql.functions._

/** Model-based fuzz of the INDEX-MANIFEST lifecycle — the
  * cross-operation net under RoutingSpec's per-verb pins, over the
  * round-18 center of mass (per-file fingerprints, pointer-published
  * refreshes, marker rows): a random interleaving of tree churn
  * (append file, delete file, in-place overwrite, rename, zero-row
  * append) and maintenance (delta refresh, full rebuild) is replayed
  * against the plain directory as the model. Invariants after every
  * step:
  *  - churn without refresh → every routed read fails LOUD (stale
  *    fingerprint), never silently wrong;
  *  - after refresh/rebuild → routed reads (range, one-sided, eq, OR,
  *    full-scan fallback, metadata-only agg) equal the plain scan
  *    exactly;
  *  - a refresh straight after a refresh is a certified no-op (the
  *    marker-rows contract: nothing rescans forever).
  * Orderings are where manifest bugs hide (a rename between two
  * refreshes, an overwrite landing on a just-refreshed file) — the
  * fuzz walks them with a fixed seed for reproducibility.
  */
class ManifestFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mfuzz-spec").toString

  test("randomized tree-churn/refresh interleavings keep routing loud-or-exact") {
    val rnd = new scala.util.Random(9127)
    val root = tmp()
    var nextId = 0L
    def batch(n: Int): org.apache.spark.sql.DataFrame = {
      val rows = (1 to n).map { _ =>
        nextId += 1
        (nextId, rnd.nextInt(1000).toLong, s"s-$nextId")
      }
      rows.toDF("id", "v", "s")
    }
    // seed tree + indexes
    batch(400).coalesce(2).write.parquet(s"$root/data")
    Routing.indexStats(spark, root, Seq("v"))
    Routing.indexBloom(spark, root, "id")

    def dataFiles(): Seq[java.nio.file.Path] = {
      val d = java.nio.file.Paths.get(s"$root/data")
      val st = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.filter(p =>
          p.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      } finally st.close()
    }
    def dropCrc(p: java.nio.file.Path): Unit =
      java.nio.file.Files.deleteIfExists(
        p.getParent.resolve("." + p.getFileName.toString + ".crc"))

    def verifyExact(step: String): Unit = {
      spark.catalog.refreshByPath(s"$root/data")
      val plain = spark.read.parquet(s"$root/data")
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("id").collect().map(_.getLong(0)).sorted.toSeq
      val preds = Seq(
        col("v").between(100L, 300L),
        col("v") >= lit(700L),                        // one-sided
        col("id") === lit(nextId),                    // bloom eq (newest)
        col("id") === lit(1L) || col("id") === lit(nextId), // OR-of-eq
        col("v") <= lit(50L) || col("v") >= lit(950L),      // tails OR
        upper(col("s")) === lit("NOPE"))              // opaque full-scan
      preds.foreach { p =>
        assert(ids(Routing.readWhere(spark, root, p)) == ids(plain.filter(p)),
          s"routing diverged after $step on $p")
      }
      val agg = Routing.aggStats(spark, root, Seq("v")).head
      assert(agg.getLong(0) == plain.count(), s"aggStats count after $step")
    }
    def verifyLoud(step: String): Unit = {
      val ex = intercept[IllegalStateException](
        Routing.route(spark, root, col("v").between(100L, 300L)))
      assert(ex.getMessage.contains("STALE") ||
        ex.getMessage.contains("no tree fingerprint"),
        s"staleness after $step must be loud: ${ex.getMessage.take(120)}")
    }

    verifyExact("seed")
    // delta-cost oracle from raw FILESYSTEM snapshots, not per-op
    // counters (review r18: counters over-count when two churn ops hit
    // the same file between refreshes — e.g. append-then-delete nets to
    // zero). The expectation is computed exactly as a correct refresh
    // must behave: rescan = new-or-changed vs the last certified
    // snapshot, drop = vanished-or-changed.
    def snapshot(): Map[String, (Long, Long)] = dataFiles().map { p =>
      p.toString -> (java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
    }.toMap
    var certified = snapshot() // state the indexes currently certify
    def expected(): (Long, Long) = {
      val cur = snapshot()
      val changed = certified.keySet.intersect(cur.keySet)
        .filter(k => certified(k) != cur(k))
      (((cur.keySet -- certified.keySet) ++ changed).size.toLong,
        ((certified.keySet -- cur.keySet) ++ changed).size.toLong)
    }
    for (step <- 1 to 18) {
      val op = rnd.nextInt(6)
      val churned = op match {
        case 0 => // append a real batch as one new file
          batch(80).coalesce(1).write.mode("append").parquet(s"$root/data")
          true
        case 1 => // append a ZERO-ROW file (the marker-rows shape)
          batch(1).limit(0).coalesce(1)
            .write.mode("append").parquet(s"$root/data")
          true
        case 2 if dataFiles().size > 1 => // delete a file
          val victim = dataFiles()(rnd.nextInt(dataFiles().size))
          dropCrc(victim); java.nio.file.Files.delete(victim)
          true
        case 3 => // rename a file (metadata-preserving — the v2-fp case)
          val victim = dataFiles()(rnd.nextInt(dataFiles().size))
          val dst = victim.getParent.resolve("zz" + step + "-" +
            victim.getFileName)
          dropCrc(victim); java.nio.file.Files.move(victim, dst)
          true
        case 4 => // overwrite a file IN PLACE (same path, new content)
          val victim = dataFiles()(rnd.nextInt(dataFiles().size))
          val stage = tmp() + "/stage"
          batch(40).coalesce(1).write.parquet(stage)
          val part = new java.io.File(stage).listFiles()
            .filter(_.getName.endsWith(".parquet")).head.toPath
          java.nio.file.Files.copy(part, victim,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          dropCrc(victim)
          true
        case _ => false // maintenance-only step
      }
      spark.catalog.refreshByPath(s"$root/data")
      val (wantScan, wantDrop) = expected()
      if (wantScan + wantDrop > 0) verifyLoud(s"step $step (op $op)")
      if (rnd.nextBoolean() || step == 18) {
        // maintenance: mostly delta refresh, occasionally full rebuild
        if (rnd.nextInt(4) == 0) {
          Routing.indexStats(spark, root, Seq("v"))
          Routing.indexBloom(spark, root, "id")
        } else {
          val (s2, d2) = Routing.refreshIndexes(spark, root)
          // two manifests (stats + bloom): delta cost is exactly the churn
          assert(s2 == 2L * wantScan && d2 == 2L * wantDrop,
            s"step $step refresh must cost the delta: scanned=$s2 " +
              s"(want ${2 * wantScan}) dropped=$d2 (want ${2 * wantDrop})")
          // a refresh straight after a refresh certifies everything kept
          assert(Routing.refreshIndexes(spark, root) == ((0L, 0L)),
            s"step $step: post-refresh refresh must be a certified no-op")
        }
        certified = snapshot()
        verifyExact(s"step $step (op $op, maintained)")
      }
    }
  }
}
