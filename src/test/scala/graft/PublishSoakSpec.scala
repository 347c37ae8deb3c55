package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import graft.lake.FileStats

/** Multithreaded soak of the optimistic publish protocol (VERDICT r19
  * #6): the deterministic race specs in FileStatsSpec pin each known
  * interleaving; this drives N publishers × M cycles against ONE
  * manifest dir with randomized sleeps and asserts the invariants the
  * protocol PROMISES hold under arbitrary schedules:
  *  - every publish completes (no wedge, no stage-guard firing, no
  *    clobbered commit — the failure modes of the three designs the
  *    r19 reviews rejected);
  *  - a reader that resolves-and-reads always observes a COMPLETE,
  *    SELF-CONSISTENT version (payload matches its own fingerprint
  *    stamp — never a torn mix of two publishes); a reader lapped by
  *    two flips between resolve and read may see its dir GC'd
  *    (documented retention = one cycle) and simply re-resolves;
  *  - after the dust settles, exactly the retained versions remain:
  *    orphans and superseded versions sweep once the pointer passes
  *    them.
  */
class PublishSoakSpec extends SparkSpec {

  test("N racing publishers x M cycles: no wedge, no torn read, GC converges (>=100 publishes)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("pub-soak").toString
    val dir = s"$root/stats"
    // seed version so every racer starts from a resolvable pointer
    FileStats.publishManifest(spark, dir, "fp-seed-0") { dest =>
      Seq(("seed", 0L)).toDF("payload", "n_rows")
        .coalesce(1).write.mode("overwrite").parquet(dest)
    }
    val publishers = 4
    val cycles = 30 // 4 x 30 = 120 racing publishes
    val rnd = new java.util.Random(0xBEEF)
    def sleepJitter(): Unit = {
      val ms = synchronized { rnd.nextInt(8) }
      if (ms > 0) Thread.sleep(ms)
    }
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val published = new AtomicInteger(0)
    val stop = new AtomicBoolean(false)
    val tornReads = new AtomicInteger(0)
    val racedRetries = new AtomicInteger(0)
    val readsOk = new AtomicLong(0L)

    val pubThreads = (0 until publishers).map { id =>
      new Thread(() => {
        try {
          for (c <- 1 to cycles) {
            val tag = s"$id-$c"
            sleepJitter()
            FileStats.publishManifest(spark, dir, s"fp-$tag") { dest =>
              sleepJitter() // widen the stage window racers overlap in
              Seq((tag, c.toLong)).toDF("payload", "n_rows")
                .coalesce(1).write.mode("overwrite").parquet(dest)
            }
            published.incrementAndGet()
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"soak-pub-$id")
    }
    // readers hammer resolve-and-read the whole time: a resolved dir
    // may be lapped by >=2 flips and GC'd before the read lands (the
    // documented one-cycle retention) -> re-resolve; anything else
    // observed incomplete or inconsistent is a protocol violation
    val readThreads = (0 until 2).map { id =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            val v = FileStats.resolveManifest(spark, dir)
            if (v != dir) { // pointer present
              try {
                val rows = spark.read.parquet(v)
                  .select("payload").collect().map(_.getString(0))
                val fp = FileStats.recordedTreeFp(spark, v)
                // a version GC'd BETWEEN the parquet read and the fp
                // read is the legal lapped-reader state (one-cycle
                // retention), not a torn publish — only an anomaly in
                // a STILL-EXISTING version is a protocol violation
                // (review r20 pass 1; pass 2: the recursive delete
                // unlinks _tree_fp BEFORE the dir itself, so the
                // existence verdict must be taken AFTER the in-flight
                // delete had time to finish, not inside its window)
                if (rows.length != 1 || fp.isEmpty) {
                  Thread.sleep(100)
                  if (new java.io.File(v).exists())
                    tornReads.incrementAndGet()
                  else racedRetries.incrementAndGet()
                } else if (fp.get != s"fp-${rows.head}" &&
                    !(rows.head == "seed" && fp.get == "fp-seed-0"))
                  tornReads.incrementAndGet()
                else readsOk.incrementAndGet()
              } catch {
                case _: Exception => racedRetries.incrementAndGet()
              }
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      }, s"soak-read-$id")
    }
    (pubThreads ++ readThreads).foreach(_.start())
    pubThreads.foreach(_.join(600000))
    stop.set(true)
    readThreads.foreach(_.join(60000))

    assert(failures.isEmpty, {
      val f = failures.peek(); s"a publisher/reader died: $f"
    })
    assert(published.get() == publishers * cycles,
      s"every publish must complete: ${published.get()}")
    assert(tornReads.get() == 0,
      s"${tornReads.get()} torn/inconsistent reads — a reader observed " +
        "a version whose payload and fingerprint disagree")
    assert(readsOk.get() > 0, "the readers must have actually read")

    // convergence: one quiet publish, then one more — everything below
    // the final pointer's number except the retained previous version
    // must be swept (orphans included), and the live version is intact
    FileStats.publishManifest(spark, dir, "fp-final-1") { dest =>
      Seq(("final-1", 1L)).toDF("payload", "n_rows")
        .coalesce(1).write.mode("overwrite").parquet(dest)
    }
    FileStats.publishManifest(spark, dir, "fp-final-2") { dest =>
      Seq(("final-2", 2L)).toDF("payload", "n_rows")
        .coalesce(1).write.mode("overwrite").parquet(dest)
    }
    val live = FileStats.resolveManifest(spark, dir)
    assert(spark.read.parquet(live).select("payload").head.getString(0)
      == "final-2")
    assert(FileStats.recordedTreeFp(spark, live).contains("fp-final-2"))
    def numOf(n: String): Long =
      n.stripPrefix(".stage_").stripPrefix("m").takeWhile(_.isDigit) match {
        case "" => Long.MinValue
        case d => d.toLong
      }
    val liveNum = numOf(new java.io.File(live).getName)
    // pointer tmps sit under a 60s sweep grace (a racer must never kill
    // a live publisher's commit) — they are pointer-sized debris, not
    // version state, so convergence is judged on versions/stages only
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("_mp")).filterNot(_.startsWith("._mp"))
      .filter(n => numOf(n) < liveNum - 1)
    assert(leftovers.isEmpty,
      s"GC must converge: stale artifacts survive: ${leftovers.mkString(",")}")
    // ADVICE r20: the old `racedRetries >= 0` assert was vacuous. The
    // enforceable signal is monotonic pointer progress: each publisher's
    // cycle i re-reads the pointer after its own cycle i-1 flip, so the
    // surviving live version number must be at least one publisher's
    // full cycle count regardless of interleaving. racedRetries stays
    // informational (retention bounds it, and a lucky schedule can
    // legitimately land zero torn-window retries) but is surfaced here.
    assert(liveNum >= cycles,
      s"pointer did not make monotonic progress: live version m$liveNum " +
        s"after $publishers publishers x $cycles cycles " +
        s"(raced=${racedRetries.get()})")
  }
}
