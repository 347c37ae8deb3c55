package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-clock attribution for ONE gate (r21 optimization round,
  * guide §1: measure first). Runs the named query exactly as the bench
  * does (same session config, same noop sink, optional sf0.001 codegen
  * warm pass) and prints every Spark job's duration + call site +
  * description, so a gate's seconds can be attributed to the specific
  * action (touched-collect, manifest read, bucket write, publish, ...)
  * that spends them. Dev tool — not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_ONLY=st_bm25_ingest sbt "runMain graft.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      sys.error("set SPARK_GRAFT_ONLY=<gate name>"))
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = SparkEntry.queries(name)

    case class Job(id: Int, desc: String, site: String, var ms: Long = -1,
                   start: Long = System.nanoTime()) {
      var endNs: Long = -1
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    // SQL-execution descriptions (the physical plan's one-line desc),
    // so each job can be attributed to the operation that ran it
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId,
              s.description.linesIterator.nextOption().getOrElse("").take(120))
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val eid = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        val desc = eid.flatMap(i => Option(execDesc.get(i.toLong)))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))))
          .getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.put(js.jobId, Job(js.jobId, desc, site))
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) { j.endNs = System.nanoTime()
          j.ms = (j.endNs - j.start) / 1000000L }
      }
    })

    // steady-state: warm codegen/fixtures exactly as the bench does
    val warmSf = "/root/testdata/sf0.001"
    if (new java.io.File(warmSf).isDirectory && warmSf != sfDir) {
      try fn(spark, warmSf).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"warm-up failed: ${e.getMessage}") }
      finally graft.operators.SeqIds.releaseAll()
    }
    graft.queries.Fixtures.prebuilders.toSeq.sortBy(_._1).foreach {
      case (_, (users, build)) if users.contains(name) =>
        try build(spark, sfDir)
        catch { case scala.util.control.NonFatal(_) => () }
      case _ => ()
    }

    var pass = 0
    while (pass < passes) {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val tEnd = System.nanoTime()
      val sec = (tEnd - t0) / 1e9
      graft.operators.SeqIds.releaseAll()
      Thread.sleep(300) // let listener events drain
      println(f"== pass $pass: $name = $sec%.3f s, ${order.size()} jobs ==")
      val it = order.iterator()
      var accounted = 0L
      while (it.hasNext) {
        val j = jobs.get(it.next())
        if (j != null) {
          accounted += math.max(0L, j.ms)
          println(f"  job ${j.id}%3d ${j.ms}%6d ms  ${j.site.take(28)}%-28s ${j.desc.take(110)}")
        }
      }
      println(f"  (sum of job wall times: ${accounted / 1000.0}%.3f s; " +
        "gaps = driver-side planning/FS work)")
      // DRIVER-GAP attribution: wall intervals where NO job was running,
      // labelled by the job that follows the gap (its planning/metadata
      // preamble is usually what filled it)
      val ivs = {
        val it2 = order.iterator()
        val b = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
        while (it2.hasNext) {
          val j = jobs.get(it2.next())
          if (j != null && j.endNs > 0)
            b += ((j.start, j.endNs, s"job ${j.id} ${j.site.take(50)}"))
        }
        b.sortBy(_._1)
      }
      var cursor = t0
      val gaps = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      ivs.foreach { case (s0, e0, lbl) =>
        if (s0 > cursor) gaps += ((s0 - cursor, s"before $lbl"))
        cursor = math.max(cursor, e0)
      }
      if (tEnd > cursor) gaps += ((tEnd - cursor, "after last job"))
      println(f"  driver-idle total: ${gaps.map(_._1).sum / 1e9}%.3f s; top gaps:")
      gaps.sortBy(-_._1).take(12).foreach { case (ns, lbl) =>
        println(f"    ${ns / 1e6}%8.0f ms  $lbl") }
      pass += 1
    }
    spark.stop()
  }
}
