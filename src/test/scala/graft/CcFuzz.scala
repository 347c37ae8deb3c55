package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope, like PlanDump): randomized equivalence sweep
  * for the big-star connected components — N seeded random graphs of
  * varying density, each checked label-for-label against an in-process
  * union-find. Complements BigStarSpec's fixed cases with bulk
  * randomized evidence; run before touching BigStar.
  * Usage: sbt "Test/runMain graft.CcFuzz [nGraphs=50]"
  */
object CcFuzz {
  def main(args: Array[String]): Unit = {
    val nGraphs = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    var failures = 0
    for (g <- 0 until nGraphs) {
      val rnd = new scala.util.Random(1000 + g)
      val nNodes = 20 + rnd.nextInt(200)
      val nEdges = rnd.nextInt(3 * nNodes)
      val pairs = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        val got = graft.operators.BigStar.clusters(pairs.toDF("da", "db"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // release the run's pinned final checkpoint (consumer contract)
        graft.operators.SeqIds.releaseAll()
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r); r
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
          .map(n => n -> find(n)).toMap
        if (got != want) {
          failures += 1
          System.err.println(s"graph $g DIVERGED (n=$nNodes, e=${pairs.size})")
        }
      }
      if ((g + 1) % 10 == 0) println(s"${g + 1}/$nGraphs checked, $failures failures")
    }
    println(s"""{"metric":"cc_fuzz","graphs":$nGraphs,"failures":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
