package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.BigStar

/** Connected-components scale measurement (SCALE.md §big-star): on a
  * D-hop chain — the adversarial high-diameter component — min-label
  * propagation needs exactly D rounds while the big-star alternation
  * needs O(log D). Each round is a full edge join + aggregate, so at
  * corpus scale the round count IS the cost model; this main pins both
  * counts and wall times on the same box.
  *
  * The propagation loop measured here is the lineage-truncated twin of
  * the path `clustersOf` carried before big-star replaced it. The
  * as-shipped version (per-round persist, no checkpoint) cannot even be
  * measured at this diameter: its logical plan grows multiplicatively
  * per round and the driver OOMs building plan strings near round
  * ~1,000 on a 4.6 GB heap — that observation, reproduced twice, is
  * what motivated the replacement.
  *
  * Usage: graft.CcBench [maxChain=4096] [bulkEdges=4194304] — prints
  * one JSON line.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val maxChain = args.headOption.map(_.toInt).getOrElse(4096)
    val bulkEdges = args.lift(1).map(_.toInt).getOrElse(1 << 22)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def chain(n: Int) =
      (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("da", "db")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    /** Min-label propagation, lineage-truncated per round; returns the
      * round count (== component diameter on a chain). */
    def propagate(pairs: DataFrame): Int = {
      val edges = pairs.select(col("da"), col("db"))
        .union(pairs.select(col("db").as("da"), col("da").as("db")))
        .persist()
      var labels = edges.select(col("da").as("node")).distinct()
        .withColumn("cluster", col("node")).localCheckpoint(true)
      var rounds = 0
      var changed = 1L
      while (changed > 0) {
        val prop = edges.join(labels, edges("db") === labels("node"))
          .groupBy(edges("da").as("node2")).agg(min("cluster").as("nb"))
        val next = labels.join(prop, labels("node") === prop("node2"), "left")
          .select(col("node"),
            least(col("cluster"), coalesce(col("nb"), col("cluster"))).as("cluster"),
            (col("nb").isNotNull && col("nb") < col("cluster")).as("chg"))
          .localCheckpoint(true)
        changed = Option(next.agg(sum(col("chg").cast("long"))).collect()(0).get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        labels = next.drop("chg")
        rounds += 1
      }
      edges.unpersist(blocking = false)
      rounds
    }

    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var n = 256
    while (n <= maxChain) {
      val (starRounds, starSec) = time(BigStar.roundsToConverge(chain(n)))
      graft.operators.SeqIds.releaseAll()
      // propagation rounds = diameter; run it only while affordable
      // (the point of the comparison is that it STOPS being affordable)
      val (propRounds, propSec) =
        if (n <= 1024) { val (r, s) = time(propagate(chain(n))); (s"$r", f"$s%.1f") }
        else ("null", "null")
      parts += s""""chain_$n":{"diameter":${n - 1},"star_rounds":$starRounds,""" +
        f""""star_sec":$starSec%.1f,"prop_rounds":$propRounds,"prop_sec":$propSec}"""
      n *= 4
    }

    // hub: one center, 2^20 spokes — the hot-KEY shape (the center's
    // neighborhood min is a single groupBy key holding a million rows;
    // partial aggregation must absorb it map-side)
    val nSpokes = 1 << 20
    val hub = spark.range(1, nSpokes + 1)
      .select(lit(0L).as("da"), col("id").as("db"))
    val (hubRounds, hubSec) = time(BigStar.roundsToConverge(hub))
    graft.operators.SeqIds.releaseAll()
    parts += f""""hub_${nSpokes}":{"star_rounds":$hubRounds,"star_sec":$hubSec%.1f}"""

    // bulk: random edges over edges/2 nodes (supercritical — one giant
    // low-diameter component plus fringe): absolute throughput with
    // corpus-shaped data volumes per round, not adversarial topology.
    // Two decades (default 2^22 and 2^24 edges) pin the edges/sec/round
    // slope; the larger point aborts cleanly if the box lacks headroom
    // and records the failure instead of dying.
    for (nEdges <- Seq(bulkEdges.toLong, bulkEdges.toLong * 4)) {
      val nNodes = nEdges / 2
      val bulk = spark.range(nEdges).select(
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("da"),
        pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("db"))
      try {
        val (bulkRounds, bulkSec) = time(BigStar.roundsToConverge(bulk))
        graft.operators.SeqIds.releaseAll()
        parts += f""""bulk_${nEdges}e":{"nodes":$nNodes,"star_rounds":$bulkRounds,"star_sec":$bulkSec%.1f}"""
      } catch {
        case e: Throwable =>
          parts += s""""bulk_${nEdges}e":{"error":"${e.getClass.getSimpleName}"}"""
      }
    }

    // power-law mix: a 2^16-hop chain (high diameter) with 2^20 spokes
    // spread over 64 hub nodes ON the chain (hot keys) — the two
    // adversarial shapes at once, the closest synthetic to a real
    // near-dup graph's degree distribution (few huge boilerplate
    // clusters + long pairwise-overlap chains). Rounds must stay
    // logarithmic in the chain length, unmoved by the hubs.
    val plChain = 1 << 16
    val plSpokes = 1 << 20
    val powerlaw = chain(plChain).union(
      spark.range(plSpokes.toLong).select(
        (col("id") % 64 * 1000L).as("da"),
        (col("id") + plChain + 1L).as("db")))
    try {
      val (plRounds, plSec) = time(BigStar.roundsToConverge(powerlaw))
      graft.operators.SeqIds.releaseAll()
      parts += f""""powerlaw_${plChain}c_${plSpokes}s":{"diameter_floor":${plChain - 1},"star_rounds":$plRounds,"star_sec":$plSec%.1f}"""
    } catch {
      case e: Throwable =>
        parts += s""""powerlaw_${plChain}c_${plSpokes}s":{"error":"${e.getClass.getSimpleName}"}"""
    }

    println(parts.mkString("""{"metric":"cc_bigstar","cpus":""" + cpus + ",", ",", "}"))
    spark.stop()
  }
}
