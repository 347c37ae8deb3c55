package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — the O(log n)-round algorithm for graphs whose DIAMETER
  * makes per-hop label propagation too slow.
  *
  * The repo already carries two CC paths in `DedupQueries.clustersOf`:
  * a driver union-find for dup-pair graphs that fit one collect (the
  * common case — LSH survivors are corpus-tiny), and a distributed
  * min-label-propagation loop whose round count is the component
  * diameter. Propagation is the right shape for the short, dense
  * near-dup clusters LSH emits, but a 100 TB corpus can produce
  * CHAINED components (A~B~C~… via pairwise overlaps) whose diameter
  * grows with corpus size — there each propagation round is a full
  * edge-join pass and the loop runs diameter-many times. Star
  * contraction replaces the per-hop walk with per-round tree
  * flattening: both operations hang every node off the minimum of a
  * neighborhood, so tree height shrinks geometrically and the round
  * count is O(log n) REGARDLESS of diameter (measured: a 4,096-hop
  * chain resolves in a handful of rounds where propagation needs
  * thousands — SCALE.md §big-star).
  *
  * Per round: two aggregate+join passes over the edge set, each
  * shuffling on a node column — no broadcast of anything node-sized,
  * no driver state beyond the convergence checksum. Each round's edge
  * set is materialized via an eager `localCheckpoint` — a plain
  * persist is NOT enough here because every round references the
  * previous frame three times (symmetric view + min join), so the
  * logical plan would grow exponentially with round count and OOM the
  * driver during analysis; the checkpoint truncates lineage so plan
  * size stays constant per round. (On a real cluster with executor
  * churn, swap in reliable `checkpoint` against the cluster
  * checkpoint dir — same shape, durable blocks.) Freed storage is
  * reclaimed by the ContextCleaner as rounds drop their references.
  *
  * Operations, with edges kept oriented child > parent:
  *  - large-star(u): m = min(u ∪ Γ(u)); emit (v, m) for v ∈ Γ(u), v > u.
  *    Every strictly-larger neighbor re-hangs off u's local minimum.
  *  - small-star(u): over the parent set Γ≤(u) (all smaller neighbors
  *    in this orientation): m = min; emit (v, m) for each parent v
  *    plus (u, m). Parent lists collapse onto the smallest parent.
  *
  * At the fixpoint every edge is (node, component-min-root): a star
  * forest. Labels follow directly; roots label themselves — the same
  * output contract as `clustersOf`, pinned by an equality spec
  * (BigStarSpec) and the shared DuckDB recursive-CTE oracle (gate
  * `d_cc_bigstar`).
  */
object BigStar {

  /** Component labels `(doc_id, cluster)` for every node of the
    * undirected pair graph `(da, db)`; cluster = min node id reachable.
    * Self-loops are ignored. `maxRounds` is a divergence guard only —
    * the algorithm provably converges in O(log n) rounds.
    */
  def clusters(pairsIn: DataFrame, maxRounds: Int = 64): DataFrame =
    fixpoint(pairsIn, maxRounds)._1

  /** Rounds taken to converge — measurement hook for the SCALE.md
    * diameter-vs-rounds comparison. */
  def roundsToConverge(pairsIn: DataFrame, maxRounds: Int = 64): Int =
    fixpoint(pairsIn, maxRounds)._2

  /** Runs the alternation to its fixpoint; returns (labels, rounds).
    * The labels frame is handed back persisted-free (it is a cheap
    * projection over the final checkpointed star forest).
    *
    * Checkpoint-storage lifecycle: localCheckpoint persists each
    * round's RDD, and the ContextCleaner only frees those blocks
    * after driver GC notices the dropped references — across a long
    * query suite that lag accumulates O(rounds) edge-set copies (the
    * old propagation path released its caches through the
    * SeqIds.pin/releaseAll contract; checkpoints are not caches and
    * have no such hook). So intermediate rounds' checkpointed RDDs
    * are unpersisted EXPLICITLY on exit, identified as the
    * this-invocation additions to `getPersistentRDDs` minus the
    * newest (the final edge set the returned labels read). Safe under
    * the localCheckpoint contract (truncated lineage is already
    * non-recomputable); assumes no CONCURRENT persists in the same
    * session, which holds for the sequential Bench/Verify/spec
    * drivers. */
  private def fixpoint(pairsIn: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    val sc = pairsIn.sparkSession.sparkContext
    val persistedBefore = sc.getPersistentRDDs.keySet
    // canonical child>parent orientation; one row per undirected edge
    // checkpoints are LAZY: the checksum aggregate below is the action
    // that materializes each round's edge set into checkpoint storage,
    // so a round costs ONE job, not a materialize-then-checksum pair
    var edges = pairsIn
      .filter(col("da") =!= col("db"))
      .select(greatest(col("da"), col("db")).as("c"),
              least(col("da"), col("db")).as("p"))
      .distinct()
      .localCheckpoint(false)
    // convergence = edge set unchanged. (count, order-independent hash
    // XOR) is an exact-enough checksum computed in the same action that
    // materializes each round's persist (bit_xor cannot overflow under
    // ANSI, unlike a hash SUM); the fixpoint is absorbing, so the only
    // failure mode would be a 64-bit xor collision on two CONSECUTIVE
    // distinct edge sets — negligible, and the output is additionally
    // pinned by the equality spec + hash-green gate.
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(c, p))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = checksum(edges)
    var rounds = 0
    var converged = false
    try {
    while (!converged && rounds < maxRounds) {
      // large-star over the symmetric view: per node u, m = min(u, min
      // neighbor); strictly larger neighbors re-hang onto m
      val sym = edges.select(col("c").as("u"), col("p").as("v"))
        .union(edges.select(col("p").as("u"), col("c").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mnv"))
        .select(col("u"), least(col("u"), col("mnv")).as("m"))
      val afterLarge = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("c"), col("m").as("p"))
        .filter(col("c") =!= col("p"))
        .distinct()
      // small-star on the oriented set: per child, collapse its parent
      // list onto the smallest parent (which becomes the others' parent)
      val pmins = afterLarge.groupBy("c").agg(min(col("p")).as("m"))
      val afterSmall = afterLarge.join(pmins, "c")
        .select(col("p").as("c"), col("m").as("p"))
        .union(pmins.select(col("c"), col("m").as("p")))
        .filter(col("c") =!= col("p"))
        .distinct()
        .localCheckpoint(false) // truncates lineage; checksum materializes
      val nextSig = checksum(afterSmall)
      edges = afterSmall
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
    }
    require(converged, s"big-star CC did not converge in $maxRounds rounds")
    } catch { case t: Throwable =>
      // failure path (non-convergence, or a killed job): nothing we
      // return references the rounds' checkpoints — free them ALL now
      // instead of leaking N+1 full edge-set copies for the session
      (sc.getPersistentRDDs.keySet -- persistedBefore).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      throw t
    }
    // free the intermediate rounds' checkpoint blocks now (see scaladoc).
    // The newest persistent RDD is the final edge set the returned labels
    // read — it must outlive downstream consumption, so it is registered
    // with the SeqIds release registry instead of leaked: Bench/Verify
    // (and any caller following the same per-query contract) call
    // SeqIds.releaseAll() after their action, which frees it
    // deterministically rather than waiting on driver GC + the
    // ContextCleaner across many CC invocations in one session. A
    // post-release re-execution of the labels frame fails loudly
    // (localCheckpoint lineage is truncated, so lost blocks are not
    // recomputable) — the same invalidate-on-release contract as
    // withSeqId's pinned frames.
    val added = sc.getPersistentRDDs.keySet -- persistedBefore
    if (added.nonEmpty) {
      val keep = added.max
      added.filter(_ != keep).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      // weak reference: the hook must enable deterministic release for
      // releaseAll-disciplined callers (Bench/Verify) WITHOUT turning
      // the old eventually-GC'd reference into a permanent pin for
      // callers that never release (CcBench/CcFuzz measure many CC runs
      // in one process and rely on the ContextCleaner path)
      sc.getPersistentRDDs.get(keep).foreach { rdd =>
        val weak = new java.lang.ref.WeakReference(rdd)
        SeqIds.onRelease(() =>
          Option(weak.get()).foreach(_.unpersist(blocking = false)))
      }
    }
    // star forest → labels; roots (every parent) label themselves
    val labels = edges.select(col("c").as("doc_id"), col("p").as("cluster"))
      .union(edges.select(col("p").as("doc_id"), col("p").as("cluster")))
      .distinct()
    (labels, rounds)
  }
}
