package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared per-JVM lifecycle fixtures for the gate suite (VERDICT r15
  * #6): several gates exercise DIFFERENT verbs (append / delete /
  * retrain / query) over the SAME built index, and each used to pay
  * the identical build again — 3× the same BM25 tokenize+shuffle+write
  * per Verify/Bench run. The build now runs ONCE per (kind, sfDir) per
  * JVM; gates that only read consume it directly, and gates that
  * MUTATE start from a [[fork]] — a metadata-only copy whose manifests
  * keep referencing the fixture's immutable data files (BucketedUpsert
  * manifests carry absolute paths, and the fixture is never written
  * again), so forking costs directory walks of KB-scale metadata, not
  * a data copy. Coverage is unchanged: every verb still executes and
  * every gate keeps its own oracle; only the REDUNDANT re-builds are
  * gone.
  */
object Fixtures {

  private val lock = new Object
  private val built = scala.collection.mutable.Map[(String, String), String]()

  /** The shared build for `kind` at `sfDir`, building on first use. */
  def shared(kind: String, sfDir: String)(build: String => Unit): String =
    lock.synchronized {
      built.getOrElseUpdate((kind, sfDir), {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-fx-$kind").toString + "/idx"
        build(dir)
        dir
      })
    }

  /** Metadata-only fork: copy the index root EXCLUDING any directory
    * literally named `data` (the bucketed tables' payload). The forked
    * manifests still reference the fixture's absolute data paths —
    * valid forever because the fixture is immutable — and the fork's
    * own writes land under its own root, GC'd against its own
    * manifests only. */
  def fork(src: String): String = {
    val dstRoot = java.nio.file.Files
      .createTempDirectory("graft-fx-fork").toString + "/idx"
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dstRoot)
    val stream = java.nio.file.Files.walk(s)
    try {
      stream.forEach { p =>
        val rel = s.relativize(p)
        val skip = (0 until rel.getNameCount)
          .exists(i => rel.getName(i).toString == "data")
        if (!skip && rel.toString.nonEmpty) {
          val t = d.resolve(rel.toString)
          if (java.nio.file.Files.isDirectory(p))
            java.nio.file.Files.createDirectories(t)
          else {
            java.nio.file.Files.createDirectories(t.getParent)
            java.nio.file.Files.copy(p, t)
          }
        }
      }
    } finally stream.close()
    dstRoot
  }

  /** Bench/Verify pre-pass registry: fixture kind → (gate names that
    * consume it, builder). [[graft.Bench]] builds each kind a selected
    * query consumes OUTSIDE every timed window and reports the cost as
    * its own `fixture_build_s` field — otherwise the one-per-JVM build
    * lands in whichever consuming gate runs first alphabetically and
    * reads as a regression of unchanged operator code (the r16
    * artifact charged the bm25 build to `t_bm25_delete`). Keep in sync
    * when adding a fixture consumer. */
  val prebuilders: Map[String, (Set[String], (SparkSession, String) => String)] =
    Map(
      "zevents" -> ((Set("s20_delete_where", "s29_delete_vectors",
        "s33_read_where_mor", "s36_range_route", "s38_value_route"),
        zEvents _)),
      "revents" -> ((Set("s32_read_where", "s36_range_route",
        "s37_or_route", "s39_dsv2_route", "s40_agg_push"), revents _)),
      "borders" -> ((Set("s39_dsv2_route"), bucketedOrders _)),
      "catroot" -> ((Set("s40_agg_push", "s41_dsv2_cluster",
        "s42_catalog_tt", "s43_dsv2_dv", "s44_sql_resolved"),
        catalogRoot _)),
      "bm25" -> ((Set("t_bm25_indexed", "t_bm25_delete"), bm25 _)),
      "ivf" -> ((Set("ann_ivf_persist", "ann_ivf_retrain",
        "ann_ivf_delete"), ivf _)))

  /** Z-ordered events tree with a zone-map stats manifest — the shared
    * READ-ONLY base of the delete gates: deleteRange/deleteVectors
    * never write into their source tree (new versions land in each
    * gate's own out-dir), so the build runs once. Returns the dir
    * holding `data/` and `stats/`. */
  def zEvents(s: SparkSession, d: String): String =
    shared("zevents", d) { root =>
      val ev = graft.Tables.t(s, d, "events")
        .withColumn("bucket", expr("ts div 3600000000000"))
      graft.lake.ZOrder.writeZOrdered(ev, s"$root/data", 16, "user_id", "bucket")
      graft.lake.FileStats.writeStats(s, s"$root/data", s"$root/stats",
        Seq("user_id"))
    }

  /** Z-ordered events tree in the [[graft.lake.Routing]] layout
    * (`data/` + `ix/stats` + `ix/bloom/event_id`) — the shared
    * READ-ONLY base of the routed-read gates (readWhere never writes
    * into its tree). */
  def revents(s: SparkSession, d: String): String =
    shared("revents", d) { root =>
      val ev = graft.Tables.t(s, d, "events")
        .select("event_id", "user_id", "event_type", "value")
      graft.lake.ZOrder.writeZOrdered(ev, s"$root/data", 16,
        "user_id", "event_id")
      // overlapped builds (r22): same manifests as indexStats then
      // indexBloom, submitted concurrently
      graft.lake.Routing.buildIndexes(s, root, Seq("user_id"),
        Seq("event_id"))
    }

  /** Bucketed `orders` table (key = o_orderkey, 16 buckets) — the
    * shared READ-ONLY base of the DSv2 bucketed-arm gates
    * (ADVICE r19: s39 used to build this inside its timed lambda,
    * charging fixture construction to the query and leaking a temp
    * dir per run). */
  def bucketedOrders(s: SparkSession, d: String): String =
    shared("borders", d) { root =>
      graft.lake.BucketedUpsert.applyBatch(
        graft.Tables.t(s, d, "orders").select(col("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), lit(1L).as("ver")),
        root, "o_orderkey", "ver", nBuckets = 16, tag = 1)
    }

  /** A GraftCatalog base directory holding the catalog gates' tables:
    *  - `db/orders_b` — bucketed orders (key o_orderkey) with a
    *    BucketStats index on o_custkey (the s40 bucketed-agg leg);
    *  - `db/cust_snap` — two published customer snapshot versions
    *    (keep=3 so both stay travelable);
    *  - `db/ev_dv` — a deletion-vector version of a z-ordered events
    *    tree (user_id ∈ [100,120] masked) with a per-version Bloom on
    *    event_id;
    *  - `frag_t` — a FRAGMENTED bucketed orders table (base + overlay
    *    fragments, versionCol recorded) for the resolved-view gate.
    * READ-ONLY: the catalog is read-facing by design. */
  def catalogRoot(s: SparkSession, d: String): String =
    shared("catroot", d) { root =>
      val orders = graft.Tables.t(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), lit(1L).as("ver"))
      graft.lake.BucketedUpsert.applyBatch(orders,
        s"$root/db/orders_b", "o_orderkey", "ver", nBuckets = 16, tag = 1)
      graft.lake.Routing.indexBucketStats(s, s"$root/db/orders_b",
        "o_orderkey", Seq("o_custkey"))
      val cust = graft.Tables.t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      graft.lake.Snapshot.publish(cust, s"$root/db/cust_snap", 1, keep = 3)
      graft.lake.Snapshot.publish(
        cust.withColumn("c_acctbal", col("c_acctbal") + 100),
        s"$root/db/cust_snap", 2, keep = 3)
      // DV version: source tree + stats live beside the catalog tables
      // (the version references the source files verbatim — both are
      // immutable fixture state)
      val ev = graft.Tables.t(s, d, "events")
        .select("event_id", "user_id", "event_type", "value")
      graft.lake.ZOrder.writeZOrdered(ev, s"$root/srcev/data", 16,
        "user_id", "event_id")
      graft.lake.FileStats.writeStats(s, s"$root/srcev/data",
        s"$root/srcev/stats", Seq("user_id"))
      graft.lake.DeleteWhere.deleteVectors(s, s"$root/srcev/stats",
        "user_id", lit(100L), lit(120L), s"$root/db/ev_dv")
      graft.lake.DeleteWhere.indexBloom(s, s"$root/db/ev_dv", "event_id")
      // fragmented table: base fragment + an overlay rewriting every
      // 10th key (higher ver wins at resolution)
      graft.lake.BucketedUpsert.appendFragment(orders, s"$root/frag_t",
        "o_orderkey", nBuckets = 16, tag = 1, versionCol = "ver")
      graft.lake.BucketedUpsert.appendFragment(
        orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1000000L)
          .withColumn("ver", lit(2L)),
        s"$root/frag_t", "o_orderkey", nBuckets = 16, tag = 2,
        versionCol = "ver")
    }

  /** BM25 index over `documents`, built from the base slice and
    * appended with the rest — exactly the t_bm25_indexed lifecycle,
    * final state = the full-corpus index (the index is
    * batch-split-invariant). */
  def bm25(s: SparkSession, d: String): String =
    shared("bm25", d) { root =>
      val docs = graft.Tables.t(s, d, "documents").select("doc_id", "text")
      graft.ext.Bm25Index.build(s, root,
        docs.filter(col("doc_id") % 10 =!= 0), nBuckets = 16, tag = 1)
      graft.ext.Bm25Index.append(s, root,
        docs.filter(col("doc_id") % 10 === 0), tag = 2)
    }

  /** IVF index over `embeddings`: build from the %5!=0 slice (the
    * quantizer seeds from it), append the rest — exactly the
    * ann_ivf_persist lifecycle. */
  def ivf(s: SparkSession, d: String): String =
    shared("ivf", d) { root =>
      val emb = graft.Tables.t(s, d, "embeddings")
      graft.ext.Ivf.buildIndex(s, root,
        emb.filter(col("vec_id") % 5 =!= 0), k = 8, nBuckets = 16, tag = 1)
      graft.ext.Ivf.appendToIndex(s, root,
        emb.filter(col("vec_id") % 5 === 0), tag = 2)
    }
}
