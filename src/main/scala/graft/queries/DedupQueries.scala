package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** LLM-training-pipeline deduplication over `documents` (builder brief:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine).
  *
  * Scale design (the point of each shape):
  *  - exact: hash-groupBy — one shuffle on the content hash, no pairs.
  *  - n-gram Jaccard: candidate pairs ONLY via a shingle equi-join
  *    (never all-pairs); integer-arithmetic threshold so the oracle
  *    matches exactly. Stop-shingles (document frequency > MaxBucket)
  *    are dropped before the join, bounding bucket fan-out at 100 TB.
  *  - MinHash LSH: 8 md5-derived min-hashes → 4 bands of 2 → bucket
  *    equi-join, buckets capped at MaxBucket. Deterministic
  *    (content-keyed, no RNG state), so it is reproducible across
  *    engines and cluster sizes, unlike seeded-RNG LSH models.
  *  - SimHash: 64-bit signature, 2×32-bit band buckets capped at
  *    MaxBucket (kernel fully replicated in the DuckDB oracle).
  *  - embedding cosine: blocked by REAL IVF coarse-quantizer cells —
  *    pairs only within a cell, never across the full table.
  *  - bucket → pairs uses the native graft_pairs GENERATOR
  *    (plans.OrderedPairsGen): streams (da, db) rows without
  *    materializing the C(n,2) pair array the former UDF built.
  */
object DedupQueries extends QueryPack {

  /** Stop-shingle / LSH-bucket document-frequency cap. A bucket (shingle
    * or band value) shared by more than this many documents is dropped
    * before pair explosion, bounding per-bucket fan-out to
    * O(MaxBucket²) regardless of corpus size — the difference between a
    * bounded join and an executor-OOM key at 100 TB. The cap is mirrored
    * in the DuckDB oracle SQL, so the capped semantics are themselves
    * hash-checked (at the test scale factors the max observed bucket is
    * 25, so the cap drops nothing there; DedupCapSpec exercises the
    * dropping path on a skewed corpus).
    */
  val MaxBucket = 32

  /** Target vectors per IVF cell for embedding near-dup blocking. The
    * cell count is k = max(1, min(ceil(n/EmbedCellTarget), ceil(√n))):
    * the n/256 term keeps within-cell pair generation O(256²) per cell
    * on small/medium corpora, and the √n bound keeps the ASSIGNMENT
    * stage (cost n·k) and the centroid literal (k·dim floats on the
    * driver) from themselves going quadratic/unbounded as n grows —
    * total cost n·k + n²/k is minimized at k ≈ √n, the standard IVF
    * scaling law. At 10⁹ vectors that is ~32k centroids (~16 MB at
    * dim=128), not the 4M a pure n/256 rule would demand.
    */
  val EmbedCellTarget = 256L

  /** Per-cell member cap for embedding near-dup pair generation — the
    * IVF analogue of [[MaxBucket]]. The √n cell law bounds the AVERAGE
    * cell at ~√n members, but nothing stops a pathological cluster
    * (e.g. a mass-duplicated embedding) from pulling the whole corpus
    * into one cell, where the self-join degenerates to C(n,2). Cells
    * with more than 4×[[EmbedCellTarget]] members produce NO pairs —
    * same recall trade as MaxBucket (a cluster that hot is its own
    * signal; near-dup pairs inside it are redundant), same oracle
    * replication, pinned by IvfSkewSpec.
    */
  val EmbedMaxCell = 4L * EmbedCellTarget

  /** k for [[EmbedCellTarget]]-based blocking over an n-vector corpus. */
  def embedCellCount(n: Long): Int =
    math.max(1L, math.min((n + EmbedCellTarget - 1) / EmbedCellTarget,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** Distinct word 3-gram shingles per doc; empty for <3 tokens.
    * A compiled kernel (now the native ShinglesF expression — formerly
    * a UDF) rather than transform/element_at: Catalyst inlines the
    * `split(text)` subexpression into every lambda reference, so the
    * declarative form re-tokenizes the document O(shingles) times — the
    * kernel tokenizes once, and the expression stays inside whole-stage
    * codegen with no Row↔Scala bridge. Output matches
    * `array_distinct(transform(...concat_ws(' ', t[i..i+2])...))`.
    */
  private def shingled(df: DataFrame): DataFrame =
    df.withColumn("shingles", graft.functions.TextFunctions.shingles(col("text")))

  private val shingleCtes =
    """sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
         i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
              string_split(text,' ')[i+2])) AS shingles
       FROM documents),
       ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       cnt AS (SELECT doc_id, len(shingles) AS n FROM sh)"""

  /** MinHash-LSH candidate pairs (da < db, distinct), shared by
    * d_minhash_lsh and d_dup_clusters: md5 min-hash signature as one
    * compiled map pass, 4 bands of 2, band-bucket groupBy capped at
    * MaxBucket.
    */
  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashPairsFrom(shingledDocs(s, d))

  /** The corpus' (doc_id, shingles) frame behind every minhash
    * consumer. The emptiness filter is deliberately the CHEAP
    * equivalent (shingles empty ⇔ under 3 tokens, and null text splits
    * to null → size -1): a filter on size(shingles) itself gets pushed
    * below the projection with graft_shingles re-inlined into the
    * predicate, so every document would be shingled twice.
    */
  private def shingledDocs(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    shingled(t(s, d, "documents").filter(size(split(col("text"), " ")) >= 3))
      .select(col("doc_id"), col("shingles"))
  }

  /** Pair generation from an existing shingle frame — callers that
    * consume the shingles AGAIN (d_lsh_jaccard_verify) pass their
    * pinned frame so the signature pass reads the cache instead of
    * re-shingling the corpus.
    */
  private def minhashPairsFrom(sh: DataFrame): DataFrame =
    bandedSignatures(sh).groupBy("band", "k")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= MaxBucket)
      .select(expr("graft_pairs(docs)"))
      .distinct()

  /** The LSH band index rows `(doc_id, band, k)` for a shingle frame:
    * 8 md5 min-hashes as one compiled map pass, 4 bands of 2. This IS
    * the standing band-index table an incremental pipeline persists
    * (bucketed by (band, k)); [[minhashPairsFrom]] is its one-shot
    * batch consumer, d_incr_pairs its incremental probe.
    */
  private def bandedSignatures(sh: DataFrame): DataFrame = {
    val sigArr = sh.select(col("doc_id"),
      graft.functions.TextFunctions.minhashSig(col("shingles"), 8).as("sig"))
    val sig = sigArr.select(
      col("doc_id") +: (0 until 8).map(j => col("sig")(j).as(s"s$j")): _*)
    sig.select(col("doc_id"), explode(array(
      (0 until 4).map(b =>
        struct(lit(b).as("band"), concat(col(s"s${2 * b}"), col(s"s${2 * b + 1}")).as("k"))): _*
    )).as("bk")).select(col("doc_id"), col("bk.band"), col("bk.k"))
  }

  /** Connected components over an undirected pair graph `(da, db)`:
    * every node labeled with the min doc_id reachable in its component.
    *
    * Hybrid by pair count — the standard engineering shape for this
    * operator. The DUP-PAIR graph is orders of magnitude smaller than
    * the corpus (it is the LSH survivors, already bucket-capped), so
    * below `driverMax` pairs a driver-side union-find (path compression
    * + min-root union) resolves components in one collect — no
    * iteration, no per-round plan compile. Above the threshold the
    * big-star alternation ([[graft.operators.BigStar]]) takes over:
    * O(log n) rounds regardless of component diameter. (The previous
    * distributed path here was min-label propagation, whose round count
    * is the component DIAMETER — CcBench measured it OOMing the driver
    * on a 1,024-hop chain from per-round plan growth alone, and a
    * lineage-truncated variant still needs diameter-many shuffle rounds.
    * SCALE.md §big-star has the numbers; BigStarSpec + CcFuzz pin label
    * equality against union-find references and the DuckDB oracle.)
    */
  def clustersOf(pairsIn: DataFrame, driverMax: Long = 1000000L): DataFrame = {
    val s = pairsIn.sparkSession
    import s.implicits._
    // self-loops carry no connectivity information and would make the
    // two paths disagree (the driver path ignores them, the propagation
    // path would emit the node) — normalize them away up front
    val pairsPlan = pairsIn.filter(col("da") =!= col("db"))
    // ONE action decides the path AND (in the common case) delivers the
    // full pair set: limit(driverMax+1) pulls partitions incrementally,
    // so small pair graphs pay a single execution of the LSH plan — no
    // separate count() job, no cache build. Only if the limit truncated
    // (> driverMax rows came back, so the driver set is incomplete)
    // does the distributed propagation path take over, persisting the
    // pair set it is about to iterate on.
    val capped = math.min(driverMax, Int.MaxValue - 2L).toInt
    val sample = pairsPlan.select("da", "db").limit(capped + 1).collect()
    if (sample.length <= capped) {
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        sample.foreach { r =>
          val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val labels = parent.keys.toSeq.map(n => (n, find(n)))
        // roots of multi-node components label themselves
        val roots = labels.map(_._2).distinct.map(r => (r, r))
        s.createDataFrame((labels ++ roots).distinct).toDF("doc_id", "cluster")
      } else {
        // the limit(capped+1) probe truncated, so the pair graph is
        // genuinely large — run the log-round distributed algorithm
        graft.operators.BigStar.clusters(pairsPlan)
      }
  }

  /** Incremental near-dup cluster maintenance: fold ONE ingest batch's
    * candidate pairs into a STANDING label table without re-running
    * connected components over the whole corpus — the daily-crawl
    * production shape at 100 TB, where the standing table is
    * corpus-sized and the day's pairs are orders of magnitude smaller.
    *
    * `standing` is a prior `clustersOf` output `(doc_id, cluster)`;
    * `batchPairs` is the day's undirected pair set `(da, db)` (batch ×
    * batch and batch × corpus edges, e.g. fresh LSH signatures probed
    * against the maintained band index). Returns the updated
    * `(doc_id, cluster)` table, EQUAL to a full recompute over
    * (standing's pair set ∪ batchPairs) — pinned by IncrClustersSpec's
    * randomized two-epoch equality sweep and the `d_incr_clusters`
    * gate's full-recompute oracle.
    *
    * Why contraction is lossless: a standing label is the MINIMUM
    * doc_id of its component, and the representative is itself a
    * member. Mapping each batch-pair endpoint to its standing
    * representative (identity for unlabeled docs) therefore preserves
    * both connectivity (every member reaches its rep) and the min
    * (the rep IS its component's min), so min-label CC over the
    * contracted graph — rep/new-doc nodes only — yields exactly the
    * merged components' global minima. Untouched clusters cannot gain
    * edges, so their labels pass through unchanged.
    *
    * Scale shape (the point of the operator): the corpus-sized
    * `standing` table is never exchanged. It is scanned exactly twice,
    * both times map-side — once semi-joined against the broadcast
    * endpoint set to extract the touched slice (pair-set-sized, pinned),
    * once left-joined against the broadcast relabel map to rewrite
    * labels. CC itself runs on the contracted graph, whose node count
    * is bounded by the batch-pair endpoints — `clustersOf` resolves it
    * on the driver below its threshold and hands off to the log-round
    * BigStar alternation above it. No corpus-sized shuffle, no
    * corpus-wide iteration, no driver structure beyond the contracted
    * union-find. (IncrClustersSpec asserts the no-exchange-over-standing
    * claim on the executed plan.)
    */
  def mergeIncremental(standing: DataFrame, batchPairs: DataFrame): DataFrame = {
    val pairs = batchPairs.filter(col("da") =!= col("db")).select("da", "db")
    val endpoints = pairs.select(col("da").as("doc_id"))
      .union(pairs.select(col("db").as("doc_id")))
      .distinct()
    // touched slice of the standing table: broadcast left-semi — ONE
    // map-side pass over the corpus-sized side. Pinned: it feeds both
    // endpoint-mapping joins plus the new-doc anti join (tiny result,
    // but each unpinned use would re-scan the standing table).
    val repOf = graft.operators.SeqIds.pin(
      standing.join(broadcast(endpoints), Seq("doc_id"), "left_semi"))
    // endpoints → standing representatives (identity when unlabeled);
    // rep-internal pairs contract to self-loops and are dropped
    val mapped = pairs
      .join(broadcast(repOf.select(col("doc_id").as("da"), col("cluster").as("ra"))),
        Seq("da"), "left")
      .join(broadcast(repOf.select(col("doc_id").as("db"), col("cluster").as("rb"))),
        Seq("db"), "left")
      .select(coalesce(col("ra"), col("da")).as("da"),
              coalesce(col("rb"), col("db")).as("db"))
      .filter(col("da") =!= col("db"))
    // CC over the contracted graph: node = standing rep or brand-new doc
    val relabel = clustersOf(mapped)
      .select(col("doc_id").as("node"), col("cluster").as("root"))
    // corpus-side remap: one broadcast map-side pass, labels of merged
    // clusters rewritten to the new global min, everything else intact
    val updated = standing.join(broadcast(relabel),
        col("cluster") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("cluster")).as("cluster"))
    // docs seen for the first time in this batch's pairs label directly
    val fresh = endpoints
      .join(repOf.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(broadcast(relabel), col("doc_id") === col("node"))
      .select(col("doc_id"), col("root").as("cluster"))
    updated.union(fresh)
  }

  val defs: Map[String, QueryFn] = Map(
    // Exact dedup: group on the content hash, keep the smallest id.
    "d_exact_dedup" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_hash")),

    // Incremental (continual-ingest) exact dedup: dedup TODAY'S BATCH
    // against the standing corpus without re-deduping the corpus — the
    // production shape for a crawl pipeline that lands data daily
    // (doc_id%7==3 stands in for the batch slice). In-batch keep-first
    // is a batch-sized groupBy-min; the corpus probe is a left-anti
    // join on content hash where the corpus side is projected to the
    // HASH ALONE before the exchange — at 100 TB the standing side
    // ships 16 bytes/doc, and in steady state it lives pre-bucketed by
    // hash (lake.Bucketing) so only the day's batch shuffles at all
    // (the j10 bloom-semi pre-probe composes here for the same
    // purpose when the index isn't bucketed).
    "d_incr_dedup" -> ((s, d) => {
      val hashed = t(s, d, "documents")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
      val batch = hashed.filter(col("doc_id") % 7 === 3)
      val corpus = hashed.filter(col("doc_id") % 7 =!= 3).select("content_hash")
      batch.groupBy("content_hash").agg(min("doc_id").as("doc_id"))
        .join(corpus, Seq("content_hash"), "left_anti")
        .select(col("doc_id"), col("content_hash"))
        .orderBy("doc_id")
    }),

    // Sub-document exact dedup at fixed 16-token-chunk grain — the
    // within/across-document boilerplate collapse doc-level d_exact
    // cannot see (the chunked analogue of paragraph dedup; the corpus
    // has no paragraph breaks, so the chunker is a fixed token window).
    // Keep-first-globally = the chunk's minimal (doc_id, chunk_idx)
    // occurrence, computed as a groupBy min(struct) — NOT a row_number
    // window: min(struct) partial-aggregates map-side, so a corpus-wide
    // boilerplate chunk (the pathological hot key) arrives at the
    // reducer as one partial per map task instead of every occurrence
    // landing in one window partition. Join back on the chunk (reuses
    // the groupBy's hash partitioning — AQE plans no extra exchange on
    // the aggregate side), then per-doc regroup reconstructs the kept
    // text in chunk order; gate compares its md5 plus kept/total counts.
    "d_chunk_dedup" -> ((s, d) => {
      // pinned: the chunk stream feeds the keep-first aggregate AND the
      // probe side of the join-back — unpinned, each consumer re-scans
      // and re-chunks the corpus (house convention, see t_rarity_score).
      val chunks = graft.operators.SeqIds.pin(t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (size(toks)-1) div 16)," +
            " c -> array_join(slice(toks, c*16+1, 16), ' '))")))
        .withColumnRenamed("pos", "ci").withColumnRenamed("col", "chunk"))
      val firsts = chunks.groupBy("chunk")
        .agg(min(struct(col("doc_id"), col("ci"))).as("first"))
      chunks.join(firsts, "chunk")
        .withColumn("kept",
          col("first.doc_id") === col("doc_id") && col("first.ci") === col("ci"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_chunks"),
          sum(when(col("kept"), 1).otherwise(0)).cast("int").as("n_kept"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(col("kept"),
                struct(col("ci"), col("chunk"))))),
              x => x.getField("chunk")),
            " ").cast("binary")).as("recon_md5"))
        .orderBy("doc_id")
    }),

    // n-gram Jaccard near-dup: exact integer threshold
    // 10*shared >= 8*union (J >= 0.8). Candidate pairs come from
    // per-shingle doc buckets (groupBy + pair explosion) — ONE pass over
    // the shingles instead of a self-join that recomputes and shuffles
    // the exploded table twice. Stop-shingles (document frequency >
    // MaxBucket) are dropped before pairing, so a hot shingle can never
    // produce a quadratic bucket; `shared` then undercounts for pairs
    // that co-occurred only in dropped shingles (conservative recall
    // trade, standard for shingle-LSH at scale).
    "d_ngram_jaccard" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      // pinned: the shingle pass (tokenize + distinct 3-grams per doc)
      // feeds the explode AND both count-join sides — three full
      // document scans unpinned. Released by the consumer's releaseAll.
      val sh = graft.operators.SeqIds.pin(shingled(t(s, d, "documents")))
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      val cnt = sh.select(col("doc_id"), size(col("shingles")).as("n"))
      val pairs = ex.groupBy("s")
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")) > 1 && size(col("docs")) <= MaxBucket)
        .select(expr("graft_pairs(docs)"))
        .groupBy("da", "db")
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(cnt.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(cnt.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .filter(col("shared") * 10 >= (col("na") + col("nb") - col("shared")) * 8)
        .select(col("da"), col("db"), col("shared"), col("na"), col("nb"))
        .orderBy("da", "db")
    }),

    // N-GRAM CONTAINMENT — the asymmetric twin of d_ngram_jaccard for
    // QUOTE/SUBSUMPTION detection: a short doc wholly contained in a
    // long one has low Jaccard (diluted by the long doc's shingles)
    // but high containment |A∩B| / min(|A|,|B|). Same bucket-capped
    // shingle-join plan (never all-pairs); the threshold is exact
    // integer math (shared·10 ≥ min(na,nb)·9 ⇔ C ≥ 0.9), so the gate
    // is a full cross-engine hash check.
    "d_containment" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      val sh = graft.operators.SeqIds.pin(shingled(t(s, d, "documents")))
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      val cnt = sh.select(col("doc_id"), size(col("shingles")).as("n"))
      val pairs = ex.groupBy("s")
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")) > 1 && size(col("docs")) <= MaxBucket)
        .select(expr("graft_pairs(docs)"))
        .groupBy("da", "db")
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(cnt.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(cnt.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .filter(col("shared") * 10 >= least(col("na"), col("nb")) * 9)
        .select(col("da"), col("db"), col("shared"), col("na"), col("nb"))
        .orderBy("da", "db")
    }),

    // MinHash + LSH: deterministic md5 min-hash signature, banded. The
    // signature is one compiled pass over each doc's shingle set (pure
    // map — no explode/shuffle; the only shuffle is the band-bucket
    // groupBy, which is the LSH join itself).
    "d_minhash_lsh" -> ((s, d) =>
      minhashPairs(s, d).orderBy("da", "db")),

    // The exact-verify stage of two-stage LSH dedup: MinHash banding is
    // the RECALL stage (cheap, probabilistic); this joins the candidate
    // pairs back to both documents' shingle sets and computes the exact
    // Jaccard as integers (|∩|, |∪|, threshold ≥ 1/2). Precision
    // becomes exact; cost is per-CANDIDATE, and the candidate set is
    // already bucket-capped — at 100 TB the verify stage joins a
    // pair-sized frame against the corpus twice, never pairs × corpus.
    "d_lsh_jaccard_verify" -> ((s, d) => {
      // pinned: the shingle sets feed the signature pass AND both
      // sides of the pair join — without the pin each consumer
      // re-scans and re-shingles the corpus.
      val sh = graft.operators.SeqIds.pin(shingledDocs(s, d))
      minhashPairsFrom(sh)
        .join(sh.select(col("doc_id").as("da"), col("shingles").as("sha")), Seq("da"))
        .join(sh.select(col("doc_id").as("db"), col("shingles").as("shb")), Seq("db"))
        .select(col("da"), col("db"),
          size(array_intersect(col("sha"), col("shb"))).as("n_inter"),
          (size(col("sha")) + size(col("shb"))
            - size(array_intersect(col("sha"), col("shb")))).as("n_union"),
          (size(array_intersect(col("sha"), col("shb"))) * 2
            >= size(col("sha")) + size(col("shb"))
              - size(array_intersect(col("sha"), col("shb")))).as("verified"))
        .orderBy("da", "db")
    }),

    // Duplicate-cluster resolution: connected components over the
    // MinHash-LSH candidate pairs — the canonical post-LSH step (every
    // near-dup group collapses to its lowest doc_id as the canonical
    // representative). Only docs that appear in some pair are emitted
    // (singletons are not "clusters").
    "d_dup_clusters" -> ((s, d) =>
      clustersOf(minhashPairs(s, d)).orderBy("doc_id")),

    // Same component contract, computed with the O(log n)-round
    // large-star/small-star alternation (operators.BigStar) instead of
    // the diameter-bounded propagation loop inside clustersOf — the
    // scale path for CHAINED dup components whose diameter grows with
    // the corpus. Shares the d_dup_clusters oracle (identical output);
    // BigStarSpec additionally pins equality with clustersOf and the
    // rounds-vs-diameter law.
    "d_cc_bigstar" -> ((s, d) =>
      graft.operators.BigStar.clusters(minhashPairs(s, d)).orderBy("doc_id")),

    // Incremental LSH pair generation — the probe stage that FEEDS
    // d_incr_clusters, completing the end-to-end incremental dedup
    // pipeline (index probe → day's pairs → cluster merge). The
    // standing corpus' band index (doc_id, band, k) persists across
    // runs (in production bucketed by (band, k) with maintained
    // per-bucket counts — here both sides derive from one pinned
    // signature pass, the gate modeling); the day's batch computes
    // signatures for ITS docs only and probes: batch×standing pairs
    // via a broadcast-batch join against the index (map-side over the
    // corpus-sized side), batch×batch pairs via batch-internal
    // bucketing. Bucket admission uses the COMBINED (standing+batch)
    // size against MaxBucket — exactly the full recompute's rule, so
    // the output equals the full-corpus LSH's pairs restricted to
    // ≥1 batch endpoint, which is the oracle.
    "d_incr_pairs" -> ((s, d) => {
      val sh = graft.operators.SeqIds.pin(shingledDocs(s, d))
      val bands = graft.operators.SeqIds.pin(bandedSignatures(sh))
      val isBatch = col("doc_id") % 7 === 3
      val standing = bands.filter(!isBatch) // the persisted index's rows
      val batch = bands.filter(isBatch)     // the day's signatures
      // admission: combined bucket size in (1, MaxBucket]; only buckets
      // the batch touches can produce day pairs. The standing count is
      // maintained index metadata in production — no corpus aggregate
      // per run; computed here from the gate's modeled index.
      val standingCnt = standing.groupBy("band", "k").agg(count(lit(1)).as("sn"))
      val batchCnt = batch.groupBy("band", "k").agg(count(lit(1)).as("bn"))
      val ok = batchCnt.join(standingCnt, Seq("band", "k"), "left")
        .select(col("band"), col("k"),
          (coalesce(col("sn"), lit(0L)) + col("bn")).as("n"))
        .filter(col("n") > 1 && col("n") <= MaxBucket)
        .select("band", "k")
      val admittedBatch = batch.join(broadcast(ok), Seq("band", "k"), "left_semi")
      // cross pairs: broadcast the (tiny) admitted batch bands; the
      // corpus-sized index side stays map-side, never shuffled
      val cross = standing
        .join(broadcast(admittedBatch
          .select(col("band"), col("k"), col("doc_id").as("bdoc"))),
          Seq("band", "k"))
        .select(least(col("doc_id"), col("bdoc")).as("da"),
                greatest(col("doc_id"), col("bdoc")).as("db"))
      // batch-internal pairs from the same admitted buckets
      val within = admittedBatch.groupBy("band", "k")
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")) > 1)
        .select(expr("graft_pairs(docs)"))
      cross.union(within.select(col("da"), col("db")))
        .distinct()
        .orderBy("da", "db")
    }),

    // Incremental cluster maintenance as a two-epoch replay: epoch 1 is
    // the standing corpus (doc_id%7 ≠ 3 — the d_incr_dedup batch-slice
    // convention), epoch 2 lands the batch docs' pairs (every pair with
    // ≥1 batch endpoint). Standing labels = CC over the epoch-1-internal
    // pairs; mergeIncremental folds the day's pairs in via
    // representative contraction — the corpus-sized label table never
    // shuffles, CC runs only on the contracted graph. The oracle is the
    // FULL recompute over the complete pair set: the replay-equality
    // that makes the incremental path trustworthy (st_dedup_replay
    // pattern).
    "d_incr_clusters" -> ((s, d) => {
      // pinned: the LSH pair set feeds both epoch filters, and inside
      // mergeIncremental the batch slice feeds endpoints + the mapping
      // join — unpinned, each consumer re-runs the banded LSH plan
      val pairs = graft.operators.SeqIds.pin(minhashPairs(s, d))
      val batch = (c: Column) => c % 7 === 3
      val standingPairs = pairs.filter(!batch(col("da")) && !batch(col("db")))
      val batchPairs = pairs.filter(batch(col("da")) || batch(col("db")))
      mergeIncremental(clustersOf(standingPairs), batchPairs).orderBy("doc_id")
    }),

    // Dedup APPLIED — the user-facing "give me the deduped corpus"
    // operation composed from the pieces: LSH candidate pairs →
    // connected components → drop every non-canonical cluster member
    // (anti join; J3 shape), emitting the surviving documents. The
    // anti-join side is the dup-cluster set (orders of magnitude
    // smaller than the corpus — broadcastable at scale).
    "d_dedup_apply" -> ((s, d) => {
      val clusters = clustersOf(minhashPairs(s, d))
      val drop = clusters.filter(col("doc_id") =!= col("cluster")).select("doc_id")
      t(s, d, "documents")
        .join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .orderBy("doc_id")
    }),

    // Near-dup retention POLICY: instead of d_dedup_apply's keep-the-
    // representative rule, keep the BEST document of each cluster —
    // longest text, doc_id as the deterministic tie-break. This is the
    // production quality-aware variant (dedup should discard the
    // truncated mirror, not the original). Scale shape: the label table
    // is pair-graph-sized (LSH survivors), so it broadcasts into the
    // corpus scan map-side; the argmax is a partial-aggregatable
    // min(struct) over cluster keys — the corpus is never shuffled and
    // no window function materializes per-cluster row sets.
    "d_cluster_best" -> ((s, d) => {
      val labels = clustersOf(minhashPairs(s, d))
      val docs = t(s, d, "documents").select("doc_id", "n_chars")
      docs.join(broadcast(labels), Seq("doc_id"))
        .groupBy("cluster")
        .agg(min(struct((-col("n_chars")).as("neg"),
          col("doc_id").as("doc_id"))).as("best"))
        .select(col("cluster"), col("best.doc_id").as("doc_id"),
          (-col("best.neg")).as("n_chars"))
        .orderBy("cluster")
    }),

    // SimHash near-dup candidates: 64-bit signature via the native
    // SimhashF expression, 2×32-bit bands — HASH-CHECKED end to end
    // (the oracle replicates the full 64-bit kernel in HUGEINT
    // arithmetic; SimhashSpec additionally covers the kernel). 32-bit
    // bands (vs the earlier 16-bit) require a 32-bit half-signature
    // match for candidacy — on a common-vocab corpus that cuts the
    // quadratic per-band collision growth by orders of magnitude while
    // still catching near-identical documents (≤2 differing bits land in
    // one band's half with high probability). MaxBucket caps whatever
    // skew remains.
    "d_simhash" -> ((s, d) => {
      graft.plans.GraftFunctions.register(s)
      // pinned: the signature pass (an md5 per token) feeds the band
      // explosion AND both sides of the candidate join — three full
      // document scans unpinned. Released by the consumer's releaseAll.
      val sigs = graft.operators.SeqIds.pin(t(s, d, "documents")
        .select(col("doc_id"), graft.functions.TextFunctions.simhash(split(col("text"), " ")).as("sig")))
      val bands = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until 2).map(b =>
          struct(lit(b).as("band"), shiftright(col("sig"), b * 32).bitwiseAND(lit(0xFFFFFFFFL)).as("k"))): _*)).as("bk"))
        .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.k"))
      val candidates = bands.groupBy("band", "k")
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")) > 1 && size(col("docs")) <= MaxBucket)
        .select(expr("graft_pairs(docs)"))
        .distinct()
      candidates
        .join(sigs.select(col("doc_id").as("da"), col("sig").as("sa")), "da")
        .join(sigs.select(col("doc_id").as("db"), col("sig").as("sb")), "db")
        // per-pair hamming via built-ins (codegen'd), not a UDF: this
        // is the hot path — one row per candidate pair
        .select(col("da"), col("db"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
        .orderBy("da", "db")
    }),

    // Embedding-cosine near-dup, blocked by REAL coarse-quantizer cells
    // (Ivf.seedCentroids + shuffle-free assign — the same machinery as
    // ann_ivf_real, oracle-replicated below). Pairs are generated only
    // within a cell, never across the corpus, and the cell count is
    // DERIVED from the corpus size (embedCellCount: n/256 bounded by
    // √n), so per-cell pair fan-out stays bounded no matter how large
    // the corpus grows — a fixed k would go quadratic within cells at
    // 100 TB, and an unbounded n/256 rule would blow up the assignment
    // stage (n·k) instead. The count() is parquet-metadata-cheap; the same
    // formula is replicated in the oracle's LIMIT subquery. Norms are
    // computed once per vector BEFORE the pair join (the pair side then
    // costs one compiled dot product, not three array folds).
    "d_embed_neardup" -> ((s, d) => embedPairs(s, d).orderBy("va", "vb")),

    // Semantic dedup apply (SemDeDup shape, Abbas et al. 2023): within
    // each coarse-quantizer cell, greedily keep the LOWEST vec_id of
    // every near-dup pair — a vector is dropped iff it has a semantic
    // near-duplicate with a smaller id. Deterministic (no clustering
    // RNG), one anti join over the pair set, which is orders of
    // magnitude smaller than the corpus; composes with the same
    // EmbedMaxCell-capped pair generation as d_embed_neardup, so the
    // 100 TB story is the pair stage's, already proven.
    "d_semantic_apply" -> ((s, d) =>
      t(s, d, "embeddings")
        .join(embedPairs(s, d).select(col("vb").as("vec_id")).distinct(),
          Seq("vec_id"), "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id"))
  )

  /** Embedding near-dup candidate pairs `(va, vb, cell)` — the shared
    * kernel of d_embed_neardup (which emits the pairs) and
    * d_semantic_apply (which anti-joins the corpus against them).
    */
  private def embedPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    graft.plans.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
    val k = embedCellCount(emb.count())
    val centroids = graft.ext.Ivf.seedCentroids(emb, k)
    // pinned: the assignment (scan + argmax + norm) feeds THREE
    // consumers — the cell-count probe, the a-side and the b-side of
    // the pair join; without the pin each is a full corpus pass.
    // Released by the consumer's releaseAll, like every pinned frame.
    val e = graft.operators.SeqIds.pin(
      graft.ext.Ivf.assign(s, emb, centroids)
        .withColumn("norm", expr("graft_norm(embedding)")))
    // EmbedMaxCell skew guard: drop pair generation for cells a
    // pathological cluster has overfilled (≤ k rows, broadcast;
    // filtering the a-side suffices — b shares a.cell by the join key)
    val okCells = e.groupBy("cell").count()
      .filter(col("count") <= EmbedMaxCell).select("cell")
    e.join(broadcast(okCells), Seq("cell"), "left_semi").as("a")
      .join(e.as("b"), col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        expr("graft_dot(a.embedding, b.embedding)") / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= 0.35)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("a.cell").as("cell"))
  }

  /** SQL mirror of [[minhashPairs]], ending in a `mpairs(da, db)` CTE. */
  private def minhashCtes = s"""$shingleCtes,
          sig AS (SELECT doc_id,
            min(substr(md5('0|'||s),1,8)) s0, min(substr(md5('1|'||s),1,8)) s1,
            min(substr(md5('2|'||s),1,8)) s2, min(substr(md5('3|'||s),1,8)) s3,
            min(substr(md5('4|'||s),1,8)) s4, min(substr(md5('5|'||s),1,8)) s5,
            min(substr(md5('6|'||s),1,8)) s6, min(substr(md5('7|'||s),1,8)) s7
            FROM ex GROUP BY doc_id),
          bands AS (
            SELECT doc_id, 0 band, s0||s1 k FROM sig UNION ALL
            SELECT doc_id, 1, s2||s3 FROM sig UNION ALL
            SELECT doc_id, 2, s4||s5 FROM sig UNION ALL
            SELECT doc_id, 3, s6||s7 FROM sig),
          okb AS (SELECT band, k FROM bands GROUP BY band, k
                  HAVING count(*) <= $MaxBucket),
          mpairs AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.k = b.k AND a.doc_id < b.doc_id
            JOIN okb o ON o.band = a.band AND o.k = a.k)"""

  val oracle: Map[String, String] = Map(
    // row_number here is safe in the single-engine oracle (no skew
    // concern) and is the clearest statement of keep-first semantics.
    "d_chunk_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS toks
                      FROM documents WHERE text IS NOT NULL),
         chunks AS (SELECT doc_id, unnest(list_transform(range(0, ((len(toks)-1)//16)+1),
                      c -> {'ci': c, 'chunk': array_to_string(toks[c*16+1:c*16+16], ' ')})) AS ch
                    FROM tok),
         flat AS (SELECT doc_id, ch.ci AS ci, ch.chunk AS chunk FROM chunks),
         ranked AS (SELECT doc_id, ci, chunk,
                      row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) AS rn
                    FROM flat)
         SELECT doc_id,
                CAST(count(*) AS INT) AS n_chunks,
                CAST(sum(CAST(rn = 1 AS INT)) AS INT) AS n_kept,
                md5(coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY ci), ''))
                  AS recon_md5
         FROM ranked GROUP BY doc_id ORDER BY doc_id""",
    "d_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY content_hash""",
    // NOT EXISTS, not NOT IN: a NULL text (legal per schema) would
    // make NOT IN return UNKNOWN for EVERY batch row and empty the
    // oracle, while Spark's left_anti (null keys never match) keeps
    // the batch — NOT EXISTS mirrors the anti-join null semantics.
    "d_incr_dedup" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
           b AS (SELECT min(doc_id) AS doc_id, content_hash
                 FROM h WHERE doc_id % 7 = 3 GROUP BY content_hash)
         SELECT doc_id, content_hash FROM b
         WHERE NOT EXISTS (SELECT 1 FROM h
                           WHERE h.doc_id % 7 <> 3
                             AND h.content_hash = b.content_hash)
         ORDER BY doc_id""",
    "d_ngram_jaccard" ->
      s"""WITH $shingleCtes,
          oks AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= $MaxBucket),
          pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) shared
                    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                    WHERE a.s IN (SELECT s FROM oks)
                    GROUP BY 1, 2)
          SELECT da, db, shared, ca.n AS na, cb.n AS nb
          FROM pairs JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
          WHERE shared * 10 >= (ca.n + cb.n - shared) * 8
          ORDER BY da, db""",
    // same shingle-join closure, containment threshold on the
    // smaller side
    "d_containment" ->
      s"""WITH $shingleCtes,
          oks AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= $MaxBucket),
          pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) shared
                    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                    WHERE a.s IN (SELECT s FROM oks)
                    GROUP BY 1, 2)
          SELECT da, db, shared, ca.n AS na, cb.n AS nb
          FROM pairs JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
          WHERE shared * 10 >= least(ca.n, cb.n) * 9
          ORDER BY da, db""",
    "d_minhash_lsh" ->
      s"""WITH $minhashCtes
          SELECT da, db FROM mpairs ORDER BY da, db""",
    // Exact Jaccard over the candidate pairs; LEFT JOIN via inter0 so a
    // band-collision pair with zero shared shingles still appears with
    // n_inter = 0 (as Spark's array_intersect produces).
    "d_lsh_jaccard_verify" ->
      s"""WITH $minhashCtes,
          inter0 AS (
            SELECT p.da, p.db, count(*) AS n_inter
            FROM mpairs p
            JOIN ex ea ON ea.doc_id = p.da
            JOIN ex eb ON eb.doc_id = p.db AND eb.s = ea.s
            GROUP BY p.da, p.db)
          SELECT p.da, p.db,
                 COALESCE(i.n_inter, 0) AS n_inter,
                 ca.n + cb.n - COALESCE(i.n_inter, 0) AS n_union,
                 COALESCE(i.n_inter, 0) * 2
                   >= ca.n + cb.n - COALESCE(i.n_inter, 0) AS verified
          FROM mpairs p
          LEFT JOIN inter0 i ON i.da = p.da AND i.db = p.db
          JOIN cnt ca ON ca.doc_id = p.da
          JOIN cnt cb ON cb.doc_id = p.db
          ORDER BY p.da, p.db""",
    // Transitive closure of the LSH pairs via a recursive CTE; cluster
    // id = min doc_id reachable in the component — the same fixpoint the
    // Spark label propagation converges to.
    "d_dup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
          edges AS (SELECT da AS a, db AS b FROM mpairs
                    UNION SELECT db, da FROM mpairs),
          reach AS (
            SELECT a AS node, b AS peer FROM edges
            UNION
            SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a)
          SELECT node AS doc_id, LEAST(node, MIN(peer)) AS cluster
          FROM reach GROUP BY node ORDER BY doc_id""",
    // Identical closure to d_dup_clusters: the big-star alternation
    // converges to the same min-label fixpoint, so the oracle is shared
    // verbatim (any divergence between the two Spark paths shows up as
    // exactly one of the twin gates going red).
    "d_cc_bigstar" ->
      s"""WITH RECURSIVE $minhashCtes,
          edges AS (SELECT da AS a, db AS b FROM mpairs
                    UNION SELECT db, da FROM mpairs),
          reach AS (
            SELECT a AS node, b AS peer FROM edges
            UNION
            SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a)
          SELECT node AS doc_id, LEAST(node, MIN(peer)) AS cluster
          FROM reach GROUP BY node ORDER BY doc_id""",
    // The full-corpus LSH's pair set restricted to pairs with at least
    // one batch endpoint — what a correct standing-index probe must
    // emit for the day's batch, including the combined-bucket
    // MaxBucket admission (mpairs carries the cap; the restriction
    // cannot resurrect a capped bucket).
    "d_incr_pairs" ->
      s"""WITH $minhashCtes
          SELECT da, db FROM mpairs
          WHERE da % 7 = 3 OR db % 7 = 3
          ORDER BY da, db""",
    // Full recompute over the complete pair set — deliberately identical
    // to the d_dup_clusters closure: the incremental path's OUTPUT
    // CONTRACT is "indistinguishable from recomputing from scratch", so
    // its oracle is exactly that recompute.
    "d_incr_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
          edges AS (SELECT da AS a, db AS b FROM mpairs
                    UNION SELECT db, da FROM mpairs),
          reach AS (
            SELECT a AS node, b AS peer FROM edges
            UNION
            SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a)
          SELECT node AS doc_id, LEAST(node, MIN(peer)) AS cluster
          FROM reach GROUP BY node ORDER BY doc_id""",
    "d_dedup_apply" ->
      s"""WITH RECURSIVE $minhashCtes,
          edges AS (SELECT da AS a, db AS b FROM mpairs
                    UNION SELECT db, da FROM mpairs),
          reach AS (
            SELECT a AS node, b AS peer FROM edges
            UNION
            SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a)
          SELECT doc_id, n_chars, lang
          FROM documents
          WHERE doc_id NOT IN (
            SELECT node FROM reach GROUP BY node
            HAVING LEAST(node, MIN(peer)) <> node)
          ORDER BY doc_id""",
    // Same cluster closure, then the keep-best rule spelled as a
    // window: rank each cluster's docs by (n_chars DESC, doc_id) and
    // keep rank 1 — semantically identical to the Spark side's
    // partial-aggregatable min(struct(-n_chars, doc_id)) argmax.
    "d_cluster_best" ->
      s"""WITH RECURSIVE $minhashCtes,
          edges AS (SELECT da AS a, db AS b FROM mpairs
                    UNION SELECT db, da FROM mpairs),
          reach AS (
            SELECT a AS node, b AS peer FROM edges
            UNION
            SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a),
          labels AS (
            SELECT node AS doc_id, LEAST(node, MIN(peer)) AS cluster
            FROM reach GROUP BY node)
          SELECT cluster, doc_id, n_chars FROM (
            SELECT l.cluster, d.doc_id, d.n_chars,
                   ROW_NUMBER() OVER (PARTITION BY l.cluster
                     ORDER BY d.n_chars DESC, d.doc_id) AS rn
            FROM labels l JOIN documents d ON l.doc_id = d.doc_id) ranked
          WHERE rn = 1 ORDER BY cluster""",
    // Full SQL replication of the SimHash kernel (TextSketches.simhash):
    // token hash = first 8 md5 bytes (two 32-bit hex parses combined in
    // HUGEINT — pure arithmetic, no signed-shift semantics questions),
    // per-bit votes over range(64), sign → signature, 2×32-bit bands
    // with the MaxBucket cap, hamming via bit_count(xor) on the signed
    // reinterpretation. Upgrades d_simhash from rows-only to hash-checked.
    "d_simhash" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         th AS (
           SELECT doc_id, tok,
                  CAST(('0x'||substr(md5(tok),1,8))::BIGINT AS HUGEINT) * 4294967296
                    + ('0x'||substr(md5(tok),9,8))::BIGINT AS hu
           FROM toks),
         bits AS (
           SELECT doc_id, r.range AS b,
                  SUM(CASE WHEN (hu // (1::HUGEINT << r.range)) % 2 = 1 THEN 1 ELSE -1 END) AS v
           FROM th CROSS JOIN range(64) r GROUP BY 1, 2),
         sig AS (
           SELECT doc_id,
                  SUM(CASE WHEN v > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS sigu
           FROM bits GROUP BY 1),
         sigs AS (
           SELECT doc_id,
                  CAST(sigu - CASE WHEN sigu >= 9223372036854775808::HUGEINT
                                   THEN 18446744073709551616::HUGEINT
                                   ELSE 0::HUGEINT END AS BIGINT) AS sig,
                  CAST(sigu % 4294967296 AS BIGINT) AS k0,
                  CAST(sigu // 4294967296 AS BIGINT) AS k1
           FROM sig),
         bands AS (
           SELECT doc_id, 0 AS band, k0 AS k FROM sigs UNION ALL
           SELECT doc_id, 1, k1 FROM sigs),
         okb AS (SELECT band, k FROM bands GROUP BY band, k
                 HAVING count(*) BETWEEN 2 AND $MaxBucket),
         cand AS (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.k = b.k AND a.doc_id < b.doc_id
           JOIN okb o ON o.band = a.band AND o.k = a.k)
         SELECT c.da, c.db, CAST(bit_count(xor(sa.sig, sb.sig)) AS INT) AS hamming
         FROM cand c JOIN sigs sa ON sa.doc_id = c.da JOIN sigs sb ON sb.doc_id = c.db
         ORDER BY da, db""",
    "d_embed_neardup" ->
      s"""WITH $embedPairCtes
         SELECT va, vb, cell FROM epairs ORDER BY va, vb""",
    "d_semantic_apply" ->
      s"""WITH $embedPairCtes
         SELECT vec_id, label FROM embeddings
         WHERE vec_id NOT IN (SELECT vb FROM epairs)
         ORDER BY vec_id"""
  )

  /** SQL mirror of [[embedPairs]], ending in an `epairs(va, vb, cell)`
    * CTE — shared by the d_embed_neardup and d_semantic_apply oracles so
    * the pair kernel and its SQL twin can never drift independently.
    */
  private def embedPairCtes = s"""cent AS (
           SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                  embedding AS centroid
           FROM (SELECT * FROM embeddings ORDER BY vec_id
                 LIMIT (SELECT GREATEST(1, LEAST(
                          CAST(CEIL(count(*) / $EmbedCellTarget.0) AS BIGINT),
                          CAST(CEIL(SQRT(count(*))) AS BIGINT)))
                        FROM embeddings))),
         assigned AS (
           SELECT vec_id, embedding, cell FROM (
             SELECT e.vec_id, e.embedding, c.cell,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.centroid AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(c.centroid AS DOUBLE[]), CAST(c.centroid AS DOUBLE[])))) DESC,
                        c.cell) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         okcell AS (
           SELECT cell FROM assigned GROUP BY cell
           HAVING count(*) <= $EmbedMaxCell),
         epairs AS (
           SELECT a.vec_id AS va, b.vec_id AS vb, a.cell AS cell
           FROM assigned a JOIN okcell o ON a.cell = o.cell
           JOIN assigned b
             ON a.cell = b.cell AND a.vec_id < b.vec_id
           WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.35)"""
}
