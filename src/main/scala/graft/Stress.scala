package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Dedup-cap stress main (SCALE.md §Dedup): synthesizes a corpus ~10×
  * sf0.1 ("sf1-scale") with ADVERSARIAL hot keys — exact-copy floods and
  * a mass-duplicated embedding — then times the d_* family against it
  * and measures whether the MaxBucket / EmbedMaxCell caps actually bind.
  * At the shipped scale factors the caps drop nothing (max bucket 25);
  * this main is the evidence that at the scale where they DO bind, the
  * pair stage stays bounded and wall-time stays ~linear in corpus size.
  *
  * Usage: graft.Stress <workDir> [replication=10]
  * Writes <workDir>/documents.parquet + embeddings.parquet (same schema
  * as TESTDATA.md, so the unmodified SparkEntry queries run against it),
  * then prints one JSON line with per-query seconds and cap statistics.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val rep = args.lift(1).map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$workDir/documents.parquet").isDirectory)
      synthesize(spark, srcDir, workDir, rep)

    val nDocs = spark.read.parquet(s"$workDir/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$workDir/embeddings.parquet").count()

    // Cap diagnostics BEFORE timing: how big do the hottest buckets/
    // cells get, and how many does each cap drop?
    val shingleStats = {
      graft.plans.GraftFunctions.register(spark)
      val df = spark.read.parquet(s"$workDir/documents.parquet")
        .select(col("doc_id"), explode(expr("graft_shingles(text)")).as("s"))
        .groupBy("s").agg(countDistinct("doc_id").as("df"))
      df.agg(max("df").as("mx"),
        sum(when(col("df") > DedupQueries.MaxBucket, 1).otherwise(0)).as("dropped"))
        .collect()(0)
    }
    val cellStats = {
      val emb = spark.read.parquet(s"$workDir/embeddings.parquet")
      val k = DedupQueries.embedCellCount(nVecs)
      val cent = graft.ext.Ivf.seedCentroids(emb, k)
      graft.ext.Ivf.assign(spark, emb, cent)
        .groupBy("cell").count()
        .agg(max("count").as("mx"),
          sum(when(col("count") > DedupQueries.EmbedMaxCell, 1).otherwise(0)).as("dropped"),
          count(lit(1)).as("n_cells"))
        .collect()(0)
    }

    // Hot-chunk diagnostic for d_chunk_dedup: the exact-copy floods make
    // one document's chunks appear ~nDocs/10 times — the key-skew case
    // the partial-aggregatable min(struct) shape absorbs map-side.
    val chunkStats = spark.read.parquet(s"$workDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, (size(split(text, ' '))-1) div 16)," +
          " c -> array_join(slice(split(text, ' '), c*16+1, 16), ' '))")).as("chunk"))
      .groupBy("chunk").agg(count(lit(1)).as("n"))
      .agg(max("n").as("mx"), count(lit(1)).as("n_chunks"))
      .collect()(0)

    val names = Seq("d_exact_dedup", "d_minhash_lsh", "d_simhash",
      "d_ngram_jaccard", "d_embed_neardup", "d_dup_clusters", "d_dedup_apply",
      "d_chunk_dedup", "t_decontaminate", "t_seq_pack", "t_doc_shuffle")
    val timings = names.map { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, workDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.SeqIds.releaseAll()
      (name, sec, n)
    }
    val qs = timings.map { case (k, v, n) => f""""$k":{"sec":$v%.2f,"rows":$n}""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"dedup_stress","n_docs":$nDocs,"n_vecs":$nVecs,"replication":$rep,""" +
        s""""max_shingle_df":${shingleStats.get(0)},"shingle_buckets_dropped":${shingleStats.get(1)},""" +
        s""""max_cell":${cellStats.get(0)},"cells_dropped":${cellStats.get(1)},"n_cells":${cellStats.get(2)},""" +
        s""""max_chunk_df":${chunkStats.get(0)},"n_distinct_chunks":${chunkStats.get(1)},""" +
        s""""queries":$qs}""")
    spark.stop()
  }

  /** Replicated corpus with deterministic perturbation plus adversarial
    * floods: 10% of base docs re-appear as EXACT copies in every
    * replica (real near-dup mass for the cluster stages), one document
    * is flooded nDocs/10 times (the hot-shingle / hot-band case), and
    * one embedding is mass-duplicated (the hot-IVF-cell case). All
    * doc_ids/vec_ids stay disjoint across replicas.
    */
  private def synthesize(spark: SparkSession, srcDir: String,
                         workDir: String, rep: Int): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val vecs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nDocs = docs.count()
    val reps = spark.range(rep).select(col("id").as("r"))

    val replicated = docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("r") * nDocs * 10L).as("doc_id"),
        // exact copies for 10% of docs; others get a replica-unique
        // suffix so they are near- but not exact-duplicates
        when(col("doc_id") % 10 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("r").cast("string")))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    val flood = docs.filter(col("doc_id") === 7)
      .crossJoin(spark.range(nDocs / 10).select(col("id").as("f")))
      .select((col("f") + nDocs * 10L * rep + 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    replicated.unionAll(flood)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$workDir/documents.parquet")

    val nVecs = vecs.count()
    val vreplicated = vecs.crossJoin(reps)
      .select(
        (col("vec_id") + col("r") * nVecs * 10L).as("vec_id"),
        // tiny deterministic perturbation on one dimension per replica
        expr("transform(embedding, (x, i) -> CASE WHEN i = 0 " +
          "THEN cast(x + r * 0.001 as float) ELSE x END)").as("embedding"),
        col("label"))
    val vflood = vecs.filter(col("vec_id") === 3)
      .crossJoin(spark.range(nVecs / 2).select(col("id").as("f")))
      .select((col("f") + nVecs * 10L * rep + 1000000L).as("vec_id"),
        col("embedding"), col("label"))
    vreplicated.unionAll(vflood)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$workDir/embeddings.parquet")
  }
}
