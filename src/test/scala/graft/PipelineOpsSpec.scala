package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Semantics of the round-12 pipeline operators on crafted inputs:
  * repetition signals, PII scrub, int8 quantization, bloom-semi join.
  * (The driver gate hash-checks them against DuckDB on the real corpus;
  * these specs pin the kernel math on inputs where the expected values
  * are derivable by hand.)
  */
class PipelineOpsSpec extends SparkSpec {

  private def craftedDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft-craft").toString
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t_repetition counts duplicate tokens/bigrams and the top bigram") {
    val dir = craftedDir(Seq(
      (1L, "a a a a", "en", "t", 7L),        // bigrams: 3x "a a"
      (2L, "w x y z", "en", "t", 7L),        // no repetition
      (3L, "p q p q p", "en", "t", 9L)))     // bigrams: p q, q p, p q, q p
    val out = queries.TextQueries.defs("t_repetition")(spark, dir)
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Int]("n_tokens") == 4 && r1.getAs[Int]("n_bigrams") == 3)
    assert(r1.getAs[Int]("n_dup_tokens") == 3 && r1.getAs[Int]("n_dup_bigrams") == 2)
    assert(r1.getAs[Int]("top_bigram_n") == 3 && !r1.getAs[Boolean]("keep"))
    val r2 = out(1)
    assert(r2.getAs[Int]("n_dup_bigrams") == 0 && r2.getAs[Int]("top_bigram_n") == 1)
    assert(r2.getAs[Boolean]("keep"))
    val r3 = out(2)
    assert(r3.getAs[Int]("n_bigrams") == 4 && r3.getAs[Int]("n_dup_bigrams") == 2)
    assert(r3.getAs[Int]("top_bigram_n") == 2 && !r3.getAs[Boolean]("keep"))
  }

  test("t_pii_scrub redacts emails and phones present in the source text") {
    // doc_id = 3: % 3 == 0 and % 2 == 1, so NEITHER synthetic injection
    // fires — everything measured comes from the text itself.
    val dir = craftedDir(Seq(
      (3L, "mail bob.smith@corp.example.org or dial 123-456-7890 now", "en", "t", 56L)))
    val out = queries.TextQueries.defs("t_pii_scrub")(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("n_emails") == 1)
    assert(out(0).getAs[Int]("n_phones") == 1)
    val expected = "mail <EMAIL> or dial <PHONE> now"
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("scrub_hash") == expectedMd5)
  }

  test("t_pii_scrub leaves clean text untouched (hash of original)") {
    val clean = "no personal data here just words"
    val dir = craftedDir(Seq((3L, clean, "en", "t", clean.length.toLong)))
    val out = queries.TextQueries.defs("t_pii_scrub")(spark, dir).collect()
    assert(out(0).getAs[Int]("n_emails") == 0 && out(0).getAs[Int]("n_phones") == 0)
    val cleanMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("scrub_hash") == cleanMd5)
  }

  test("v_quantize_int8 produces exact codes and handles the zero vector") {
    val dir = Files.createTempDirectory("graft-craft").toString
    val s = spark
    import s.implicits._
    Seq((1L, Seq(1.0f, -0.5f, 0.0f), 0),
        (2L, Seq(0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = queries.SimQueries.defs("v_quantize_int8")(spark, dir)
      .orderBy("vec_id").collect()
    // mx = 1.0, scale = 1/127; -0.5/scale = -63.5 → floor(-63.5+0.5) = -63
    assert(out(0).getAs[String]("q8_json") == "[127,-63,0]")
    assert(math.abs(out(0).getAs[Double]("scale") - 1.0 / 127.0) < 1e-15)
    // zero vector: scale 0, all-zero codes — no division by zero
    assert(out(1).getAs[String]("q8_json") == "[0,0,0]")
    assert(out(1).getAs[Double]("scale") == 0.0)
  }

  test("f_s5_url_norm lowercases the authority, strips port/utm/fragment/slash") {
    val dir = craftedDir(Seq(
      (0L, "t", "en", "s", 1L),    // port + trailing slash + fragment, no query
      (3L, "t", "en", "s", 1L),    // no port, trailing slash, query with utm
      (30L, "t", "en", "s", 1L)))  // everything at once
    val out = queries.StringQueries.defs("f_s5_url_norm")(spark, dir)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("norm_url") == "https://www.example0.com/Docs/s/0")
    assert(out(1).getAs[String]("norm_url") == "https://www.example3.com/Docs/s/3?page=3")
    assert(out(2).getAs[String]("norm_url") == "https://www.example2.com/Docs/s/30?page=0")
  }

  test("t_rarity_score computes df-based hapax and sum-df per doc") {
    val dir = craftedDir(Seq(
      (1L, "a b c", "en", "s", 5L),
      (2L, "a b x", "en", "s", 5L),
      (3L, "a z z", "en", "s", 5L)))
    val out = queries.TextQueries.defs("t_rarity_score")(spark, dir)
      .orderBy("doc_id").collect()
    // df: a=3, b=2, c=1, x=1, z=1 (distinct per doc)
    assert(out(0).getAs[Long]("n_distinct_tokens") == 3 &&
      out(0).getAs[Long]("n_hapax") == 1 && out(0).getAs[Long]("sum_df") == 6)
    assert(out(1).getAs[Long]("n_hapax") == 1 && out(1).getAs[Long]("sum_df") == 6)
    assert(out(2).getAs[Long]("n_distinct_tokens") == 2 &&
      out(2).getAs[Long]("n_hapax") == 1 && out(2).getAs[Long]("sum_df") == 4)
  }

  test("mm_dhash is invariant under re-encode and 2x downscale (the near-dup property)") {
    val img = new java.awt.image.BufferedImage(144, 128,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    for (r <- 0 until 8; c <- 0 until 9) {
      val phase = ((0xB7L >> r) & 1L).toInt
      val v = if ((c + phase) % 2 == 0) 0 else 255
      g.setColor(new java.awt.Color(v, v, v))
      g.fillRect(c * 16, r * 16, 16, 16)
    }
    g.dispose()
    val jpeg = functions.ImageOps.encodeJpeg(img).get
    val h = functions.ImageOps.dhash(jpeg).get
    // predicted from the phase bits: row byte 0x55 (phase 0) / 0xAA (1)
    val expected = (0 until 8).map { r =>
      val byte = if (((0xB7L >> r) & 1L) == 0L) 0x55L else 0xAAL
      byte << (r * 8)
    }.reduce(_ | _)
    assert(h == expected, f"got $h%016x expected $expected%016x")
    // a near-duplicate (downscaled re-encode) hashes identically...
    val small = functions.ImageOps.resize(jpeg, 72, 64).get
    assert(functions.ImageOps.dhash(small).get == h)
    // degenerate sizes produce NO hash rather than a content-
    // independent one (all tiny images would otherwise collide)
    assert(functions.ImageOps.dhash(functions.ImageOps.resize(jpeg, 8, 7).get).isEmpty)
    // ...and a different pattern does not
    val other = functions.ImageOps.dhash({
      val i2 = new java.awt.image.BufferedImage(144, 128,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = i2.createGraphics()
      for (r <- 0 until 8; c <- 0 until 9) {
        val phase = ((0x48L >> r) & 1L).toInt
        val v = if ((c + phase) % 2 == 0) 0 else 255
        g2.setColor(new java.awt.Color(v, v, v))
        g2.fillRect(c * 16, r * 16, 16, 16)
      }
      g2.dispose()
      functions.ImageOps.encodeJpeg(i2).get
    }).get
    assert(other != h)
  }

  test("o4_global_topk plans TakeOrderedAndProject, not a global sort") {
    val df = queries.WindowQueries.defs("o4_global_topk")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(800))
    assert(df.collect().length == 20)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("d_chunk_dedup keeps first global occurrence of each 16-token chunk") {
    def chunk(prefix: String) = (1 to 16).map(i => s"$prefix$i").mkString(" ")
    val (a, b, c, dd) = (chunk("a"), chunk("b"), chunk("c"), chunk("d"))
    val dir = craftedDir(Seq(
      (1L, s"$a $b", "en", "t", 0L),   // both chunks first → kept 2/2
      (2L, s"$a $c", "en", "t", 0L),   // A dup of doc1 → only C kept
      (3L, b, "en", "t", 0L),          // whole doc dup of doc1's chunk B
      (4L, s"$dd $dd", "en", "t", 0L)))// within-doc dup: 2nd D dropped
    val out = queries.DedupQueries.defs("d_chunk_dedup")(spark, dir)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_chunks"),
      r.getAs[Int]("n_kept"))).toSeq ==
      Seq((1L, 2, 2), (2L, 2, 1), (3L, 1, 0), (4L, 2, 1)))
    assert(out(0).getAs[String]("recon_md5") == md5Hex(s"$a $b"))
    assert(out(1).getAs[String]("recon_md5") == md5Hex(c))
    assert(out(2).getAs[String]("recon_md5") == md5Hex(""))
    assert(out(3).getAs[String]("recon_md5") == md5Hex(dd))
  }

  test("t_decontaminate counts benchmark-shared 5-grams; threshold at 3") {
    val dir = craftedDir(Seq(
      (20L, "b1 b2 b3 b4 b5 b6 b7", "en", "t", 0L),    // benchmark: 3 grams
      (40L, "q1 q2 q3 q4 q5", "en", "t", 0L),          // benchmark: 1 gram
      (21L, "x1 x2 b1 b2 b3 b4 b5", "en", "t", 0L),    // shares 1 → clean
      (22L, "b1 b2 b3 b4 b5 b6 b7 x9", "en", "t", 0L), // shares 3 → contaminated
      (23L, "z1 z2 z3 z4 z5 z6", "en", "t", 0L),       // shares 0 → absent
      (41L, "q1 q2 q3 q4 q5", "en", "t", 0L),          // exact bench copy, 1 gram
      (24L, "t1 t2 t3", "en", "t", 0L)))               // under 5 tokens → excluded
    val out = queries.TextQueries.defs("t_decontaminate")(spark, dir)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"),
      r.getAs[Int]("contaminated"))).toSeq ==
      Seq((21L, 1L, 0), (22L, 3L, 1), (41L, 1L, 0)))
  }

  test("t_seq_pack splits docs across 128-token sequence boundaries exactly") {
    def doc(k: Int) = Seq.fill(k)("w").mkString(" ")
    // token spans: d1 [0,100) d2 [100,150) d3 [150,270) d4 [270,280)
    val dir = craftedDir(Seq(
      (1L, doc(100), "en", "t", 0L), (2L, doc(50), "en", "t", 0L),
      (3L, doc(120), "en", "t", 0L), (4L, doc(10), "en", "t", 0L)))
    val out = queries.TextQueries.defs("t_seq_pack")(spark, dir)
      .collect().map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tok"))).toSeq
    assert(out == Seq((0L, 1L, 100L), (0L, 2L, 28L), (1L, 2L, 22L),
      (1L, 3L, 106L), (2L, 3L, 14L), (2L, 4L, 10L)))
    // packing invariant: every non-final sequence carries exactly 128
    val bySeq = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySeq(0L) == 128L && bySeq(1L) == 128L && bySeq(2L) == 24L)
  }

  test("j10_bloom_semi equals the plain semi join and actually probes a bloom") {
    val df = queries.JoinQueries.defs("j10_bloom_semi")(spark, sf())
    // the prefilter must be result-transparent
    val dim = Tables.t(spark, sf(), "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000.0)
      .select(col("o_orderkey").as("l_orderkey"))
    val plain = Tables.t(spark, sf(), "lineitem")
      .join(dim, Seq("l_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_orderkey")
    val got = df.collect().map(_.toSeq)
    val exp = plain.collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq == exp.toSeq)
    // and the bloom probe is really in the executed plan
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), s"no bloom probe in plan:\n$planStr")
  }
}
