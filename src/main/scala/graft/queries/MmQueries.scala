package graft.queries

import graft.Tables.t
import graft.functions.{AudioOps, ImageOps}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata. The container has no
  * codec libraries, so the decode step is a clearly-marked deterministic
  * STUB — the Spark-side plumbing (binary column, schema, per-row
  * metadata extraction) is real and oracle-checked. The JDK-ImageIO
  * decode path for real JPEG/PNG bytes lives in functions.ImageOps with
  * its own spec.
  */
object MmQueries extends QueryPack {

  val defs: Map[String, QueryFn] = Map(
    // Binary column metadata: byte length + content digest + head byte.
    "mm_binary_meta" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary")) // opaque bytes stand-in
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("digest"),
          ascii(substring(col("text"), 1, 1)).as("head_byte"))
        .orderBy("doc_id")),

    // Real JPEG round-trip, distributed (F-B1..B4 plumbing): each row
    // encodes a small JPEG on an executor, redacts a polygon, and
    // decodes dims back. HASH-checked: only codec-independent outputs
    // are emitted (the decoded dims and the arithmetic they must
    // equal — a kernel failure drops rows or diverges dims_json);
    // byte-level codec output stays covered by ImageOpsSpec.
    "mm_image_pipeline" -> ((s, d) => {
      val genJpeg = udf((w: Int, h: Int, shade: Int) => {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(shade, shade / 2, 255 - shade))
        g.fillRect(0, 0, w, h); g.dispose()
        ImageOps.encodeJpeg(img).orNull
      })
      // asNondeterministic: keeps the dims filter ABOVE this projection —
      // a pushed-down predicate re-inlines the whole decode/redact chain
      // and processes every image twice (PLANS.md, round 11)
      val redactAndDims = udf((b: Array[Byte]) =>
        ImageOps.redact(b, Seq(Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0)))
          .flatMap(ImageOps.dims).map { case (w, h) => Seq(w, h) }.orNull)
        .asNondeterministic()
      t(s, d, "part").filter(col("p_partkey") <= 200)
        .withColumn("w", (col("p_partkey") % 16 + 8).cast("int"))
        .withColumn("h", (col("p_partkey") % 12 + 8).cast("int"))
        .withColumn("jpeg", genJpeg(col("w"), col("h"), (col("p_partkey") % 250).cast("int")))
        .withColumn("dims", redactAndDims(col("jpeg")))
        .filter(col("dims")(0) === col("w") && col("dims")(1) === col("h"))
        // dims serialized to JSON so the driver's comparator can hash rows
        .select(col("p_partkey"), col("w"), col("h"),
          to_json(col("dims")).as("dims_json"))
        .orderBy("p_partkey")
    }),

    // Real distributed RESIZE: executor-side encode → resize to half
    // dims → decode-verify. The filter keeps only rows whose decoded
    // dims equal the integer-arithmetic targets, so the oracle (which
    // knows nothing about images and expects every row) catches any
    // kernel misbehavior as a row-count mismatch.
    "mm_resize_pipeline" -> ((s, d) => {
      val genJpeg = udf((w: Int, h: Int, shade: Int) => {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(shade, 255 - shade, shade / 2))
        g.fillRect(0, 0, w, h); g.dispose()
        ImageOps.encodeJpeg(img).orNull
      })
      // asNondeterministic: same pushdown guard as redactAndDims above
      val resizedDims = udf((b: Array[Byte], tw: Int, th: Int) =>
        ImageOps.resize(b, tw, th).flatMap(ImageOps.dims)
          .map { case (w, h) => Seq(w, h) }.orNull)
        .asNondeterministic()
      t(s, d, "part").filter(col("p_partkey") <= 200)
        .withColumn("w", (col("p_partkey") % 16 + 8).cast("int"))
        .withColumn("h", (col("p_partkey") % 12 + 8).cast("int"))
        .withColumn("tw", (col("w") / 2).cast("int"))
        .withColumn("th", (col("h") / 2).cast("int"))
        .withColumn("dims", resizedDims(
          genJpeg(col("w"), col("h"), (col("p_partkey") % 250).cast("int")),
          col("tw"), col("th")))
        .filter(col("dims")(0) === col("tw") && col("dims")(1) === col("th"))
        .select("p_partkey", "w", "h", "tw", "th")
        .orderBy("p_partkey")
    }),

    // Audio leg of the multimodal surface: a per-row WAV header is
    // synthesized IN SQL (hex assembly → unhex, no driver bytes), then
    // parsed back by the real RIFF chunk-walker (AudioOps.wavMeta) on
    // executors. The oracle predicts every field arithmetically from the
    // generating formulas, so the parser is hash-checked end to end —
    // same trick as mm_dhash: deterministic synth makes a binary kernel
    // oracle-able.
    "mm_audio_meta" -> ((s, d) => {
      def le(c: org.apache.spark.sql.Column, nBytes: Int) = {
        val h = lpad(hex(c.cast("long")), nBytes * 2, "0")
        concat((0 until nBytes).map(i => substring(h, (nBytes - 1 - i) * 2 + 1, 2)): _*)
      }
      val parse = udf((b: Array[Byte]) => AudioOps.wavMeta(b))
      val ch = (col("doc_id") % 2 + 1).cast("int")
      val rate = element_at(
        array(lit(8000), lit(16000), lit(44100)), (col("doc_id") % 3).cast("int") + 1)
      val bits = when(col("doc_id") % 5 < 2, lit(8)).otherwise(lit(16))
      val dataB = octet_length(col("text").cast("binary")).cast("long") * 37 % 99991 + 100
      val byteRate = (rate * ch * (bits.cast("double") / 8)).cast("long")
      val blockAlign = (ch * (bits.cast("double") / 8)).cast("long")
      val wav = unhex(concat(
        lit("52494646"), le(dataB + 36, 4), lit("57415645"),
        lit("666D7420"), le(lit(16), 4), le(lit(1), 2), le(ch, 2),
        le(rate, 4), le(byteRate, 4), le(blockAlign, 2), le(bits, 2),
        lit("64617461"), le(dataB, 4)))
      t(s, d, "documents")
        .withColumn("meta", parse(wav))
        .select(col("doc_id"),
          col("meta.channels").as("channels"),
          col("meta.sampleRate").as("sample_rate"),
          col("meta.bitsPerSample").as("bits"),
          col("meta.dataBytes").as("data_bytes"),
          (col("meta.dataBytes").cast("double") /
            (col("meta.sampleRate") * col("meta.channels") *
              (col("meta.bitsPerSample") / 8))).as("duration_sec"))
        .orderBy("doc_id")
    }),

    // Frame sampling over a multimodal "video" column: per-video frame
    // ids exploded from typed metadata, keeping every 5th frame plus
    // the final frame — the standard keyframe-ish sampling shape. The
    // explode is executor-side (no driver loop) and the downstream
    // decode would run only on sampled frames.
    // Perceptual dHash for image near-dup — real codec path end to end
    // (executor-side JPEG encode → decode → 9×8 luma pooling → 64-bit
    // comparison hash, functions.ImageOps.dhash). The generated block
    // pattern keys each row's phase off a p_partkey bit with adjacent
    // blocks ALWAYS at 0/255 contrast, so every dHash bit is derivable
    // from key arithmetic alone — the DuckDB oracle predicts the full
    // 64-bit hash (as hex) without decoding anything, hash-checking the
    // decode+pool+compare kernel despite JPEG lossiness. At scale this
    // is the image analogue of d_exact_dedup: one scan-side map, then
    // groupBy(dhash) for near-dup clusters.
    "mm_dhash" -> ((s, d) => {
      val genPattern = udf((key: Long) => {
        val img = new java.awt.image.BufferedImage(144, 128,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        for (r <- 0 until 8; c <- 0 until 9) {
          val phase = ((key >> r) & 1L).toInt
          val v = if ((c + phase) % 2 == 0) 0 else 255
          g.setColor(new java.awt.Color(v, v, v))
          g.fillRect(c * 16, r * 16, 16, 16)
        }
        g.dispose()
        ImageOps.encodeJpeg(img).orNull
      })
      val dhashHex = udf((b: Array[Byte]) =>
        ImageOps.dhash(b).map(h => f"$h%016x").orNull)
      t(s, d, "part").filter(col("p_partkey") <= 200)
        .withColumn("jpeg", genPattern(col("p_partkey")))
        .select(col("p_partkey"), dhashHex(col("jpeg")).as("dhash_hex"))
        .orderBy("p_partkey")
    }),

    "mm_frame_sample" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("n_frames",
          (octet_length(col("text").cast("binary")) % 30 + 1).cast("int"))
        .select(col("doc_id"), col("n_frames"),
          explode(expr("sequence(0, n_frames - 1)")).as("frame_id"))
        .filter(col("frame_id") % 5 === 0 || col("frame_id") === col("n_frames") - 1)
        .select(col("doc_id"), col("frame_id").cast("int").as("frame_id"), col("n_frames"))
        .orderBy("doc_id", "frame_id")),

    // STUB decode: deterministic fake width/height/frame metadata from
    // the payload — stands in for the image/video decode UDF whose
    // Spark-side schema/partitioning this exercises.
    "mm_decode_stub" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          (octet_length(col("payload")) % 640 + 1).as("width"),
          (octet_length(col("payload")) * 7 % 480 + 1).as("height"),
          (octet_length(col("payload")) % 30 + 1).as("n_frames"),
          lit("stub/raw").as("format"))
        .orderBy("doc_id"))
  )

  /** Row byte of the predicted dHash for bit r of the key: phase 0 →
    * bits at even columns (0x55), phase 1 → odd columns (0xAA).
    */
  private def dhashRowSql(r: Int) =
    s"CASE WHEN ((p_partkey >> $r) & 1) = 0 THEN '55' ELSE 'aa' END"

  val oracle: Map[String, String] = Map(
    // Full 64-bit hash predicted from key arithmetic: row r occupies
    // bits [8r, 8r+8), so row 7 is the leading hex byte pair.
    "mm_dhash" ->
      s"""SELECT p_partkey,
          ${(7 to 0 by -1).map(dhashRowSql).mkString(" || ")} AS dhash_hex
          FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
         md5(text) AS digest, ascii(substr(text, 1, 1)) AS head_byte
         FROM documents ORDER BY doc_id""",
    // every field re-derived from the WAV synth formulas — the parser
    // must reproduce them from the bytes alone
    "mm_audio_meta" ->
      """SELECT doc_id,
         CAST(doc_id % 2 + 1 AS INT) AS channels,
         CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate,
         CAST(CASE WHEN doc_id % 5 < 2 THEN 8 ELSE 16 END AS INT) AS bits,
         CAST((octet_length(CAST(text AS BLOB)) * 37) % 99991 + 100 AS BIGINT) AS data_bytes,
         CAST((octet_length(CAST(text AS BLOB)) * 37) % 99991 + 100 AS DOUBLE)
           / ((CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)
              * (doc_id % 2 + 1)
              * ((CASE WHEN doc_id % 5 < 2 THEN 8 ELSE 16 END) / 8)) AS duration_sec
         FROM documents ORDER BY doc_id""",
    "mm_decode_stub" ->
      """SELECT doc_id,
         octet_length(CAST(text AS BLOB)) % 640 + 1 AS width,
         octet_length(CAST(text AS BLOB)) * 7 % 480 + 1 AS height,
         octet_length(CAST(text AS BLOB)) % 30 + 1 AS n_frames,
         'stub/raw' AS format
         FROM documents ORDER BY doc_id""",
    // the oracle expects EVERY row <= 200 with arithmetically-predicted
    // dims; a redact/encode/decode kernel failure drops rows or
    // diverges dims_json on the Spark side
    "mm_image_pipeline" ->
      """SELECT p_partkey,
         CAST(p_partkey % 16 + 8 AS INT) AS w,
         CAST(p_partkey % 12 + 8 AS INT) AS h,
         to_json(LIST_VALUE(CAST(p_partkey % 16 + 8 AS INT),
                            CAST(p_partkey % 12 + 8 AS INT))) AS dims_json
         FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",
    // the oracle expects EVERY row <= 200; a resize-kernel failure drops
    // rows on the Spark side and the row counts diverge
    "mm_resize_pipeline" ->
      """SELECT p_partkey,
         CAST(p_partkey % 16 + 8 AS INT) AS w,
         CAST(p_partkey % 12 + 8 AS INT) AS h,
         CAST((p_partkey % 16 + 8) // 2 AS INT) AS tw,
         CAST((p_partkey % 12 + 8) // 2 AS INT) AS th
         FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",
    "mm_frame_sample" ->
      """WITH v AS (
           SELECT doc_id,
                  CAST(octet_length(CAST(text AS BLOB)) % 30 + 1 AS INT) AS n_frames
           FROM documents),
         f AS (
           SELECT doc_id, n_frames,
                  CAST(unnest(range(0, n_frames)) AS INT) AS frame_id
           FROM v)
         SELECT doc_id, frame_id, n_frames FROM f
         WHERE frame_id % 5 = 0 OR frame_id = n_frames - 1
         ORDER BY doc_id, frame_id"""
  )
}
