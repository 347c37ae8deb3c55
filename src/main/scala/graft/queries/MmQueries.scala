package graft.queries

import graft.Tables.t
import graft.functions.ImageOps
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
    // decodes dims back. Rows-only check (JPEG bytes are codec-
    // dependent); ImageOpsSpec covers the kernels' semantics.
    "mm_image_pipeline" -> ((s, d) => {
      val genJpeg = udf((w: Int, h: Int, shade: Int) => {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(shade, shade / 2, 255 - shade))
        g.fillRect(0, 0, w, h); g.dispose()
        ImageOps.encodeJpeg(img).orNull
      })
      val redactAndDims = udf((b: Array[Byte]) =>
        ImageOps.redact(b, Seq(Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0)))
          .flatMap(ImageOps.dims).map { case (w, h) => Seq(w, h) }.orNull)
      t(s, d, "part").filter(col("p_partkey") <= 200)
        .withColumn("w", (col("p_partkey") % 16 + 8).cast("int"))
        .withColumn("h", (col("p_partkey") % 12 + 8).cast("int"))
        .withColumn("jpeg", genJpeg(col("w"), col("h"), (col("p_partkey") % 250).cast("int")))
        .withColumn("dims", redactAndDims(col("jpeg")))
        .filter(col("dims")(0) === col("w") && col("dims")(1) === col("h"))
        // dims serialized to JSON so the driver's comparator can hash rows
        .select(col("p_partkey"), col("w"), col("h"),
          octet_length(col("jpeg")).as("n_bytes"),
          to_json(col("dims")).as("dims_json"))
        .orderBy("p_partkey")
    }),

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

  val oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
         md5(text) AS digest, ascii(substr(text, 1, 1)) AS head_byte
         FROM documents ORDER BY doc_id""",
    "mm_decode_stub" ->
      """SELECT doc_id,
         octet_length(CAST(text AS BLOB)) % 640 + 1 AS width,
         octet_length(CAST(text AS BLOB)) * 7 % 480 + 1 AS height,
         octet_length(CAST(text AS BLOB)) % 30 + 1 AS n_frames,
         'stub/raw' AS format
         FROM documents ORDER BY doc_id"""
  )
}
