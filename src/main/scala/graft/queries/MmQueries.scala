package graft.queries

import graft.Tables.t
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
