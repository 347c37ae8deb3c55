package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSONL corpus exporter — the LLM-training interchange format (one
  * JSON object per line, sharded files). Not reference-mandated (the
  * reference exports COCO/YOLO only — SURVEY §2.1); this completes the
  * export family for the training-data pipeline the brief targets.
  *
  * Scale shape: line rendering is a codegen'd `to_json` projection
  * (no UDF, no driver bytes); sharding is `repartitionByRange` on
  * doc_id — range, not hash, so each shard holds a contiguous,
  * reproducible id interval (a downstream reader can route id lookups
  * to a shard without an index) — and the write is Spark's native text
  * sink, one file per shard written entirely executor-side. Field
  * order in the JSON object is the struct order (deterministic), and
  * the gate hash-checks the rendered lines against DuckDB's to_json.
  */
object Jsonl {

  /** One JSON line per document (deterministic field order). */
  def jsonLines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      to_json(struct(col("doc_id"), col("text"), col("lang"), col("source")))
        .as("line"))

  /** Write `nShards` JSONL shard files under `outDir` (one text file
    * per range shard, ids sorted within each shard).
    */
  def writeJsonl(docs: DataFrame, outDir: String, nShards: Int = 8): Unit =
    jsonLines(docs)
      .repartitionByRange(nShards, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .select("line")
      .write.mode("overwrite").text(outDir)
}
