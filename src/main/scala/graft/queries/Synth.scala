package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic anno/image-shaped frames synthesized from the testdata
  * fact tables, so exporter and ingestion-shaped operators can be
  * exercised (and oracle-checked) without CVAT: every derived value is
  * integer arithmetic on keys, reproducible in DuckDB SQL.
  */
object Synth {

  /** Annotation-shaped frame from lineitem: ~7 annos per image name,
    * integer triangle segmentation, category from returnflag+linestatus.
    */
  def annos(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      // The testdata files are single-row-group parquet, so the scan
      // cannot split: without a rebalance the whole projection below
      // (string concat + array building, the dominant cost) runs in ONE
      // task, and every consumer that executes this plan more than once
      // (dim collects, range-bound sampling, cache builds) serializes on
      // it. REBALANCE shuffles only the six pruned key columns and lets
      // AQE size the partitions — at 100 TB the scan arrives pre-split
      // and AQE coalesces this to a near-noop instead of exploding it.
      .hint("rebalance")
      .withColumn("image_name", concat(lit("img_"), (col("l_orderkey") % 311).cast("string")))
      .withColumn("category", lower(concat(lit("cat_"), col("l_returnflag"), col("l_linestatus"))))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
      // fold part/supp keys in so anno ids are total-ordered.
      .withColumn("anno_key",
        ((col("l_orderkey") * 8 + col("l_linenumber")) * 1000000 + col("l_partkey")) * 100000
          + col("l_suppkey"))
      .withColumn("x0", (col("l_partkey") % 500).cast("double"))
      .withColumn("y0", (col("l_suppkey") % 400).cast("double"))
      .withColumn("x1", col("x0") + 1 + (col("l_linenumber") % 20).cast("double"))
      .withColumn("y1", col("y0"))
      .withColumn("x2", col("x0"))
      .withColumn("y2", col("y0") + 2 + (col("l_partkey") % 13).cast("double"))
      .withColumn("segmentation",
        array(col("x0"), col("y0"), col("x1"), col("y1"), col("x2"), col("y2")))
      .withColumn("rcoco", array(col("x0"), col("y0"),
        col("x1") - col("x0"), col("y2") - col("y0"), lit(0.0)))
      .select("image_name", "category", "anno_key", "segmentation", "rcoco")

  /** SQL mirror of [[annos]] as a CTE named `sannos`. */
  val annosSqlCte: String =
    """sannos AS (
         SELECT 'img_' || CAST(l_orderkey % 311 AS VARCHAR) AS image_name,
                lower('cat_' || l_returnflag || l_linestatus) AS category,
                ((l_orderkey * 8 + l_linenumber) * 1000000 + l_partkey) * 100000 + l_suppkey AS anno_key,
                CAST(l_partkey % 500 AS DOUBLE) AS x0,
                CAST(l_suppkey % 400 AS DOUBLE) AS y0,
                CAST(l_partkey % 500 AS DOUBLE) + 1 + CAST(l_linenumber % 20 AS DOUBLE) AS x1,
                CAST(l_suppkey % 400 AS DOUBLE) AS y1,
                CAST(l_partkey % 500 AS DOUBLE) AS x2,
                CAST(l_suppkey % 400 AS DOUBLE) + 2 + CAST(l_partkey % 13 AS DOUBLE) AS y2
         FROM lineitem)"""

  /** Image-shaped frame: one row per distinct image name, fixed canvas,
    * every 20th image tagged 'badimage' (P5/P6 fodder).
    */
  def images(s: SparkSession, d: String): DataFrame =
    annos(s, d).select("image_name").distinct()
      .withColumn("width", lit(640L))
      .withColumn("height", lit(480L))
      .withColumn("img_num", substring(col("image_name"), 5, 10).cast("bigint"))
      .withColumn("tags",
        when(col("img_num") % 20 === 0, array(lit("badimage")))
          .otherwise(array().cast("array<string>")))
      .drop("img_num")

  val imagesSqlCte: String =
    """simages AS (
         SELECT image_name, CAST(640 AS BIGINT) AS width,
                CAST(480 AS BIGINT) AS height,
                CASE WHEN CAST(substr(image_name, 5) AS BIGINT) % 20 = 0
                     THEN ['badimage'] ELSE [] END AS tags
         FROM (SELECT DISTINCT image_name FROM sannos))"""
}
