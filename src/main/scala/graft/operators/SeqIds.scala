package graft.operators

import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Scale-safe global sequential-id assignment (SURVEY §2.6 O3 / §2.4 A5;
  * ref create_coco_from_feather.py:59-85,97-106).
  *
  * `row_number()` over an unpartitioned window moves the entire input to a
  * single partition (Spark warns "No Partition Defined for Window
  * operation") — a scale-killer when the input is fact-sized. This is the
  * two-pass equivalent: range-partition by the sort key, sort within
  * partitions, count rows per partition, then assign
  * `partition_offset + local_index` per row. Identical ids, no
  * single-partition stage; wall-clock is two passes over one shuffle
  * (the map-side output is reused by the second job).
  *
  * Implementation note: this deliberately rides ONE RDD lineage through
  * `zipWithIndex` rather than two separate DataFrame jobs. Range-partition
  * bounds are sampled per plan execution (seeded by RDD id), so two
  * independent jobs could see different partition boundaries and produce
  * wrong offsets; a single lineage fixes the bounds once and the second
  * pass reuses the first pass's shuffle files.
  *
  * `sortCols` must define a total order (break ties explicitly), otherwise
  * ids within a tie group are partition-order-dependent — the same caveat
  * as `row_number`.
  */
object SeqIds {

  /** Adds `idName: bigint` = startAt + global ordinal of the row under
    * `sortCols` ascending. Output rows are globally sorted by `sortCols`.
    */
  def withSeqId(df: DataFrame, sortCols: Seq[Column], idName: String,
                startAt: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(idName, LongType, nullable = false)
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (startAt + i))
    }
    spark.createDataFrame(withId, schema)
  }
}
