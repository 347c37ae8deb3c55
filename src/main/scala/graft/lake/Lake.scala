package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Datalake access layer — the Spark-native re-expression of the reference's
  * pyarrow.dataset read/write spine (ref: TrainDatasets.py:175-233).
  *
  * Reference behavior being re-expressed (not ported):
  *  - S1 hive-partitioned scan with a declared schema (TrainDatasets.py:183-189)
  *  - S2 hive-partitioned scan with inferred schema   (TrainDatasets.py:397-399)
  *  - S3 partitioned append write, max_partitions cap (TrainDatasets.py:175-181)
  *  - S5 partition-manifest listing                    (TrainDatasets.py:213-233)
  *
  * Scale notes (100 TB): partition discovery and pruning are metadata
  * operations in Spark; S5 is expressed as a partition-column projection,
  * which the optimizer answers from the file index without touching row
  * data (`OptimizeMetadataOnlyQuery` / partition listing). Writes go
  * through `partitionBy` so each task fans out only to the partitions it
  * actually holds; `maxRecordsPerFile` bounds file size instead of the
  * reference's global `max_partitions=4096` cap, which does not scale past
  * one writer process.
  */
final class Lake(spark: SparkSession) {

  /** S1: declared-schema partitioned read. Partition dirs become columns. */
  def readDeclared(path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("basePath", path).parquet(path)

  /** S2: inferred-schema partitioned read (partition type inference on). */
  def readInferred(path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** S3: partitioned append write (ref TrainDatasets.py:175-181).
    * `maxRecordsPerFile` guards small-file explosions the reference capped
    * with max_partitions=4096.
    */
  def appendPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                        maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S5: partition manifest — distinct partition-key tuples. The reference
    * regex-parses file paths (TrainDatasets.py:213-233); with Spark the
    * partition columns are first-class, so this is a metadata-only
    * distinct.
    */
  def partitions(path: String, partitionCols: Seq[String]): DataFrame =
    readInferred(path).select(partitionCols.map(col): _*).distinct()
}
