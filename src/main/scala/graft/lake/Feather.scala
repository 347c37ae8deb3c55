package graft.lake

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.nio.channels.FileChannel
import java.nio.file.Paths
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** S4: Feather V2 (= Arrow IPC file) reader (ref TrainDatasets.py:192-196,
  * 241-245, 327-331; create_*_from_feather.py:84-85,132-133).
  *
  * The reference uses feather files as driver-local single-table caches,
  * so a driver-side read into a DataFrame matches the semantics and the
  * scale profile (these are metadata/export-sized tables; lake-scale data
  * lives in partitioned parquet, S1-S3). Built on the arrow-vector jars
  * Spark already ships — no extra dependency.
  *
  * Type coverage mirrors the reference schemas (§1.3): ints, strings,
  * doubles/floats, bools, binary, timestamp[us], list<float>,
  * list<string>.
  */
object Feather {

  /** Hard cap on the file size `read` will materialize on the driver.
    * This reader intentionally matches the reference's driver-local
    * cache profile; pointing it at lake-scale data would OOM the driver
    * long after the mistake was made — fail fast instead and point the
    * caller at the parquet path (S1-S3).
    */
  def maxDriverBytes: Long =
    sys.props.get("graft.feather.maxBytes").map(_.toLong).getOrElse(512L << 20)

  def read(spark: SparkSession, path: String): DataFrame = {
    val fileBytes = java.nio.file.Files.size(Paths.get(path))
    val cap = maxDriverBytes
    require(fileBytes <= cap,
      s"feather file $path is $fileBytes bytes > driver cap $cap; " +
        "Feather.read materializes on the driver — store lake-scale data as " +
        "partitioned parquet (Lake.scan) or raise -Dgraft.feather.maxBytes")
    val allocator = new RootAllocator()
    val ch = FileChannel.open(Paths.get(path))
    try {
      val reader = new ArrowFileReader(ch, allocator)
      try {
        val root = reader.getVectorSchemaRoot
        val sparkSchema = StructType(root.getSchema.getFields.asScala.toSeq.map(f =>
          StructField(f.getName, arrowToSpark(f), nullable = true)))
        val rows = ArrayBuffer[Row]()
        while (reader.loadNextBatch()) {
          val vectors = root.getFieldVectors.asScala.toSeq
          for (i <- 0 until root.getRowCount)
            rows += Row.fromSeq(vectors.map(v => get(v, i)))
        }
        spark.createDataFrame(rows.asJava, sparkSchema)
      } finally reader.close()
    } finally { ch.close(); allocator.close() }
  }

  private def arrowToSpark(f: org.apache.arrow.vector.types.pojo.Field): DataType = {
    import org.apache.arrow.vector.types.pojo.ArrowType
    // accept exactly what the row reader `get` decodes — a type mapped
    // here but not decodable there would pass the schema check and then
    // crash per-row MID-read; rejecting up front keeps failures loud
    // and immediate
    f.getType match {
      case t: ArrowType.Int if t.getIsSigned && t.getBitWidth == 64 => LongType
      case t: ArrowType.Int if t.getIsSigned && t.getBitWidth == 32 => IntegerType
      case t: ArrowType.Int if t.getIsSigned && t.getBitWidth == 16 => ShortType
      case t: ArrowType.Int => throw new UnsupportedOperationException(
        s"arrow int width ${t.getBitWidth} signed=${t.getIsSigned} is not " +
          "supported — cast to int16/32/64 before writing the feather")
      case t: ArrowType.FloatingPoint =>
        if (t.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)
          FloatType else DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Binary => BinaryType
      case t: ArrowType.Timestamp
        if t.getUnit == org.apache.arrow.vector.types.TimeUnit.MICROSECOND =>
        TimestampType
      case t: ArrowType.Timestamp => throw new UnsupportedOperationException(
        s"arrow timestamp unit ${t.getUnit} is not supported — " +
          "cast to timestamp[us] before writing the feather")
      case _: ArrowType.List =>
        ArrayType(arrowToSpark(f.getChildren.get(0)))
      case other => throw new UnsupportedOperationException(s"arrow type $other")
    }
  }

  private def get(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) return null
    v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
      case x: VarBinaryVector => x.get(i)
      case x: TimeStampMicroTZVector => microsToTimestamp(x.get(i))
      case x: TimeStampMicroVector => microsToTimestamp(x.get(i))
      case x: ListVector =>
        val inner = x.getDataVector
        val start = x.getOffsetBuffer.getInt(i * 4L)
        val end = x.getOffsetBuffer.getInt((i + 1) * 4L)
        (start until end).map(j => get(inner.asInstanceOf[FieldVector], j))
      case other => throw new UnsupportedOperationException(s"vector ${other.getClass}")
    }
  }

  /** timestamp[us] → java.sql.Timestamp with FULL microsecond precision
    * (the reference's feather carries datetime.now() microseconds).
    * setNanos replaces the whole sub-second part, so the split must be at
    * the second boundary — floorDiv/floorMod keep pre-1970 values exact.
    */
  private def microsToTimestamp(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }
}
