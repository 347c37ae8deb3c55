package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Driver-side single-file parquet writer for TINY metadata frames
  * (r21 optimization). Every [[Snapshot.publish]] of a bucket manifest
  * or schema sidecar previously launched a full Spark write job —
  * LocalTableScan → coalesce(1) → parquet — costing 50-100 ms of
  * planning + scheduling for a few-KB file, and a lifecycle gate
  * publishes many times. When the frame is already driver-resident
  * (a LocalRelation) and its schema maps onto plain parquet
  * primitives, the bytes can be written directly with parquet-hadoop's
  * Group API: no job, no stages, same file a Spark read round-trips.
  *
  * Scope guard: [[supported]] admits only flat schemas of
  * int/long/double/boolean/string — exactly the manifest/sidecar
  * shapes. Anything else (real data snapshots, nested types) keeps the
  * ordinary distributed write.
  */
private[lake] object LocalParquet {

  private[lake] def supported(schema: StructType): Boolean =
    schema.fields.nonEmpty && schema.fields.forall(_.dataType match {
      case IntegerType | LongType | DoubleType | BooleanType | StringType => true
      case _ => false
    })

  private def messageTypeOf(schema: StructType): org.apache.parquet.schema.MessageType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition
    val fields = schema.fields.map { f =>
      // always OPTIONAL: Spark's own parquet writer emits every field
      // optional, and matching it keeps read-back schemas identical
      val rep = Repetition.OPTIONAL
      (f.dataType match {
        case IntegerType => Types.primitive(INT32, rep)
        case LongType => Types.primitive(INT64, rep)
        case DoubleType => Types.primitive(DOUBLE, rep)
        case BooleanType => Types.primitive(BOOLEAN, rep)
        case StringType =>
          Types.primitive(BINARY, rep).as(LogicalTypeAnnotation.stringType())
        case other => throw new IllegalArgumentException(
          s"unsupported local-parquet type: $other")
      }).named(f.name): org.apache.parquet.schema.Type
    }
    new org.apache.parquet.schema.MessageType("spark_schema", fields: _*)
  }

  /** Write `rows` as `dir/part-00000-<uuid>.snappy.parquet`,
    * REPLACING `dir` (the mode("overwrite") the call sites had). */
  private[lake] def overwrite(spark: org.apache.spark.sql.SparkSession,
                              dir: String, schema: StructType,
                              rows: Seq[Row]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val msg = messageTypeOf(schema)
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msg, conf)
    val dp = new Path(dir)
    val fs = dp.getFileSystem(conf)
    if (fs.exists(dp)) fs.delete(dp, true)
    fs.mkdirs(dp)
    val file = new Path(dp, "part-00000-" +
      java.util.UUID.randomUUID().toString + ".snappy.parquet")
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withType(msg)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { r =>
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(msg)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!r.isNullAt(i)) f.dataType match {
          case IntegerType => g.add(f.name, r.getInt(i))
          case LongType => g.add(f.name, r.getLong(i))
          case DoubleType => g.add(f.name, r.getDouble(i))
          case BooleanType => g.add(f.name, r.getBoolean(i))
          case StringType => g.add(f.name, r.getString(i))
          case other => throw new IllegalArgumentException(
            s"unsupported local-parquet type: $other")
        }
      }
      writer.write(g)
    } finally writer.close()
  }
}
