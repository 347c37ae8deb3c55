package graft.schemas

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Declared schemas mirroring the reference's Arrow schemas one-for-one,
  * including per-field documentation carried in StructField metadata
  * (ref: TrainDatasets.py:73-147, 459-482; docs at :87-100).
  *
  * The reference keeps these as pyarrow schemas; here they are Spark
  * StructTypes used for declared-schema lake reads (Lake.readDeclared)
  * and for write-path validation.
  */
object Schemas {

  private def doc(s: String) =
    new MetadataBuilder().putString("doc", s).build()

  /** anno_schema — object-detection annotations (TrainDatasets.py:73-101). */
  val anno: StructType = StructType(Seq(
    StructField("project_id", LongType, nullable = true, doc("cvat project id")),
    StructField("task_id", LongType, nullable = true, doc("cvat task id")),
    StructField("job_id", LongType, nullable = true, doc("cvat job id")),
    StructField("track_id", LongType, nullable = true, doc("cvat track id, -1 when untracked")),
    StructField("image_name", StringType, nullable = true, doc("normalized image file name")),
    StructField("category", StringType, nullable = true, doc("label, lowercased")),
    StructField("segmentation", ArrayType(FloatType), nullable = true, doc("interleaved x,y polygon coords")),
    StructField("rcoco", ArrayType(FloatType), nullable = true, doc("[x,y,w,h,theta] rotated box (ODTK convention)")),
    StructField("coco", ArrayType(FloatType), nullable = true, doc("[xmin,ymin,w,h] axis-aligned box")),
    StructField("gt_iid", LongType, nullable = true, doc("ground-truth item id")),
    StructField("gt_attr", StringType, nullable = true, doc("JSON array of {iid|uuid|text: value} attributes")),
    StructField("ts", TimestampType, nullable = true, doc("ingestion timestamp, UTC microseconds"))
  ))

  /** four_d_anno_schema (TrainDatasets.py:103-127). */
  val fourDAnno: StructType = StructType(Seq(
    StructField("project_id", LongType, nullable = true, doc("cvat project id")),
    StructField("task_id", LongType, nullable = true, doc("cvat task id")),
    StructField("job_id", LongType, nullable = true, doc("cvat job id")),
    StructField("track_id", LongType, nullable = true, doc("cvat track id")),
    StructField("image_name", StringType, nullable = true, doc("normalized image file name")),
    StructField("category", StringType, nullable = true, doc("label, lowercased")),
    StructField("segmentation", ArrayType(FloatType), nullable = true, doc("interleaved x,y polygon coords")),
    StructField("coco", ArrayType(FloatType), nullable = true, doc("[xmin,ymin,w,h] axis-aligned box")),
    StructField("report_id", StringType, nullable = true, doc("report UUID")),
    StructField("ts", TimestampType, nullable = true, doc("ingestion timestamp, UTC microseconds"))
  ))

  /** image_schema (TrainDatasets.py:129-147). */
  val image: StructType = StructType(Seq(
    StructField("project_id", LongType, nullable = true, doc("cvat project id")),
    StructField("task_id", LongType, nullable = true, doc("cvat task id")),
    StructField("job_id", LongType, nullable = true, doc("cvat job id")),
    StructField("image_name", StringType, nullable = true, doc("normalized image file name")),
    StructField("image_bytes", BinaryType, nullable = true, doc("JPEG bytes (multimodal binary column)")),
    StructField("tags", ArrayType(StringType), nullable = true, doc("image-level tags, e.g. badimage")),
    StructField("ts", TimestampType, nullable = true, doc("ingestion timestamp, UTC microseconds"))
  ))

  /** n1_crops_multi_schema (TrainDatasets.py:459-482). */
  val n1CropsMulti: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = true, doc("item id (partition key)")),
    StructField("image_name", StringType, nullable = true, doc("source image name")),
    StructField("capture_uuid", StringType, nullable = true, doc("capture UUID (partition key)")),
    StructField("frame_id", LongType, nullable = true, doc("frame index within capture")),
    StructField("crop", BinaryType, nullable = true, doc("JPEG crop bytes")),
    StructField("bow", ArrayType(StringType), nullable = true, doc("OCR bag-of-words")),
    StructField("dims", ArrayType(FloatType), nullable = true, doc("[minor, major] physical dims")),
    StructField("in_fence", BooleanType, nullable = true, doc("inside geofence flag")),
    StructField("instance_id", LongType, nullable = true, doc("instance id")),
    StructField("created_date", TimestampType, nullable = true, doc("creation timestamp, UTC microseconds"))
  ))

  /** Partition layouts (TrainDatasets.py:151,157,456). */
  val annoPartitionCols: Seq[String] = Seq("project_id", "job_id", "image_name")
  val imagePartitionCols: Seq[String] = Seq("project_id", "job_id", "image_name")
  val n1CropsMultiPartitionCols: Seq[String] = Seq("item_id", "capture_uuid")

  /** Projection-with-cast "views" (ref TrainDatasets.py:25-68,373-381):
    * prune to the named columns and normalize types read back from hive
    * partition directories (ids parse as int32/string → cast to int64,
    * ts → timestamp[us]).
    */
  def projectionWithCast(df: DataFrame, casts: Seq[(String, DataType)]): DataFrame =
    df.select(casts.map { case (name, dt) => col(name).cast(dt).as(name) }: _*)

  /** rbb_anno_proj (TrainDatasets.py:25-36) — rotated-box detection. */
  val rbbAnnoProj: Seq[(String, DataType)] = Seq(
    "project_id" -> LongType, "task_id" -> LongType, "job_id" -> LongType,
    "image_name" -> StringType, "category" -> StringType,
    "segmentation" -> ArrayType(FloatType), "rcoco" -> ArrayType(FloatType),
    "coco" -> ArrayType(FloatType), "gt_iid" -> LongType,
    "ts" -> TimestampType)

  /** four_d_anno_proj (TrainDatasets.py:38-48) — 4d OD variant. */
  val fourDAnnoProj: Seq[(String, DataType)] = Seq(
    "project_id" -> LongType, "task_id" -> LongType, "job_id" -> LongType,
    "image_name" -> StringType, "category" -> StringType,
    "segmentation" -> ArrayType(FloatType), "coco" -> ArrayType(FloatType),
    "report_id" -> StringType, "ts" -> TimestampType)

  /** aa_anno_proj (TrainDatasets.py:60-68) — axis-aligned variant; the
    * reference projects the legacy `bbox` field here, not `coco`.
    */
  val aaAnnoProj: Seq[(String, DataType)] = Seq(
    "project_id" -> LongType, "task_id" -> LongType, "job_id" -> LongType,
    "image_name" -> StringType, "category" -> StringType,
    "bbox" -> ArrayType(FloatType), "ts" -> TimestampType)

  /** image_proj (TrainDatasets.py:50-58). */
  val imageProj: Seq[(String, DataType)] = Seq(
    "project_id" -> LongType, "task_id" -> LongType, "job_id" -> LongType,
    "image_name" -> StringType, "image_bytes" -> BinaryType,
    "tags" -> ArrayType(StringType), "ts" -> TimestampType)

  /** Schema-catalog dispatch by dataset name (TrainDatasets.py:165-171):
    * `od_rbb` reads the default anno schema through the rotated-box
    * projection; `4d_od` swaps in the 4d schema AND projection; every
    * other dataset id gets the axis-aligned projection over the default
    * schema. Returns (declared read schema, projection-with-cast spec)
    * for use with Lake.readDeclared + projectionWithCast.
    *
    * Fidelity note: the reference's default (aa) pairing is internally
    * inconsistent — `aa_anno_proj` projects a legacy `bbox` field that
    * `anno_schema` does not declare, so it only resolves over files
    * that physically carry a `bbox` column (legacy aa datasets). That
    * inconsistency is the reference's, preserved deliberately;
    * SchemasSpec pins both the failure on bbox-less files and the
    * success on legacy-shaped ones.
    */
  def forDataset(dataset: String): (StructType, Seq[(String, DataType)]) =
    dataset match {
      case "od_rbb" => (anno, rbbAnnoProj)
      case "4d_od"  => (fourDAnno, fourDAnnoProj)
      case _        => (anno, aaAnnoProj)
    }
}
