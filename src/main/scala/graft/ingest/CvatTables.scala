package graft.ingest

import graft.functions.GeomFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tabularization of CVAT ingestion — the Spark-native re-expression of
  * create_anno_feather (CvatApi.py:327-425) and create_image_feather
  * (:250-315): what the reference does in a Python row loop becomes a
  * distributed column program (rect→polygon, degenerate guard, geometry
  * kernels, name normalization, gt_attr JSON assembly).
  *
  * Deviation (documented): the reference's "Item ID" attribute branch
  * emits a stray quote (CvatApi.py:397 `'{"iid":"' + ' "' + value…`
  * produces `{"iid":" "42"}`, malformed JSON); we emit the valid form
  * `{"iid": "42"}` matching the uuid/text branches — fix-by-spec, as
  * with the broken exporter CLI (SURVEY §2.1 S12).
  */
object CvatTables {

  /** Input columns: anno_uid (unique per shape), frame, label_id,
    * shape_type, points, attributes
    * (array<struct<spec_id:int,value:string>>), track_id.
    * `labels`: (label_id, category); `images`: (frame, image_name);
    * `attrTypes`: (spec_id, attr_name) — all dimension-sized, broadcast.
    */
  def buildAnnoTable(spark: SparkSession, shapes: DataFrame, labels: DataFrame,
                     images: DataFrame, attrTypes: DataFrame,
                     projectId: Long, taskId: Long, jobId: Long,
                     dropPrefix: Boolean = false): DataFrame = {
    val poly = shapes
      .withColumn("polygon",
        when(col("shape_type") === "rectangle", GeomFunctions.rectToPolygon(col("points")))
          .otherwise(col("points")))
      .filter(size(col("polygon")) >= 5) // too-few-points guard (ref :360-362)
      // one calipers run for both box forms; the struct keeps the
      // kernel in its own projection (CollapseProject cost guard)
      .withColumn("rc", GeomFunctions.rbbCoco(col("polygon")))
      .filter(col("rc").isNotNull) // degenerate-polygon guard (ref :363-369)
      .withColumn("rcoco", col("rc.rcoco"))
      .withColumn("coco", col("rc.coco"))
      .drop("rc")

    val named = poly
      .join(broadcast(labels), Seq("label_id"))
      .join(broadcast(images), Seq("frame"))
      .withColumn("stem", regexp_replace(col("image_name"), "\\.[^.]*$", ""))
      .withColumn("stem",
        // length = size(...), NOT Int.MaxValue: Slice's interpreted
        // eval computes start + length, which overflows Int.MaxValue to
        // a negative and returns an EMPTY array — the codegen path
        // clamps, so the same row emptied or survived depending on
        // which evaluator ran (confirmed on the shipped Spark 4.1.2)
        if (dropPrefix)
          when(size(split(col("stem"), "_")) >= 2,
            array_join(slice(split(col("stem"), "_"), lit(2),
              size(split(col("stem"), "_"))), "_"))
            .otherwise(col("stem"))
        else col("stem"))
      // JPEG_PAT removal (ref :24, :374-383): embedded .jpg/.jpeg dropped
      .withColumn("image_name_norm",
        regexp_replace(col("stem"), "\\.[Jj][Pp][Ee]?[Gg](\\.[Jj][Pp][Ee]?[Gg])?", ""))

    // gt_attr: JSON array of typed attribute objects (ref :388-406).
    // Values are JSON-escaped (backslash, quote, newline, tab) — this
    // class exists to emit VALID JSON where the reference's iid branch
    // was malformed, and a user-typed quote in a Text attribute would
    // otherwise break the document the same way.
    val escVal = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      col("attr.value"),
      "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\t", "\\\\t")
    val attrJson = named
      .withColumn("attr", explode_outer(col("attributes")))
      .join(broadcast(attrTypes), col("attr.spec_id") === attrTypes("spec_id"), "left")
      .withColumn("attr_obj",
        when(col("attr_name") === "Item ID",
          concat(lit("""{"iid": """"), escVal, lit(""""}""")))
        .when(col("attr_name") === "UUID",
          concat(lit("""{"uuid": """"), escVal, lit(""""}""")))
        .when(col("attr_name") === "Text",
          concat(lit("""{"text": """"), escVal, lit(""""}"""))))
      .groupBy("anno_uid")
      .agg(concat(lit("["),
        concat_ws(", ", sort_array(collect_list(struct(col("attr.spec_id").as("k"),
          col("attr_obj").as("v")))).getField("v")),
        lit("]")).as("gt_attr"))

    named
      .join(attrJson, Seq("anno_uid"))
      .select(
        lit(projectId).as("project_id"), lit(taskId).as("task_id"),
        lit(jobId).as("job_id"), col("track_id"),
        col("image_name_norm").as("image_name"), col("category"),
        col("polygon").cast("array<float>").as("segmentation"),
        col("rcoco").cast("array<float>").as("rcoco"),
        col("coco").cast("array<float>").as("coco"),
        col("gt_attr"),
        current_timestamp().as("ts"))
  }

  /** create_image_feather core (ref :250-315): image bytes column +
    * per-image tag lists; EXIF normalization optionally applied
    * distributedly (F-B1).
    */
  def buildImageTable(spark: SparkSession, images: DataFrame, tags: DataFrame,
                      projectId: Long, taskId: Long, jobId: Long,
                      normalizeExif: Boolean = true): DataFrame = {
    val exif = udf((b: Array[Byte]) =>
      graft.functions.ImageOps.normalizeOrientation(b).getOrElse(b))
    val withTags = images
      .join(tags.groupBy("frame").agg(collect_list(col("tag")).as("tags")),
        Seq("frame"), "left")
      .withColumn("tags", coalesce(col("tags"), array().cast("array<string>")))
    withTags.select(
      lit(projectId).as("project_id"), lit(taskId).as("task_id"),
      lit(jobId).as("job_id"),
      // last-extension strip ONLY — deliberately NOT the anno table's
      // extra JPEG_PAT/prefix normalization: the reference's image path
      // (CvatApi.py:296) applies only splitext while its anno path
      // (:372-383) normalizes further, and the port keeps that
      // asymmetry faithfully (double-extension names diverge between
      // the two tables THERE too)
      regexp_replace(col("image_name"), "\\.[^.]*$", "").as("image_name"),
      (if (normalizeExif) exif(col("image_bytes")) else col("image_bytes")).as("image_bytes"),
      col("tags"), current_timestamp().as("ts"))
  }
}
