package graft.export

import graft.operators.SeqIds
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** COCO exporter — Spark-native re-expression of
  * create_coco_from_feather.py:46-116 (S10, F-J2, A5, O3, J4/J5).
  *
  * The relational core (category dim, image ids, annotation records) is
  * distributed; only the final single-document envelope materializes on
  * the driver (inherent to "one JSON file" output, ref :115-116).
  *
  * Deviations (documented): the reference assigns image/annotation ids in
  * pandas iteration order, which is nondeterministic across reruns; we
  * assign by explicit sort keys (image_name; caller-provided anno key) so
  * ids are stable across engines and cluster sizes.
  */
object Coco {

  /** Category dimension: lexicographically sorted distinct categories,
    * dense ids from 1 ("background is 0", ref :59-70). Category
    * cardinality is bounded (a label vocabulary), so the dim-sized id
    * path applies.
    */
  def categoryDim(annos: DataFrame): DataFrame =
    // NULL categories never enter the dim: annotationRecords drops
    // null-category annos, so a null here would both occupy id 1
    // (shifting every real category) and NPE the streamed categories
    // section
    SeqIds.withSeqIdDim(
        annos.select("category").filter(col("category").isNotNull).distinct(),
        Seq(col("category")), "category_id", startAt = 1L)
      .withColumn("category_id", col("category_id").cast("int"))

  /** Image dimension: ids from 0 by image_name order (ref :73-85). */
  def imageDim(images: DataFrame): DataFrame =
    SeqIds.withSeqId(images, Seq(col("image_name")), "image_id")
      .withColumn("image_id", col("image_id").cast("int"))

  /** ONE action serves the tier decision AND both exporter dims: the
    * image side is collected LIMIT-capped at `maxImages`+1 rows and
    * unioned (tagged) with the distinct category vocabulary. If the cap
    * was not hit, the image values are complete and both dims come back
    * as driver LocalRelations (broadcast tier); if it was, only the
    * bounded category dim is built — image names beyond the cap never
    * reach the driver and the caller switches to the distributed
    * image-id path. Either way the driver holds at most maxImages+1
    * image names, and no separate probe job runs. Values are sorted
    * with UTF-8 byte ordering (nulls FIRST — exactly Spark's ASC NULLS
    * FIRST over UTF8String, so these ids agree with the SeqIds-based
    * categoryDim/imageDim; Scala's `String.<` compares UTF-16 code
    * units and would desync on U+E000..U+FFFF vs supplementary-plane
    * names), zipped with their index, and returned as LocalRelations.
    */
  private def localDims(images: DataFrame, annos: DataFrame,
                        maxImages: Long): (Option[DataFrame], DataFrame) = {
    val spark = annos.sparkSession
    import spark.implicits._
    val cap = math.min(maxImages + 1, Int.MaxValue.toLong).toInt
    val tagged = images.select(col("image_name").as("v"), lit(0).as("kind")).limit(cap)
      .union(annos.select(col("category").as("v"), lit(1).as("kind"))
        .filter(col("v").isNotNull).distinct()) // same rule as categoryDim
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0), r.getInt(1)))
    def dim(kind: Int, nameCol: String, idCol: String, startAt: Int) =
      tagged.collect { case (v, k) if k == kind => v }
        .sorted(utf8NullsFirst).zipWithIndex
        .map { case (n, i) => (n, i + startAt) }.toSeq
        .toDF(nameCol, idCol)
    val imgCount = tagged.count(_._2 == 0)
    val imgDim =
      if (imgCount <= maxImages) Some(dim(0, "image_name", "image_id", 0)) else None
    (imgDim, dim(1, "category", "category_id", 1))
  }

  /** Session conf key: image-count threshold above which
    * [[annotationRecords]] stops collecting/broadcasting the image
    * dimension (localDims) and switches to distributed id assignment +
    * shuffle join. The default (1M names) is comfortably inside the
    * broadcast envelope (~50 MB of names); an annotated-image corpus at
    * 100 TB scale crosses it and must never reach the driver.
    */
  val ImageBroadcastMaxRowsKey = "graft.coco.imageBroadcastMaxRows"
  private val ImageBroadcastMaxRowsDefault = 1L << 20

  /** Test observability hook: which image-dim tier the last
    * [[annotationRecords]] call ON THIS THREAD took (true = driver
    * localDims, false = distributed). Thread-local so concurrent
    * exports in one JVM don't race each other's reads; read by
    * PlanSpec/ExportSpec on the calling thread only.
    */
  private[graft] val lastImageDimWasLocalTL: ThreadLocal[Boolean] =
    ThreadLocal.withInitial(() => true)
  private[graft] def lastImageDimWasLocal: Boolean = lastImageDimWasLocalTL.get()

  private val utf8NullsFirst = Ordering.fromLessThan[String] { (a, b) =>
    if (a == null) b != null
    else if (b == null) false
    else {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0; var r = 0
      while (i < n && r == 0) { r = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
      if (r != 0) r < 0 else x.length < y.length
    }
  }

  /** Annotation records (ref :97-106 + make_anno_odtk/make_anno_d2
    * :14-44): join image ids (J4) and category ids (J5, both broadcast —
    * true dimensions), assign sequential anno ids (O3) by `annoKeyCol`.
    *
    * odtk=true uses the rotated box (`rcoco`) as bbox; otherwise the
    * axis-aligned bbox recomputed from the segmentation (make_anno_d2).
    * `area` is rcoco w*h in both variants (ref :21,40).
    *
    * Input contract: `images` is one row per image_name (a dimension,
    * as imageDim requires — duplicate rows would be assigned distinct
    * image ids). The tier probe counts ROWS against
    * [[ImageBroadcastMaxRowsKey]], so a frame violating the contract
    * can also flip an in-threshold corpus to the distributed tier;
    * output ids are identical either way, but the probe count equals
    * the name count only under the contract.
    */
  def annotationRecords(annos: DataFrame, images: DataFrame,
                        annoKeyCol: String, odtk: Boolean = true): DataFrame = {
    // Two image-dim tiers, switched on a bounded row probe against
    // ImageBroadcastMaxRowsKey. Below the threshold the dims are
    // assigned on the driver (localDims): identical ids to
    // imageDim/categoryDim (CocoSpec's id-consistency test pins that),
    // identical memory bound to the broadcast the join pays anyway —
    // but the dim plan is NOT re-executed for every downstream action
    // (broadcast sides rebuild per action; a LocalRelation is free).
    // Above it — an annotated-image corpus at 100 TB is not
    // dimension-bounded — image ids are assigned with the distributed
    // two-pass SeqIds operator and attached via shuffle join; only the
    // bounded category vocabulary is ever collected. The fact-sized
    // anno-id assignment stays on the distributed SeqIds path in both
    // tiers.
    //
    // Ids are assigned BEFORE the dim joins: the frame SeqIds persists
    // is then the bare anno width (no dim columns), and the
    // (order-preserving) broadcast joins attach ids afterwards.
    // A left-semi filter against the image dim (and a NOT NULL category
    // filter) first keeps the id semantics identical to assigning after
    // the inner joins: annos without a known image or without a category
    // never consume an id, so the exported id sequence stays gapless.
    //
    // The anno input is pinned ONCE up front: the localDims collect,
    // the SeqIds persisted pass, and — via
    // Catalyst's cache substitution, which rewrites any sameResult
    // subplan to the InMemoryRelation — a caller-side `images` frame
    // derived from the same anno plan all read this single cached
    // execution. Without the pin each of those is a full re-execution
    // of the (possibly expensive) upstream anno projection — at 100 TB,
    // 3-4 full fact-table scans where one suffices. Released with the
    // id caches by SeqIds.releaseAll() after the consumer's action.
    val a = SeqIds.pin(annos)
    // One LIMIT-capped collect (localDims) serves the tier decision and
    // both dims — no separate probe job. The category dim MUST come
    // from the same unfiltered distinct set cocoDocument's categories
    // array uses (categoryDim over all annos): deriving it from the
    // image-filtered annos would shift the dense ids whenever a
    // category occurs only on unknown-image annos, and every
    // annotation's category_id would silently point at the wrong entry
    // of the document's categories array. The distributed tier keeps
    // identical id semantics: only the bounded category vocabulary is
    // collected, and imageDim's SeqIds sort is the same UTF8String
    // ordering localDims replicates driver-side.
    val maxLocal = annos.sparkSession.conf
      .get(ImageBroadcastMaxRowsKey, ImageBroadcastMaxRowsDefault.toString).toLong
    val (imgDimLocal, catDim) = localDims(images, a, maxLocal)
    lastImageDimWasLocalTL.set(imgDimLocal.isDefined)
    val imgDim = imgDimLocal.getOrElse(imageDim(images.select("image_name")))
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (imgDimLocal.isDefined) broadcast(df) else df
    val known = a
      .join(maybeBroadcast(imgDim.select("image_name")), Seq("image_name"), "left_semi")
      .filter(col("category").isNotNull)
    // category breaks annoKey ties so ids are total-ordered even when
    // the caller's key collides across categories
    val withIds = SeqIds.withSeqId(known, Seq(col(annoKeyCol), col("category")), "id")
    // In the distributed tier the image join is a shuffle join, so the
    // returned row order is no longer the id order the broadcast tier
    // preserves — callers needing id order sort explicitly
    // (cocoDocument does).
    val joined = withIds
      .withColumn("id", col("id").cast("int"))
      .join(maybeBroadcast(imgDim), Seq("image_name"))
      .join(broadcast(catDim), Seq("category"))
    val bbox =
      if (odtk) col("rcoco")
      else graft.functions.GeomFunctions.segmentation2bbox(col("segmentation"))
    joined
      .withColumn("iscrowd", lit(0))
      .withColumn("bbox", bbox)
      .withColumn("area", col("rcoco")(2) * col("rcoco")(3))
  }

  /** Whole-document assembly (ref :46-116) STREAMED to `out`: the
    * single-document output is inherently driver-written (one JSON
    * file), but nothing forces the driver to hold the document — or
    * any corpus-sized array — in memory. Categories are collected (a
    * bounded label vocabulary); the images and annotations sections
    * are driven by `toLocalIterator` over the id-sorted frames, which
    * fetches ONE partition at a time (the sort's shuffle map stage
    * runs once; each per-partition fetch job reuses its output), so
    * peak driver memory is O(largest partition), constant in corpus
    * size. Rows are formatted and written as they arrive — no
    * per-section array, no whole-document string.
    *
    * Info/license text is neutral placeholder, not the reference's
    * URLs.
    */
  def writeCocoTo(out: java.io.Writer, annos: DataFrame, images: DataFrame,
                  annoKeyCol: String, train: Boolean = false,
                  odtk: Boolean = true): Unit = {
    // One pinned execution of the anno plan serves every action below:
    // categoryDim, imageDim (an `images` derived from the same anno plan
    // hits the cache via substitution), and annotationRecords' dims + id
    // pass (its internal pin of the already-persisted frame is a no-op).
    // Unpersisted before returning — the streamed write completes in
    // this method, so unlike annotationRecords no cache may outlive
    // the call.
    annos.persist()
    // scoped registry cleanup: the withSeqId/pin frames minted INSIDE
    // this call are fully consumed by the streamed write, so they are
    // released on exit — a notebook caller looping exports must not
    // accumulate pinned frames for the session lifetime (frames pinned
    // BEFORE the call are untouched)
    val regMark = SeqIds.mark()
    try {
    val info = """{"description": "Dataset", "version": "1.0", "year": 2022}"""
    val licenses = """[{"id": 1, "name": "placeholder"}]"""
    out.write(s"""{"info": $info, "licenses": $licenses, "images": [""")
    // streamSection writes ", "-separated elements per row — the exact
    // bytes the pre-streaming mkString produced (CocoFidelitySpec and
    // the cross-tier byte-identity test pin this).
    def streamSection[A](it: Iterator[A])(fmt: A => String): Unit = {
      var first = true
      it.foreach { a =>
        if (!first) out.write(", ")
        out.write(fmt(a)); first = false
      }
    }
    // Section streaming order comes FREE from the id-assignment pass:
    // SeqIds.withSeqId leaves its output range-partitioned by the sort
    // key with partition index = range order and ids ascending across
    // partitions by construction, and the broadcast dim joins preserve
    // both. The former repartitionByRange(8, id) + sortWithinPartitions
    // re-sort here was therefore a full extra exchange (plus its range-
    // sampling pass) that re-established an ordering the frame already
    // had — at export scale, a second shuffle of the entire record set.
    // groupedRows replaces it with a zero-exchange fetch: one job per
    // CONTIGUOUS partition-index group (≤8 — ExportExecCountSpec pins
    // the bound independent of spark.sql.shuffle.partitions), identical
    // row sequence, and the same O(data/8) driver-memory bound the 8-way
    // re-range gave (one partition GROUP held at a time).
    streamSection(
      groupedRows(imageDim(images)
        .select("image_name", "height", "width", "image_id"), 8)) { r =>
      s"""{"license": 1, "file_name": ${jstr(r.getString(0) + ".jpeg")}, "height": ${r.get(1)}, "width": ${r.get(2)}, "id": ${r.getInt(3)}}"""
    }
    out.write("""], "annotations": [""")
    // d2 always carries the raw polygon (ref :42); odtk eval exports
    // carry the ROTATED-box polygon `rbox` (ref :26), train omits it.
    // The train branch must not reference rbox at all (a Column-level
    // when() would still analyze it): the reference exports training sets
    // from frames that carry no rbox column.
    val segCol =
      if (!odtk) to_json(array(col("segmentation")))
      else if (train) lit(null).cast("string")
      else to_json(array(col("rbox")))
    val recsBase = annotationRecords(annos, images, annoKeyCol, odtk)
    // capture the tier IMMEDIATELY after the call that sets it: the
    // thread-local is per-call state, and any other export interleaved
    // on this thread before the read would silently flip the ordering
    // decision below
    val dimWasLocal = lastImageDimWasLocal
    val recs = recsBase
      .withColumn("seg_json", segCol)
      .select(col("image_id"), col("id"), col("category_id"),
              to_json(col("bbox")).as("bbox_json"), col("area"), col("seg_json"))
    // Broadcast tier: the dim joins preserved the SeqIds id order, so
    // the section streams with zero exchange (see the images section).
    // Distributed tier only (image dim attached via shuffle join, order
    // destroyed): re-establish id order explicitly — the one case that
    // genuinely needs the exchange.
    val ordered =
      if (dimWasLocal) recs
      else recs.repartitionByRange(8, col("id")).sortWithinPartitions("id")
    streamSection(groupedRows(ordered, 8)) { r =>
      val seg = Option(r.getString(5)).map(s => s""", "segmentation": $s""").getOrElse("")
      s"""{"iscrowd": 0, "image_id": ${r.getInt(0)}, "bbox": ${r.getString(3)}, "category_id": ${r.getInt(2)}, "area": ${r.get(4)}, "id": ${r.getInt(1)}$seg}"""
    }
    out.write("""], "categories": [""")
    // bounded label vocabulary — the one legitimately dim-sized collect
    streamSection(
      categoryDim(annos).orderBy("category_id").collect().iterator) { r =>
      s"""{"supercategory": ${jstr(r.getString(0))}, "id": ${r.getInt(1)}, "name": ${jstr(r.getString(0))}}"""
    }
    out.write("]}")
    } finally {
      annos.unpersist(blocking = false)
      SeqIds.releaseSince(regMark)
    }
  }

  /** The document as one in-memory String — for tests and small
    * exports. Necessarily O(document) on the driver; corpus-scale
    * callers use [[writeCocoDataset]], which streams to the file.
    */
  def cocoDocument(annos: DataFrame, images: DataFrame, annoKeyCol: String,
                   train: Boolean = false, odtk: Boolean = true): String = {
    val sw = new java.io.StringWriter()
    writeCocoTo(sw, annos, images, annoKeyCol, train, odtk)
    sw.toString
  }

  /** Streamed to `outputJson` — a plain path via java.nio, or a
    * scheme-qualified URI (`hdfs://`, `s3a://`, …) through the Hadoop
    * FileSystem API, matching the [[FileSink]] contract of the other
    * exporters. The document write is driver-side either way (single
    * file), so only the driver needs reachability.
    *
    * The stream goes to `outputJson + ".tmp"` and is renamed into
    * place only after a successful close: a mid-stream Spark/driver
    * failure neither destroys an existing good export nor leaves a
    * truncated, unparseable file that looks complete — the temp file
    * is deleted on failure and the prior artifact (if any) survives.
    */
  def writeCocoDataset(annos: DataFrame, images: DataFrame, annoKeyCol: String,
                       outputJson: String, train: Boolean = false, odtk: Boolean = true): Unit = {
    val tmpJson = outputJson + ".tmp"
    if (FileSink.hasScheme(outputJson)) {
      val dst = new org.apache.hadoop.fs.Path(outputJson)
      val tmp = new org.apache.hadoop.fs.Path(tmpJson)
      // private no-crc handle — never mutate the shared FileSystem cache
      val fs = FileSink.noCrcFileSystem(
        dst, annos.sparkSession.sparkContext.hadoopConfiguration)
      var ok = false
      try {
        val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))
        try writeCocoTo(w, annos, images, annoKeyCol, train, odtk)
        finally w.close()
        ok = true
      } finally {
        if (ok) {
          // overwrite rename via FileContext (atomic where the FS
          // supports it) — no delete-then-rename window, so a rename
          // failure leaves the PRIOR artifact intact instead of
          // destroying it first
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            dst.toUri, annos.sparkSession.sparkContext.hadoopConfiguration)
          fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } else
          // best-effort cleanup must not mask the original exception
          try fs.delete(tmp, false)
          catch { case scala.util.control.NonFatal(_) => () }
      }
    } else {
      val dst = java.nio.file.Paths.get(outputJson)
      val tmp = java.nio.file.Paths.get(tmpJson)
      var ok = false
      try {
        val w = java.nio.file.Files.newBufferedWriter(tmp)
        try writeCocoTo(w, annos, images, annoKeyCol, train, odtk)
        finally w.close()
        ok = true
      } finally {
        if (ok)
          java.nio.file.Files.move(tmp, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        else
          try java.nio.file.Files.deleteIfExists(tmp)
          catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** Rows of `df` in partition-index order (= row order for frames whose
    * partitioning already encodes the global order, e.g. SeqIds output),
    * fetched in at most `groups` jobs: partitions are split into
    * contiguous index ranges and each range is collected with ONE
    * runJob. Exactly toLocalIterator's sequence and laziness-per-group,
    * but the job count is bounded by `groups` instead of the partition
    * count — without the extra exchange a bounded repartition would pay.
    * Driver holds one group (≈ data/groups) at a time.
    */
  private def groupedRows(df: DataFrame, groups: Int): Iterator[org.apache.spark.sql.Row] = {
    val rdd = df.rdd
    val n = rdd.getNumPartitions
    if (n == 0) Iterator.empty
    else {
      val sc = df.sparkSession.sparkContext
      val per = math.max(1, math.ceil(n.toDouble / groups).toInt)
      (0 until n by per).iterator.flatMap { start =>
        val range = start until math.min(start + per, n)
        sc.runJob(rdd, (it: Iterator[org.apache.spark.sql.Row]) => it.toArray, range)
          .iterator.flatMap(_.iterator)
      }
    }
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
