package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration
import java.util.zip.ZipInputStream
import scala.jdk.CollectionConverters._

/** CVAT REST ingestion source (SURVEY §2.1 S6/S7/S8 — ref
  * CvatApi.py:27-201). Driver-side by design: ingestion is
  * metadata-scale (projects/labels/annotations JSON); the distributed
  * work starts after `createDataset` on the returned rows.
  *
  * Mirrored behaviors: base-url normalization and relative-URL joining
  * (:35-41), pagination via "next" links (:83-87), frame-name
  * normalization to `.jpeg` (:106-109), track flattening through
  * interpolation (:140-146), and the async export poll loop
  * 202-then-201-then-download (:174-183) with zip extraction of the
  * `images/` prefix (:188-192).
  */
class CvatClient(baseUrlRaw: String, headers: Map[String, String],
                 timeoutSeconds: Int = 5, pollMillis: Long = 3000L,
                 maxConnectRetries: Int = 20, maxStatusPolls: Int = 1200) {

  val baseUrl: String = baseUrlRaw.stripSuffix("/")
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds)).build()

  private def resolve(url: String): String =
    if (url.startsWith(baseUrl)) url
    else if (url.startsWith("/")) baseUrl + url
    else s"$baseUrl/$url"

  private def request(url: String): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(resolve(url)))
      .timeout(Duration.ofSeconds(timeoutSeconds)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    b.build()
  }

  /** GET → parsed JSON; non-200 raises (ref :42-46). */
  def performGet(url: String): JsonNode = {
    val resp = http.send(request(url), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"Expected status code 200. Got ${resp.statusCode()} instead.")
    mapper.readTree(resp.body())
  }

  /** S6: project listing. */
  def fetchProjects(): JsonNode = performGet("/projects")

  /** S6: one project → (labelId → lowercased name, (taskId, jobId) pairs,
    * labelId → (attrId → attrName)) with "next"-link pagination
    * (ref :64-96).
    */
  /** Follow "next" pagination links to exhaustion — applied to EVERY
    * listing (labels, tasks, jobs). The reference paginates only the
    * tasks listing (CvatApi.py:82-86); labels or jobs past the first
    * page were silently truncated there (a label_id beyond page one
    * dropped its shapes via the inner label join). Deviation: paginate
    * everything. */
  private def allResults(firstUrl: String): Seq[JsonNode] = {
    val out = scala.collection.mutable.ArrayBuffer[JsonNode]()
    var page = performGet(firstUrl)
    out ++= page.get("results").elements().asScala
    while (page.get("next") != null && !page.get("next").isNull) {
      page = performGet(page.get("next").asText())
      out ++= page.get("results").elements().asScala
    }
    out.toSeq
  }

  def fetchProject(projId: Int): (Map[Int, String], Seq[(Int, Int)], Map[Int, Map[Int, String]]) = {
    val dat = performGet(s"/projects/$projId")
    var labels = Map.empty[Int, String]
    var attributes = Map.empty[Int, Map[Int, String]]
    for (label <- allResults(dat.get("labels").get("url").asText())) {
      val id = label.get("id").asInt()
      labels += id -> label.get("name").asText().toLowerCase
      // ACCUMULATE the label's attributes. The reference replaces the
      // map per attribute (CvatApi.py:74 — only the LAST attribute of
      // each label survives, so e.g. 'Item ID' next to 'Text' silently
      // vanished from gt_attr). Deviation: keep them all.
      for (attr <- label.get("attributes").elements().asScala)
        attributes += id -> (attributes.getOrElse(id, Map.empty) +
          (attr.get("id").asInt() -> attr.get("name").asText()))
    }

    val jobIds = for {
      task <- allResults(dat.get("tasks").get("url").asText())
      job <- allResults(task.get("jobs").get("url").asText())
    } yield (job.get("task_id").asInt(), job.get("id").asInt())

    (labels, jobIds, attributes)
  }

  def fetchTaskMeta(taskId: Int): JsonNode = performGet(s"/tasks/$taskId/data/meta")

  /** Frame id → normalized image name: basename, extension replaced by
    * `.jpeg` (ref :106-109).
    */
  private def frameNames(jobId: Int): Map[Int, String] = {
    val job = performGet(s"/jobs/$jobId")
    val meta = fetchTaskMeta(job.get("task_id").asInt())
    meta.get("frames").elements().asScala.zipWithIndex.map { case (frame, i) =>
      val base = frame.get("name").asText().split('/').last
      val stem = base.lastIndexOf('.') match {
        case -1 => base
        case k => base.substring(0, k)
      }
      i -> (stem + ".jpeg")
    }.toMap
  }

  /** S7: per-job annotations → (tags, frame→name, shape tuples)
    * (ref :101-121). Shape: (frame, labelId, type, points, attrs).
    */
  def fetchAnnotations(jobId: Int): (Seq[(Int, Int)], Map[Int, String],
      Seq[(Int, Int, String, Seq[Double], Seq[(Int, String)])]) = {
    val images = frameNames(jobId)
    val dat = performGet(s"/jobs/$jobId/annotations")
    val tags = dat.get("tags").elements().asScala
      .map(t => (t.get("label_id").asInt(), t.get("frame").asInt())).toSeq
    val shapes = dat.get("shapes").elements().asScala.map { s =>
      (s.get("frame").asInt(), s.get("label_id").asInt(), s.get("type").asText(),
        s.get("points").elements().asScala.map(_.asDouble()).toSeq,
        attrs(s))
    }.toSeq
    (tags, images, shapes)
  }

  /** S7 track variant (ref :123-148): tracks are flattened into per-frame
    * shapes through [[graft.operators.TrackInterpolation]]; the end frame
    * is each track's max keyframe (ref :143). Shape rows gain track_id.
    */
  def fetchTrackAnnotations(jobId: Int): (Seq[(Int, Int)], Map[Int, String],
      Seq[(Int, Int, String, Seq[Double], Seq[(Int, String)], Int)]) = {
    import graft.operators.TrackInterpolation
    import graft.operators.TrackInterpolation.TrackShape
    val images = frameNames(jobId)
    val dat = performGet(s"/jobs/$jobId/annotations")
    val tags = dat.get("tags").elements().asScala
      .map(t => (t.get("label_id").asInt(), t.get("frame").asInt())).toSeq
    val shapes = for {
      track <- dat.get("tracks").elements().asScala.toSeq
      trackId = track.get("id").asInt()
      labelId = track.get("label_id").asInt()
      keyframes = track.get("shapes").elements().asScala.map(s => TrackShape(
        frame = s.get("frame").asInt(),
        shapeType = s.get("type").asText(),
        points = s.get("points").elements().asScala.map(_.asDouble()).toArray,
        outside = s.get("outside").asBoolean(),
        keyframe = false,
        attributes = attrs(s))).toSeq
      endFrame = keyframes.map(_.frame).max
      shape <- TrackInterpolation.interpolateShapes(
        track.get("frame").asInt(), keyframes, endFrame)
    } yield (shape.frame, labelId, shape.shapeType, shape.points.toSeq,
      shape.attributes, trackId)
    (tags, images, shapes)
  }

  private def attrs(s: JsonNode): Seq[(Int, String)] =
    Option(s.get("attributes")).map(_.elements().asScala.map(a =>
      (a.get("spec_id").asInt(), a.get("value").asText())).toSeq).getOrElse(Nil)

  /** S8: async bulk image export — request, poll until 201, download the
    * zip, extract entries under `images/` into outputDir/jobId
    * (ref :150-201). A connection failure mid-poll is NOT fatal: like the
    * reference's `try_get` (ref :152-156, "it keeps timing out halfway
    * through"), a dropped request is treated as one more poll tick —
    * sleep and retry — in both the export-status and the download loop.
    */
  def fetchJobImages(jobId: Int, outputDir: String, query: Map[String, String] = Map.empty): Unit = {
    require(Files.isDirectory(Paths.get(outputDir)), s"Directory $outputDir does not exist.")
    // URL-encode keys and values: a space/&/= in a caller-supplied
    // param would make URI.create throw or silently split the query
    def enc(s: String) =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val extra = if (query.nonEmpty)
      "&" + query.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    else ""
    val url = s"/jobs/$jobId/dataset?use_default_location=false&location=local&format=CVAT+for+images+1.1$extra"

    // consecutive connection failures are capped: the reference loops
    // forever ("it keeps timing out halfway through"), but a permanently
    // unreachable server should fail, not hang — any successful response
    // resets the counter
    var misses = 0
    def tryGet(u: String): Option[HttpResponse[Array[Byte]]] =
      try {
        val r = http.send(request(u), HttpResponse.BodyHandlers.ofByteArray())
        misses = 0
        Some(r)
      } catch {
        case e: java.io.IOException => // connection error → retry
          misses += 1
          if (misses > maxConnectRetries)
            throw new RuntimeException(
              s"$maxConnectRetries consecutive connection failures for $u", e)
          None
      }

    // Both poll loops are bounded by the same generous deadline
    // (maxStatusPolls × pollMillis ≈ 1 h at defaults): a server that
    // PERMANENTLY answers 202 (export never finishes) or non-200
    // (download always fails) must raise, not hang the driver — but a
    // TRANSIENT non-success (202 while the zip is being composed, a
    // 503 burst from a proxy) must not abort a bulk export the way the
    // tight consecutive-connect-failure cap would. Connection drops
    // remain separately capped at maxConnectRetries consecutive misses.
    var statusPolls = 0
    var resp = tryGet(url)
    // 202 = still composing; 5xx = the transient proxy burst the
    // scaladoc promises to ride out (one 503 must not abort a bulk
    // export) — both poll on, bounded by the shared deadline. A 4xx is
    // permanent and falls through to the 201 check immediately.
    while (resp.forall(r => r.statusCode() == 202 || r.statusCode() >= 500)) {
      statusPolls += 1
      if (statusPolls > maxStatusPolls)
        throw new RuntimeException(
          s"Export for job $jobId not ready after $statusPolls polls" +
            resp.map(r => s" (last status ${r.statusCode()})").getOrElse(" (no response)"))
      Thread.sleep(pollMillis); resp = tryGet(url)
    }
    if (resp.get.statusCode() != 201)
      throw new RuntimeException(s"Expected status code 201. Got ${resp.get.statusCode()} instead.")

    var dlPolls = 0
    var dl = tryGet(url + "&action=download")
    while (dl.forall(_.statusCode() != 200)) {
      dlPolls += 1
      if (dlPolls > maxStatusPolls)
        throw new RuntimeException(
          s"Download for job $jobId failed after $dlPolls attempts" +
            dl.map(r => s" (last status ${r.statusCode()})").getOrElse(" (no response)"))
      Thread.sleep(pollMillis); dl = tryGet(url + "&action=download")
    }
    val body = dl.get.body()

    val destRoot = Paths.get(outputDir, jobId.toString)
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(body))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName.toLowerCase.startsWith("images/") && !e.isDirectory) {
          val rel = e.getName.substring("images/".length)
          val dest = destRoot.resolve(rel).normalize()
          require(dest.startsWith(destRoot), s"zip entry escapes target dir: ${e.getName}")
          Files.createDirectories(dest.getParent)
          // overwrite: a retry after a mid-zip crash must replace the
          // partially-extracted files, not die on the first one
          Files.copy(zin, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
  }
}
