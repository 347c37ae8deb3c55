package graft

import graft.ingest.CvatClient
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S6/S7/S8 against an in-process HTTP stub: pagination, frame-name
  * normalization, track flattening, and the 202→201→download export
  * flow with zip extraction.
  */
class CvatClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val exportPolls = new AtomicInteger(0)
  private val pollAttempts101 = new AtomicInteger(0)
  private val dlAttempts101 = new AtomicInteger(0)

  private def json(x: HttpExchange, body: String, code: Int = 200): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b); x.close()
  }

  private def zipBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("images/frame_0.jpeg")); z.write("JPEGDATA0".getBytes)
    z.putNextEntry(new ZipEntry("images/sub/frame_1.jpeg")); z.write("JPEGDATA1".getBytes)
    z.putNextEntry(new ZipEntry("annotations.xml")); z.write("<x/>".getBytes)
    z.close(); bos.toByteArray
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    base = s"http://localhost:${server.getAddress.getPort}"
    def h(path: String)(f: HttpExchange => Unit): Unit =
      server.createContext(path, new HttpHandler { def handle(x: HttpExchange): Unit = f(x) })

    h("/projects/7") { x => json(x,
      s"""{"id":7,"labels":{"url":"$base/labels?project=7"},"tasks":{"url":"$base/tasks?project=7&page=1"}}""") }
    h("/labels") { x => json(x,
      """{"results":[{"id":11,"name":"DOG","attributes":[{"id":5,"name":"Item ID"},
                                                        {"id":6,"name":"Text"}]},
                     {"id":12,"name":"Cat","attributes":[]}]}""") }
    h("/tasks") { x =>
      val q = x.getRequestURI.getQuery
      if (q.contains("page=1"))
        json(x, s"""{"results":[{"id":1,"jobs":{"url":"$base/jobs?task_id=1"}}],"next":"$base/tasks?project=7&page=2"}""")
      else
        json(x, s"""{"results":[{"id":2,"jobs":{"url":"$base/jobs?task_id=2"}}],"next":null}""")
    }
    h("/jobs") { x =>
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      if (q.contains("task_id=1")) json(x, """{"results":[{"id":100,"task_id":1}]}""")
      else json(x, """{"results":[{"id":200,"task_id":2},{"id":201,"task_id":2}]}""")
    }
    h("/jobs/100") { x => json(x, """{"id":100,"task_id":1}""") }
    h("/tasks/1/data/meta") { x => json(x,
      """{"frames":[{"name":"dir/a_01.PNG"},{"name":"b_02.jpg"}]}""") }
    h("/jobs/100/annotations") { x => json(x,
      """{"tags":[{"label_id":11,"frame":0}],
          "shapes":[{"frame":0,"label_id":11,"type":"polygon",
                     "points":[0,0,4,0,4,4,0,4],
                     "attributes":[{"spec_id":5,"value":"42"}]}],
          "tracks":[{"id":9,"frame":0,"label_id":12,
            "shapes":[
              {"frame":0,"type":"polygon","points":[0,0,2,0,2,2,0,2],"outside":false,"attributes":[]},
              {"frame":2,"type":"polygon","points":[4,4,6,4,6,6,4,6],"outside":false,"attributes":[]}]}]}""") }
    h("/jobs/100/dataset") { x =>
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      if (q.contains("action=download")) {
        val b = zipBytes
        x.sendResponseHeaders(200, b.length); x.getResponseBody.write(b); x.close()
      } else if (exportPolls.incrementAndGet() < 3) json(x, "{}", 202)
      else json(x, "{}", 201)
    }
    // job 102: export reports 201 but the download permanently 404s
    h("/jobs/102/dataset") { x =>
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      if (q.contains("action=download")) json(x, "{}", 404)
      else json(x, "{}", 201)
    }
    // job 103: export permanently stuck at 202
    h("/jobs/103/dataset") { x => json(x, "{}", 202) }
    // job 101: FIRST status request and FIRST download request both drop
    // the connection (close with no response) — the client must retry
    h("/jobs/101/dataset") { x =>
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      if (q.contains("action=download")) {
        if (dlAttempts101.incrementAndGet() == 1) x.close()
        else {
          val b = zipBytes
          x.sendResponseHeaders(200, b.length); x.getResponseBody.write(b); x.close()
        }
      } else {
        if (pollAttempts101.incrementAndGet() == 1) x.close()
        else json(x, "{}", 201)
      }
    }
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def client = new CvatClient(base + "/", Map("Authorization" -> "Token t"),
    timeoutSeconds = 5, pollMillis = 10L)

  test("fetchProject: labels lowercased, tasks paginated, jobs flattened (S6)") {
    val (labels, jobIds, attrs) = client.fetchProject(7)
    assert(labels == Map(11 -> "dog", 12 -> "cat"))
    assert(jobIds == Seq((1, 100), (2, 200), (2, 201)))
    // BOTH attributes of label 11 survive — the reference kept only
    // the last one per label (documented deviation)
    assert(attrs == Map(11 -> Map(5 -> "Item ID", 6 -> "Text")))
  }

  test("fetchAnnotations: frame names normalized, shapes and attrs parsed (S7)") {
    val (tags, images, shapes) = client.fetchAnnotations(100)
    assert(tags == Seq((11, 0)))
    assert(images == Map(0 -> "a_01.jpeg", 1 -> "b_02.jpeg")) // basename + .jpeg
    assert(shapes.length == 1)
    val s = shapes.head
    assert(s._1 == 0 && s._2 == 11 && s._3 == "polygon")
    assert(s._4 == Seq(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0))
    assert(s._5 == Seq((5, "42")))
  }

  test("fetchTrackAnnotations: tracks flattened through interpolation (S7)") {
    val (_, _, shapes) = client.fetchTrackAnnotations(100)
    // keyframes at 0 and 2 → interpolated frame 1 appears. NB the
    // reference quirk is preserved: end_frame = max keyframe
    // (CvatApi.py:143) and the clip is frame < end_frame (:723), so the
    // FINAL keyframe itself is dropped from the flattened track.
    assert(shapes.map(_._1) == Seq(0, 1))
    assert(shapes.forall(_._6 == 9)) // track_id carried
    val mid = shapes(1)._4
    assert(mid.take(2) == Seq(2.0, 2.0)) // halfway between 0,0 and 4,4
  }

  test("fetchJobImages: polls 202→201, downloads, extracts images/ (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("cvat").toString
    client.fetchJobImages(100, dir)
    val p0 = java.nio.file.Paths.get(dir, "100", "frame_0.jpeg")
    val p1 = java.nio.file.Paths.get(dir, "100", "sub", "frame_1.jpeg")
    assert(new String(java.nio.file.Files.readAllBytes(p0)) == "JPEGDATA0")
    assert(new String(java.nio.file.Files.readAllBytes(p1)) == "JPEGDATA1")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "100", "annotations.xml")))
    assert(exportPolls.get() >= 3) // really polled through 202s
  }

  test("fetchJobImages: dropped connections on poll and download are retried (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("cvat-retry").toString
    client.fetchJobImages(101, dir) // would throw without the retry path
    val p0 = java.nio.file.Paths.get(dir, "101", "frame_0.jpeg")
    assert(new String(java.nio.file.Files.readAllBytes(p0)) == "JPEGDATA0")
    assert(pollAttempts101.get() >= 2, "first poll must have been retried")
    assert(dlAttempts101.get() >= 2, "first download must have been retried")
  }

  test("fetchJobImages: a permanently-404 download raises instead of hanging (S8)") {
    val bounded = new CvatClient(base + "/", Map.empty,
      timeoutSeconds = 5, pollMillis = 1L, maxConnectRetries = 3, maxStatusPolls = 5)
    val dir = java.nio.file.Files.createTempDirectory("cvat-404").toString
    val e = intercept[RuntimeException] { bounded.fetchJobImages(102, dir) }
    assert(e.getMessage.contains("404"), e.getMessage)
  }

  test("fetchJobImages: an export stuck at 202 raises instead of hanging (S8)") {
    val bounded = new CvatClient(base + "/", Map.empty,
      timeoutSeconds = 5, pollMillis = 1L, maxConnectRetries = 3, maxStatusPolls = 5)
    val dir = java.nio.file.Files.createTempDirectory("cvat-202").toString
    val e = intercept[RuntimeException] { bounded.fetchJobImages(103, dir) }
    assert(e.getMessage.contains("202"), e.getMessage)
  }
}
