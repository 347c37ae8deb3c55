package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** JSONL exporter: rendered-line fidelity (the gate hash-checks it
  * against DuckDB), the written tree (shard count, in-shard id order),
  * and the round trip back through Spark's JSON reader.
  */
class JsonlSpec extends SparkSpec {

  test("writeJsonl shards by id range, sorts within shards, round-trips") {
    val s = spark
    import s.implicits._
    val docs = (0L until 100L).map(i =>
      (i, s"""word$i "quoted" and \\ slash""", "en", "test", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft-jsonl").toString
    export.Jsonl.writeJsonl(docs, out, nShards = 4)

    val files = Files.list(Paths.get(out)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".txt")).toSeq.sorted
    assert(files.size == 4, s"expected 4 shard files, got: $files")

    // each shard is internally id-sorted and shards hold disjoint
    // contiguous ranges (range partitioning, not hash)
    val perShard = files.map { f =>
      val ids = Files.readAllLines(Paths.get(f)).asScala
        .map(l => ujsonId(l)).toSeq
      assert(ids == ids.sorted, s"shard $f not id-sorted")
      (ids.min, ids.max)
    }
    val ranges = perShard.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping shards: $ranges")
      case _ =>
    }

    // round trip: Spark's JSON reader recovers every field exactly
    // (quotes and backslashes included)
    val back = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING")
      .json(out)
    val got = back.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val exp = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == exp.toSeq)
  }

  /** doc_id from a rendered line without a JSON library (the field is
    * first and numeric by construction).
    */
  private def ujsonId(line: String): Long = {
    val m = """\{"doc_id":(\d+),""".r.findFirstMatchIn(line)
    m.map(_.group(1).toLong).getOrElse(fail(s"no doc_id in: $line"))
  }
}
