package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract invariants over the whole query surface — the exact failure
  * mode that killed round 1 (a pack referenced but not present) and the
  * silent ones the driver gate would surface late.
  */
class QueryPackSpec extends AnyFunSuite {

  test("every oracle key has a query definition") {
    val defs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(defs)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("query names are globally unique across packs") {
    val packs = Seq(
      graft.queries.CoreQueries, graft.queries.JoinQueries,
      graft.queries.SampleQueries, graft.queries.WindowQueries,
      graft.queries.GeomQueries, graft.queries.ExportQueries,
      graft.queries.StringQueries, graft.queries.TextQueries,
      graft.queries.DedupQueries, graft.queries.SimQueries,
      graft.queries.MmQueries, graft.queries.InterpQueries,
      graft.queries.StreamQueries)
    val all = packs.flatMap(_.defs.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("fixture prebuilder registry names only real gates, and every fixture consumer is registered") {
    // Bench's untimed fixture pre-pass builds the kinds the SELECTED
    // queries consume; a name drifting out of SparkEntry.queries would
    // silently stop pre-building (the build cost would re-land in the
    // first consumer's timed window — the exact r16 artifact bug)
    val known = SparkEntry.queries.keySet
    for ((kind, (users, _)) <- graft.queries.Fixtures.prebuilders) {
      val gone = users.diff(known)
      assert(gone.isEmpty, s"prebuilders[$kind] names unknown gates: $gone")
    }
    // and the reverse: every query-pack source line calling a shared
    // fixture builder belongs to a gate the registry lists (source-scan
    // heuristic: Fixtures.<kind>( usage inside queries/*.scala)
    val packDir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val byKind = Map("zEvents" -> "zevents", "bm25" -> "bm25",
      "ivf" -> "ivf", "bucketedOrders" -> "borders",
      "catalogRoot" -> "catroot")
    val src = java.nio.file.Files.list(packDir).iterator()
    val gateRe = """"([a-z0-9_]+)" -> \(\(s, d\)""".r
    src.forEachRemaining { p =>
      if (p.toString.endsWith(".scala")) {
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        for ((call, kind) <- byKind; m <- s"Fixtures\\.$call\\(".r
               .findAllMatchIn(text)) {
          // the gate this call sits inside = the nearest preceding def
          val before = text.substring(0, m.start)
          gateRe.findAllMatchIn(before).toSeq.lastOption.foreach { g =>
            val gate = g.group(1)
            assert(graft.queries.Fixtures.prebuilders(kind)._1.contains(gate),
              s"$gate consumes fixture '$kind' but is missing from " +
                s"Fixtures.prebuilders — its first bench run would absorb the build")
          }
        }
      }
    }
  }

  test("oracle SQL contains no reference-proprietary strings") {
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(!sql.toLowerCase.contains("permaling"), s"$name leaks a reference URL")
    }
  }

  test("flagship entry query is defined") {
    assert(SparkEntry.queries.contains("q1_agg"))
  }
}
