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

  test("oracle SQL contains no reference-proprietary strings") {
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(!sql.toLowerCase.contains("permaling"), s"$name leaks a reference URL")
    }
  }

  test("flagship entry query is defined") {
    assert(SparkEntry.queries.contains("q1_agg"))
  }
}
