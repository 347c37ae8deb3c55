package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator (plus the ext
  * operators) to a DataFrame program over the testdata tables; `oracleSql`
  * carries the DuckDB-equivalent SQL for the hash-compare gate. Queries
  * whose semantics are not SQL-expressible (seeded ML ops, UDF geometry)
  * appear only in `queries` and get the driver's rows-only check.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    CoreQueries,
    JoinQueries,
    SampleQueries,
    WindowQueries,
    GeomQueries,
    ExportQueries,
    StringQueries,
    TextQueries,
    DedupQueries,
    SimQueries,
    MmQueries,
    InterpQueries,
    StreamQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
