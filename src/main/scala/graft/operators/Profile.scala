package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass(ish) column profiling — the "what is in this table"
  * primitive a pipeline runs before trusting a new 100 TB drop: per
  * column, row count, null count, distinct count, and min/max. Nothing
  * data-sized ever reaches the driver; however many columns are
  * profiled, the data is read a bounded number of times:
  *
  *  - `exact = false` (the 100 TB mode): ONE column-pruned scan. All
  *    counts, bounds, and HyperLogLog NDVs compute in a single
  *    partial-aggregated pass — a ±2% NDV answers the profiling
  *    question at a fraction of the cost.
  *  - `exact = true` (the oracle-checkable mode): TWO column-pruned
  *    scans. Exact multi-column NDV compiles to the Expand rewrite
  *    (#cols× row expansion, grouped by value), and FUSING it with the
  *    string-rendered min/max forces the whole expanded stream through
  *    sort-based aggregation (string agg buffers are immutable, so
  *    HashAggregate is off the table) — measured 2× slower than
  *    splitting. Split, the NDV pass stays HashAggregate over the
  *    Expand and the plain pass is an ordinary partial aggregate; the
  *    two 1-row results join for free.
  *
  * Min/max are rendered as strings so one schema profiles every column
  * type; exact numeric bounds stay exact because the cast happens after
  * the aggregate, not before.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    require(cols.distinct.length == cols.length,
      s"duplicate profile columns: ${cols.diff(cols.distinct).mkString(", ")}")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val plainAggs = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
          min(col(c)).cast("string").as(s"_min_$c"),
          max(col(c)).cast("string").as(s"_max_$c"))
    }
    val ndAggs = cols.map { c =>
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c))).as(s"_nd_$c")
    }
    val one =
      if (exact)
        // two 1-row frames; the join is a broadcast nested loop of 1×1
        df.agg(plainAggs.head, plainAggs.tail: _*)
          .crossJoin(df.agg(ndAggs.head, ndAggs.tail: _*))
      else
        df.agg(plainAggs.head, (plainAggs.tail ++ ndAggs): _*)
    val rows = cols.map(c => struct(
      lit(c).as("col_name"),
      col("_n").as("n"),
      (col("_n") - col(s"_nn_$c")).as("n_null"),
      col(s"_nd_$c").as("n_distinct"),
      col(s"_min_$c").as("min_s"),
      col(s"_max_$c").as("max_s")))
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("col_name")
  }
}
