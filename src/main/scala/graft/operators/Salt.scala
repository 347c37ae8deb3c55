package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-salting for shuffle equi-joins.
  *
  * When one fact key is hot, a plain shuffle join sends every row of
  * that key to ONE reducer — the straggler that dominates the stage at
  * 100 TB. Salting splits each key's rows across `salts` reducers:
  * the fact side gets a deterministic salt in [0, salts), the dim side
  * is replicated once per salt value, and the join key becomes
  * (key, salt). The join result is row-for-row identical to the unsalted
  * join (each fact row still meets exactly its key's dim rows, via
  * exactly one salt), which the j12 oracle pins with a hash-green gate.
  *
  * AQE's skew-join handles the sort-merge case adaptively; this operator
  * is for the cases AQE does not reach — shuffle-hash joins, skew known
  * ahead of time, or a downstream aggregation that should inherit the
  * spread partitioning.
  *
  * The dim side carries a shuffle_hash hint: salting only matters when
  * the dim is too large to broadcast (replicating it `salts`× through a
  * broadcast would be strictly worse), so the operator pins the
  * shuffle-join path it is designed for.
  */
object Salt {

  /** Inner equi-join of `fact` to `dim` on `key` (the column must exist
    * with the same name on both sides), spread over `salts` reducers per
    * key. `factSaltSeed` must be deterministic per fact row (e.g. a hash
    * of the row's unique id) so reruns shuffle identically; it does NOT
    * affect the join result, only the spread.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 factSaltSeed: Column): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    // the internal salt column must not clobber (and later drop) a real
    // user column of the same name on either input
    require(!fact.columns.contains("graft_salt") && !dim.columns.contains("graft_salt"),
      "inputs must not already carry a 'graft_salt' column")
    // coalesce: a NULL seed (nullable seed column) must still salt the
    // row — pmod(null, n) is null and a null join key would silently
    // DROP the fact row, breaking the row-for-row equivalence with the
    // unsalted join; bucket 0 is as good as any for a null seed
    val saltedFact = fact.withColumn("graft_salt",
      pmod(coalesce(factSaltSeed, lit(0)), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact
      .join(saltedDim.hint("shuffle_hash"), Seq(key, "graft_salt"))
      .drop("graft_salt")
  }
}
