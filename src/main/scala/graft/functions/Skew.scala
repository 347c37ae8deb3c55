package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Skew-salted equi-join (SCALE.md): when one join key dominates (a
  * celebrity image, a stop-category), the shuffle partition holding it
  * becomes the straggler. Salting splits the hot key's rows across
  * `saltFactor` sub-partitions and replicates the (small) build side
  * once per salt — a uniform shuffle at the cost of a saltFactor×
  * build-side copy. AQE's skew-join handles sort-merge cases
  * automatically; this helper is for when the build side is
  * broadcast-sized and the salt must be explicit.
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `bigKey` ==
    * `smallKey`, salted `saltFactor` ways. Result equals the unsalted
    * join (SkewSpec proves it). The salt is derived from ROW CONTENT
    * (hash of every big-side column), not monotonically_increasing_id:
    * a content hash is stable under task retry and stage recomputation,
    * so no reliance on indeterminate-stage rollback. Caveat: rows that
    * are bit-identical land on one salt — append a distinguishing key
    * column upstream if the hot key's rows are full duplicates.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    // the internal salt column must not clobber (and later drop) a real
    // user column — the operators.Salt.graft_salt rule
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not already carry a '_salt' column")
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    val joined = salted.join(replicated,
      salted(bigKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"))
    // equal key names would leave two identically-named columns and an
    // AMBIGUOUS_REFERENCE on any downstream col(bigKey) — keep big's
    (if (bigKey == smallKey) joined.drop(replicated(smallKey)) else joined)
      .drop("_salt")
  }
}
