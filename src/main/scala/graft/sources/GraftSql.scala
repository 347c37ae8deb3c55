package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit

import graft.lake.{BucketedUpsert, Routing}

/** One SQL registration call for EVERY graft table shape (VERDICT r19
  * #3) — the documented answer to "a SQL user with a fragmented table
  * got an error naming a Scala API":
  *
  * {{{  GraftSql.registerView(spark, root, "t")  }}}
  *
  * Shapes the scan-only DSv2 source serves natively (plain routed
  * trees, unfragmented bucketed tables, delete versions with their DV
  * mask) register as `graft`-format views — full pushdown, routing,
  * partitioning claim. A FRAGMENTED bucketed table — the one shape
  * whose per-key version resolution exceeds a scan — registers as the
  * library's RESOLVED read ([[Routing.readWhere]] with a true
  * predicate: fragment resolution through the manifest's recorded
  * version column, then Catalyst's own pushdown over the resolved
  * plan). Either way the SQL user gets correct rows under one name;
  * the difference is only which engine face serves them, and
  * re-registering after compaction (`mergeFragmentsIfNeeded`) upgrades
  * the view to the routed scan.
  */
object GraftSql {

  /** Register (or reuse) a [[GraftCatalog]] over `root` and return its
    * catalog name — DERIVED FROM THE ROOT, never fixed: Spark's
    * CatalogManager caches the plugin instance per name at first load
    * and ignores later conf updates, so a fixed name silently pins
    * every later use in the session to the FIRST root it saw (review
    * r20 found the bench's small-scale warmup doing exactly that to
    * the timed catalog gates). One root, one name, forever-valid
    * binding. */
  def registerCatalog(spark: SparkSession, root: String): String = {
    val name = "graft_" + java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(root))
    // a 32-bit name collision between two DIFFERENT roots would let
    // the cached instance serve the wrong table silently — read back
    // before overwriting and fail LOUD instead (review r20 pass 2)
    val prev = spark.conf.getOption(s"spark.sql.catalog.$name.root")
    require(prev.forall(_ == root),
      s"catalog name '$name' is already bound to root ${prev.get} — " +
        s"hash collision with $root; register this root under an " +
        "explicit name via spark.sql.catalog.<name> instead")
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  /** Register the table at `root` as temp view `name`, picking the
    * strongest engine face its shape allows. Returns the face chosen:
    * `"graft"` (DSv2 routed scan) or `"resolved"` (library
    * merge-on-read plan). */
  def registerView(spark: SparkSession, root: String, name: String): String = {
    val fragmented = Routing.isBucketed(spark, root) &&
      BucketedUpsert.isFragmented(spark, root)
    if (fragmented) {
      Routing.readWhere(spark, root, lit(true)).createOrReplaceTempView(name)
      "resolved"
    } else {
      spark.read.format("graft").load(root).createOrReplaceTempView(name)
      "graft"
    }
  }
}
