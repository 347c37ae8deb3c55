package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: a query takes the session and the scale-factor dir. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** A pack couples Spark queries with their DuckDB oracle SQL. Keys of
    * `oracle` must be a subset of keys of `defs`; queries without oracle
    * SQL get a weaker rows-only check from the driver.
    */
  trait QueryPack {
    def defs: Map[String, QueryFn]
    def oracle: Map[String, String]
  }

  /** Write `batches` into `src` as one file each, with STRICTLY ordered
    * modification times (60 s apart, newest = now), so a file-source
    * stream with maxFilesPerTrigger=1 replays them as micro-batches in
    * exactly this order. Stamping the times explicitly replaces the
    * 1.1 s sleep-between-writes the same determinism used to cost
    * (file-source ordering is by mod time, and some filesystems round
    * it to whole seconds — 60 s gaps are safe everywhere).
    */
  def writeOrderedBatches(src: String, batches: Seq[DataFrame]): Unit = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(src)
    val now = System.currentTimeMillis()
    var seen = Set.empty[String]
    batches.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode("append").parquet(src)
      val listing = Files.list(dir)
      val all =
        try listing.iterator().asScala.map(_.getFileName.toString).toSet
        finally listing.close()
      val stamp = FileTime.fromMillis(now - 60000L * (batches.size - 1 - i))
      (all -- seen).filter(_.startsWith("part-")).foreach(f =>
        Files.setLastModifiedTime(dir.resolve(f), stamp))
      seen = all
    }
  }
}
