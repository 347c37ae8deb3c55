package graft

import org.apache.spark.sql.SparkSession

/** Listing-cost diagnostic for [[graft.lake.FileStats.walkTree]]
  * (VERDICT r18 #6): times the parallel tree walk over (a) a real
  * corpus dir and (b) a synthetic WIDE tree (many directories, the
  * shape where per-dir listing RPCs dominate and the 16-way pool
  * pays). Prints one line per tree; SCALE.md records the numbers.
  *
  * Usage: graft.WalkBench [corpusDir=/tmp/graft-sf10-full] [dirs=2000] [filesPerDir=5]
  */
object WalkBench {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/tmp/graft-sf10-full")
    val nDirs = args.lift(1).map(_.toInt).getOrElse(2000)
    val perDir = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    if (new java.io.File(corpus).isDirectory) {
      val (fp1, t1) = time(graft.lake.FileStats.treeFingerprint(spark, corpus))
      val (_, t2) = time(graft.lake.FileStats.treeFingerprint(spark, corpus))
      println(f"WALK corpus=$corpus files=${fp1.split(":")(1)} " +
        f"pass1=$t1%.2fs pass2=$t2%.2fs")
    }
    val base = java.nio.file.Files.createTempDirectory("walkwide").toString
    for (i <- 0 until nDirs) {
      val dir = java.nio.file.Paths.get(s"$base/p$i")
      java.nio.file.Files.createDirectories(dir)
      for (j <- 0 until perDir)
        java.nio.file.Files.writeString(dir.resolve(s"f$j.parquet"), "x" * 10)
    }
    val (_, tw) = time(graft.lake.FileStats.treeFingerprint(spark, base))
    val (_, tw2) = time(graft.lake.FileStats.treeFingerprint(spark, base))
    println(f"WALK synthetic dirs=$nDirs filesPerDir=$perDir " +
      f"pass1=$tw%.2fs pass2=$tw2%.2fs")
    spark.stop()
  }
}
