package graft

import graft.lake.Compaction

/** lake.Compaction: the file-count law (ceil(bytes/target)), content
  * preservation in both modes, and that even-mode actually evens sizes
  * on a skewed input where coalesce cannot.
  */
class CompactionSpec extends SparkSpec {

  private def fragmented(nShards: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("compact-in").toString
    spark.read.parquet(s"${sf()}/orders.parquet")
      .repartition(nShards).write.mode("overwrite").parquet(dir)
    dir
  }

  private def out(): String =
    java.nio.file.Files.createTempDirectory("compact-out").toString

  test("coalesce mode: ceil(bytes/target) files, content preserved") {
    val in = fragmented(32)
    val o = out()
    val stats = Compaction.compact(spark, in, o, targetBytes = 64L << 10)
    assert(stats.filesBefore == 32)
    // coalesce cannot SPLIT partitions, so the file-count law caps at the
    // input shard count: a bigger generated orders file (larger test SF)
    // pushes ceil(bytes/target) past 32 without changing filesAfter
    val wantFiles =
      math.min(math.ceil(stats.bytesBefore.toDouble / (64L << 10)).toInt,
        stats.filesBefore)
    assert(stats.filesAfter == wantFiles,
      s"expected $wantFiles files for ${stats.bytesBefore} bytes, got ${stats.filesAfter}")
    if (wantFiles < stats.filesBefore)
      assert(stats.filesAfter < stats.filesBefore, "compaction must reduce file count")
    val a = spark.read.parquet(in).orderBy("o_orderkey").collect().toSeq
    val b = spark.read.parquet(o).orderBy("o_orderkey").collect().toSeq
    assert(a == b, "compaction must be a pure layout rewrite")
  }

  test("even mode: same content, sizes spread within 2x of each other") {
    val in = fragmented(32)
    val o = out()
    val stats = Compaction.compact(spark, in, o, targetBytes = 64L << 10, even = true)
    assert(stats.filesAfter >= 2, "need >=2 outputs to check evenness")
    val fs = new org.apache.hadoop.fs.Path(o)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(o))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen)
    assert(sizes.max <= 2 * sizes.min,
      s"round-robin outputs should be near-even: ${sizes.mkString(",")}")
    assert(spark.read.parquet(o).count() == spark.read.parquet(in).count())
  }

  test("already-compact input is a no-op-sized rewrite (1 file)") {
    val in = fragmented(1)
    val stats = Compaction.compact(spark, in, out(), targetBytes = 1L << 30)
    assert(stats.filesAfter == 1)
  }

  test("partitioned tree: leaves compact in place, partition columns survive") {
    val in = java.nio.file.Files.createTempDirectory("compact-tree-in").toString
    spark.read.parquet(s"${sf()}/orders.parquet")
      .repartition(8).write.mode("overwrite").partitionBy("o_orderstatus").parquet(in)
    val o = out()
    val perLeaf = Compaction.compactTree(spark, in, o, targetBytes = 1L << 30)
    assert(perLeaf.nonEmpty && perLeaf.forall(_._2.filesAfter == 1),
      s"each leaf should compact to 1 file at a 1 GB target: $perLeaf")
    assert(perLeaf.map(_._1).forall(_.startsWith("o_orderstatus=")),
      s"relative paths must be partition dirs: ${perLeaf.map(_._1)}")
    val a = spark.read.option("basePath", in).parquet(in)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = spark.read.option("basePath", o).parquet(o)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "per-partition contents must survive the rewrite")
  }
}
