package graft

import graft.lake.Lake
import graft.schemas.Schemas
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** S1/S2/S3/S5 round-trip: partitioned append write → declared + inferred
  * reads → partition manifest; plus partition-pruning assertion on the
  * partition key (the reference's read-path perf story,
  * TrainDatasets.py:151,157 + :183-189).
  */
class LakeSpec extends SparkSpec {

  private def tmpDir = Files.createTempDirectory("graft-lake").toString

  private def annoFixture = {
    val rows = (1 to 20).map { i =>
      Row(i.toLong % 3, i.toLong, i.toLong % 2, -1L, s"img_$i.jpg", "label",
        Seq(1f, 2f, 3f, 4f, 5f, 6f), null, null, i.toLong, """[{"iid": 1}]""",
        Timestamp.valueOf("2024-01-01 00:00:00"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), Schemas.anno)
  }

  test("S3 write → S1 declared read round-trips rows and schema") {
    val dir = tmpDir
    val lake = new Lake(spark)
    lake.appendPartitioned(annoFixture, dir, Seq("project_id", "job_id"))
    val back = lake.readDeclared(dir, Schemas.anno)
    assert(back.count() == 20)
    // partition cols come back as columns; a value survives the round trip
    val r = back.filter(col("image_name") === "img_7.jpg")
      .select("project_id", "job_id", "gt_iid").collect()
    assert(r.toSeq.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))) == Seq((1L, 1L, 7L)))
  }

  test("S2 inferred read discovers partition columns with inferred types") {
    val dir = tmpDir
    val lake = new Lake(spark)
    lake.appendPartitioned(annoFixture, dir, Seq("project_id", "job_id"))
    val back = lake.readInferred(dir)
    assert(back.columns.contains("project_id") && back.columns.contains("job_id"))
    assert(back.count() == 20)
  }

  test("S5 manifest lists distinct partition tuples without reading data") {
    val dir = tmpDir
    val lake = new Lake(spark)
    lake.appendPartitioned(annoFixture, dir, Seq("project_id", "job_id"))
    val manifest = new Lake(spark).partitions(dir, Seq("project_id", "job_id"))
    val tuples = manifest.collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    assert(tuples == Set(("0","0"), ("0","1"), ("1","0"), ("1","1"), ("2","0"), ("2","1")))
  }

  test("partition filter prunes partitions at the scan") {
    val dir = tmpDir
    val lake = new Lake(spark)
    lake.appendPartitioned(annoFixture, dir, Seq("project_id", "job_id"))
    val df = lake.readInferred(dir).filter(col("project_id") === 1)
    val scan = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.metadata.getOrElse("PartitionFilters", "")
      case b: BatchScanExec => b.toString
    }.mkString(";")
    assert(scan.contains("project_id"), s"no partition filter at scan: $scan")
    assert(df.count() == 7) // i%3==1 for i in 1..20
  }
}
