package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import scala.jdk.CollectionConverters._

/** Z-order clustering: kernel correctness (known values + agreement
  * with a naive bit-loop reference) and the file-skipping property the
  * layout exists for, measured on a written tree.
  */
class ZOrderSpec extends SparkSpec with TableDrivenPropertyChecks {

  private def naiveMorton(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("morton2 known values and agreement with the naive bit loop") {
    assert(plans.ZOrderKernel.morton2(0, 0) == 0L)
    assert(plans.ZOrderKernel.morton2(1, 0) == 1L)
    assert(plans.ZOrderKernel.morton2(0, 1) == 2L)
    assert(plans.ZOrderKernel.morton2(3, 1) == 7L)
    assert(plans.ZOrderKernel.morton2(2, 2) == 12L)
    val rnd = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      val a = rnd.nextLong() & 0xFFFFFFFFL
      val b = rnd.nextLong() & 0xFFFFFFFFL
      assert(plans.ZOrderKernel.morton2(a, b) == naiveMorton(a, b))
    }
    // high bits beyond 32 are ignored by contract
    assert(plans.ZOrderKernel.morton2(1L << 40, 0) == 0L)
  }

  test("z-ordered files prune a single-dim range predicate; x-sorted cannot") {
    val s = spark
    import s.implicits._
    // 64×64 grid; 16 files of 256 rows each. Z-ordering makes each
    // file a 16×16 quadrant block, so y IN [8,15] is coverable by the
    // 4 blocks of the bottom row; an x-sorted layout gives every file
    // the FULL y range, so zero files are skippable for a y predicate.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val xDir = Files.createTempDirectory("graft-xsort").toString
    lake.ZOrder.writeZOrdered(grid, zDir, 16, "x", "y")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def overlapping(dir: String, yLo: Long, yHi: Long): Int = {
      val files = Files.list(Paths.get(dir)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq
      assert(files.size == 16, s"expected 16 files in $dir, got ${files.size}")
      files.count { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).collect()(0)
        r.getLong(0) <= yHi && r.getLong(1) >= yLo
      }
    }

    val zFiles = overlapping(zDir, 8, 15)
    val xFiles = overlapping(xDir, 8, 15)
    assert(zFiles <= 4, s"z-order should bound y∈[8,15] to ≤4 quadrant files, got $zFiles")
    assert(xFiles == 16, s"x-sorted layout cannot prune on y, got $xFiles")
    // and the data survives the layout intact
    val n = spark.read.parquet(zDir).filter(col("y").between(8, 15)).count()
    assert(n == 64 * 8)
  }
}
