package graft

import graft.export.{FileSink, Yolo, Coco}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** FileSink tiers (S9/S11 sinks): bare paths stay on the historical
  * java.nio behavior; scheme-qualified paths write through the Hadoop
  * FileSystem API — proven here end-to-end with a `file:` scheme URI,
  * including a real distributed (foreachPartition) export, so HDFS /
  * object stores work without a FUSE mount.
  */
class FileSinkSpec extends SparkSpec {
  import spark.implicits._

  test("bare path → nio tier; per-row files with subdirectories") {
    val dir = Files.createTempDirectory("sinknio").toString
    val sink = FileSink.forPath(spark, dir)
    assert(sink.getClass.getSimpleName == "NioSink")
    sink.prepare()
    sink.write("a/b.jpeg", Array[Byte](1, 2, 3))
    assert(Files.readAllBytes(Paths.get(dir, "a/b.jpeg")).toSeq == Seq[Byte](1, 2, 3))
  }

  test("file:-scheme path → Hadoop tier; write + overwrite + subdirs") {
    val dir = Files.createTempDirectory("sinkhfs")
    val sink = FileSink.forPath(spark, dir.toUri.toString)
    assert(sink.getClass.getSimpleName == "HadoopSink")
    sink.prepare()
    sink.write("x/y.txt", "one".getBytes)
    sink.write("x/y.txt", "two".getBytes) // idempotent overwrite, like task retries
    assert(Files.readString(dir.resolve("x/y.txt")) == "two")
  }

  test("HadoopSink survives closure serialization with the driver's conf") {
    val dir = Files.createTempDirectory("sinkser")
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "carried")
    val sink = FileSink.forPath(spark, dir.toUri.toString)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(sink); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
      .asInstanceOf[FileSink]
    back.write("z.bin", Array[Byte](7))
    assert(Files.readAllBytes(dir.resolve("z.bin")).toSeq == Seq[Byte](7))
  }

  test("COCO document through a file:-scheme URI matches the nio bytes") {
    val annos = Seq(
      ("img_a", "cat", 1L, Seq(0.0, 0.0, 8.0, 0.0, 8.0, 4.0, 0.0, 4.0), Seq(0.0, 0.0, 8.0, 4.0, 0.0))
    ).toDF("image_name", "category", "anno_key", "segmentation", "rcoco")
      .withColumn("rbox", col("segmentation"))
    val images = Seq(("img_a", 640L, 480L)).toDF("image_name", "width", "height")
    val dir = Files.createTempDirectory("cocouri")
    val nioOut = dir.resolve("nio.json")
    val hfsOut = dir.resolve("hfs.json")
    Coco.writeCocoDataset(annos, images, "anno_key", nioOut.toString)
    graft.operators.SeqIds.releaseAll()
    Coco.writeCocoDataset(annos, images, "anno_key", hfsOut.toUri.toString)
    graft.operators.SeqIds.releaseAll()
    assert(Files.readString(hfsOut) == Files.readString(nioOut))
    assert(Files.readString(nioOut).startsWith("""{"info":"""))
  }

  test("YOLO export through a file:-scheme URI matches the nio tree") {
    val annos = Seq(
      ("img_b", "dog", 1L, Seq(0.0, 0.0, 10.0, 0.0, 10.0, 6.0, 0.0, 6.0), Seq(0.0, 0.0, 10.0, 6.0, 0.0)),
      ("img_a", "cat", 2L, Seq(5.0, 5.0, 25.0, 5.0, 25.0, 15.0, 5.0, 15.0), Seq(5.0, 5.0, 20.0, 10.0, 0.0))
    ).toDF("image_name", "category", "anno_key", "segmentation", "rcoco")
    val images = Seq(("img_a", 640L, 480L), ("img_b", 320L, 240L))
      .toDF("image_name", "width", "height")
    val catMap = Coco.categoryDim(annos)

    val nioDir = Files.createTempDirectory("yolonio").toString
    Yolo.writeYoloDataset(annos, images, catMap, "anno_key", nioDir)
    val hfsDir = Files.createTempDirectory("yolohfs")
    Yolo.writeYoloDataset(annos, images, catMap, "anno_key", hfsDir.toUri.toString)

    val nioFiles = new java.io.File(nioDir).listFiles().map(_.getName).sorted
    val hfsFiles = hfsDir.toFile.listFiles().map(_.getName).sorted.filterNot(_.startsWith("."))
    assert(nioFiles.toSeq == Seq("img_a.txt", "img_b.txt"))
    assert(hfsFiles.toSeq == nioFiles.toSeq, "tier trees diverge")
    for (f <- nioFiles)
      assert(Files.readString(Paths.get(nioDir, f)) == Files.readString(hfsDir.resolve(f)),
        s"tier content diverges for $f")
  }
}
