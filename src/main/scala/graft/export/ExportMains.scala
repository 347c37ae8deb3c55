package graft.export

import graft.lake.Feather
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S12: CLI entry points for the two exporters (ref
  * create_coco_from_feather.py:119-134, create_yolo_from_feather.py:73-86).
  * Inputs may be parquet directories or .feather files (S4). The
  * reference YOLO CLI forgets its required cat_map argument (:86, a
  * bug); per SURVEY §2.1 S12 we implement the function signature —
  * the category map is derived from the annotations.
  */
object ExportMains {

  /** getOrCreate may hand back a caller-owned session (tests, notebooks)
    * — only stop what we created.
    */
  private def withSession[T](f: SparkSession => T): T = {
    val preExisting = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(spark) finally if (!preExisting) spark.stop()
  }

  private def load(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".feather")) Feather.read(spark, path)
    else spark.read.parquet(path)

  /** args: annoPath imagesPath outputJson [--train] [--d2] */
  object CocoMain {
    def main(args: Array[String]): Unit = {
      val pos = args.filterNot(_.startsWith("--"))
      require(pos.length == 3, "usage: CocoMain <annos> <images> <out.json> [--train] [--d2]")
      withSession { spark =>
        Coco.writeCocoDataset(load(spark, pos(0)), load(spark, pos(1)),
          annoKeyCol = "anno_key", outputJson = pos(2),
          train = args.contains("--train"), odtk = !args.contains("--d2"))
      }
    }
  }

  /** args: annoPath imagesPath outputDir [--segmentation] */
  object YoloMain {
    def main(args: Array[String]): Unit = {
      val pos = args.filterNot(_.startsWith("--"))
      require(pos.length == 3, "usage: YoloMain <annos> <images> <outDir> [--segmentation]")
      withSession { spark =>
        val annos = load(spark, pos(0))
        Yolo.writeYoloDataset(annos, load(spark, pos(1)), Coco.categoryDim(annos),
          annoKeyCol = "anno_key", outputDir = pos(2),
          segmentation = args.contains("--segmentation"))
      }
    }
  }
}
