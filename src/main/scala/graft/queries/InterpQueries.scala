package graft.queries

import graft.Tables.t
import graft.operators.TrackOps
import graft.operators.TrackOps.TrackRow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.9 — track interpolation as a distributed operator, driven
  * by keyframe tracks synthesized deterministically from `orders`
  * (~300 tracks, keyframes every 3 frames → 2 interpolated frames per
  * gap). Rows-only check (the interpolation math is not SQL-
  * expressible); the kernel itself is golden-tested in InterpSpec
  * against the reference's own output.
  */
object InterpQueries extends QueryPack {

  val defs: Map[String, QueryFn] = Map(
    "interp_tracks" -> ((s, d) => {
      import s.implicits._
      val keyframes = t(s, d, "orders")
        .withColumn("track_id", col("o_orderkey") % 300)
        .withColumn("seq", row_number().over(
          Window.partitionBy("track_id").orderBy("o_orderkey")))
        .filter(col("seq") <= 8) // ≤8 keyframes per track
        .withColumn("frame", (col("seq") - 1) * 3)
        .withColumn("x", (col("o_custkey") % 100).cast("double"))
        .withColumn("y", (col("o_orderkey") % 80).cast("double"))
        .withColumn("sz", (col("o_custkey") % 9 + 2).cast("double"))
        .select(col("track_id"), col("frame").cast("int").as("frame"),
          array(col("x"), col("y"), col("x") + col("sz"), col("y"),
                col("x") + col("sz"), col("y") + col("sz"), col("x"), col("y") + col("sz"))
            .as("points"),
          (col("o_orderkey") % 17 === 0).as("outside"))
        .as[TrackRow]
      TrackOps.interpolateTracks(s, keyframes, endFrameOffset = 3)
        .toDF()
        .select(col("track_id"), col("frame"), col("keyframe"),
          size(col("points")).as("n_coords"))
        .orderBy("track_id", "frame")
    })
  )

  val oracle: Map[String, String] = Map.empty
}
