package graft

import graft.lake.Feather

/** S4: reads a pyarrow-written Feather V2 fixture (uncompressed Arrow
  * IPC) covering every type the reference schemas use.
  */
class FeatherSpec extends SparkSpec {

  test("feather fixture round-trips schema and values") {
    val df = Feather.read(spark, "src/test/resources/fixture.feather")
    assert(df.columns.toSeq == Seq("id", "name", "score", "seg", "tags", "ok", "ts"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a")
    assert(rows(2).isNullAt(1)) // null string survives
    assert(rows(0).getDouble(2) == 1.5)
    assert(rows(0).getSeq[Float](3) == Seq(1.0f, 2.0f))
    assert(rows(2).isNullAt(3)) // null list
    assert(rows(1).getSeq[String](4) == Seq())
    assert(rows(0).getBoolean(5))
    assert(rows(0).getTimestamp(6).getTime == 1700000000000L)
    assert(rows(2).isNullAt(6))
  }

  test("timestamp[us] keeps full microsecond precision") {
    val df = Feather.read(spark, "src/test/resources/fixture.feather")
    val ts = df.orderBy("id").collect()(1).getTimestamp(6)
    assert(ts.getTime == 1700000001123L, "millisecond part")
    assert(ts.getNanos == 123456000, "microsecond part survives into nanos")
  }

  test("driver-size guard fails fast past graft.feather.maxBytes") {
    val prev = System.getProperty("graft.feather.maxBytes")
    // the cap is read once per call via sys.props, so a tiny cap makes
    // even the 3-row fixture oversized
    System.setProperty("graft.feather.maxBytes", "16")
    try {
      val e = intercept[IllegalArgumentException](
        Feather.read(spark, "src/test/resources/fixture.feather"))
      assert(e.getMessage.contains("parquet"), "error must route users to the lake path")
    } finally {
      if (prev == null) System.clearProperty("graft.feather.maxBytes")
      else System.setProperty("graft.feather.maxBytes", prev)
    }
  }
}
