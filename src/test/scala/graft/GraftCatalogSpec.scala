package graft

import graft.lake.{BucketedUpsert, Routing, Snapshot}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GraftCatalog: tables as durable SQL objects (VERDICT r19 #4) and the
  * DSv2 bucketed partitioning claim (VERDICT r19 #1) — a key-clustered
  * groupBy/join over a catalog-resolved graft table must plan with ZERO
  * exchange, matching the library read's clustered relation, while
  * results stay equal to the shuffling plan.
  */
class GraftCatalogSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cat").toString

  /** Register a catalog named `cat` over `root`. Runtime conf is enough:
    * CatalogManager resolves plugins lazily per name. */
  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  /** Every node of the EXECUTED plan, AQE-transparent: QueryStageExec
    * reports NO children, so its wrapped plan is walked explicitly or
    * every post-AQE shuffle/sort is invisible. ONE copy — the
    * exchange and sort pins both ride it. */
  private def planNodes(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect() // materialize so AQE settles on the final plan
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def exchanges(df: DataFrame): Int =
    planNodes(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])

  /** V2 bucketing (`spark.sql.sources.v2.bucketing.enabled`) defaults
    * ON in Spark 4 — the claim needs no opt-in. This helper flips it
    * for the sanity legs that prove the shuffle would otherwise
    * exist. */
  private def withConf[T](key: String, value: String)(body: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def withV2Bucketing[T](on: Boolean)(body: => T): T =
    withConf("spark.sql.sources.v2.bucketing.enabled", on.toString)(body)

  test("bucketed catalog table: key aggregate plans with ZERO exchange and equal results") {
    val root = tmp()
    val rows = spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 97).as("grp"),
        (col("id") * 3).as("v"), lit(1L).as("ver"))
    BucketedUpsert.applyBatch(rows, s"$root/db/t", "k", "ver",
      nBuckets = 8, tag = 1)
    register("gcat_agg", root)
    val sql = """SELECT k, count(*) AS n, sum(v) AS sv
                 FROM gcat_agg.db.t GROUP BY k"""
    // default session (v2 bucketing is ON by default in Spark 4): the
    // reported bucket(8, k) partitioning satisfies the aggregate's
    // clustered distribution — ZERO exchange
    val nEx = exchanges(spark.sql(sql))
    assert(nEx == 0,
      s"key aggregate over the catalog table must be exchange-free: $nEx")
    val clustered = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // the claim must be invisible in results: the same SQL with v2
    // bucketing OFF (the shuffling plan) agrees row for row
    val plain = withV2Bucketing(on = false) {
      val plainDf = spark.sql(sql)
      assert(exchanges(plainDf) > 0,
        "with v2 bucketing off the same aggregate must shuffle (sanity)")
      plainDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    }
    assert(clustered.sameElements(plain),
      "clustered and shuffling plans must agree")
    assert(plain.length == 4000)
  }

  test("storage-partitioned join: co-bucketed catalog tables join with zero exchange") {
    val root = tmp()
    val left = spark.range(0, 2000)
      .select(col("id").as("k"), (col("id") * 2).as("lv"), lit(1L).as("ver"))
    val right = spark.range(1000, 3000)
      .select(col("id").as("k"), (col("id") * 5).as("rv"), lit(1L).as("ver"))
    BucketedUpsert.applyBatch(left, s"$root/db/l", "k", "ver",
      nBuckets = 8, tag = 1)
    BucketedUpsert.applyBatch(right, s"$root/db/r", "k", "ver",
      nBuckets = 8, tag = 1)
    register("gcat_spj", root)
    val sql = """SELECT l.k, l.lv, r.rv
                 FROM gcat_spj.db.l l JOIN gcat_spj.db.r r ON l.k = r.k"""
    // broadcast off: a BroadcastHashJoin would trivially carry zero
    // SHUFFLE exchanges without proving the storage-partitioned path
    val got = withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val df = spark.sql(sql)
      val nEx = exchanges(df)
      assert(nEx == 0,
        s"co-bucketed catalog join must be exchange-free (SPJ): $nEx")
      // the ordering claim (SupportsReportOrdering: one certified-sorted
      // file per bucket) removes the SMJ sorts too — neither Exchange
      // NOR Sort anywhere in the executed join
      val sorts = planNodes(df)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
      assert(sorts == 0,
        s"the certified key order must eliminate the SMJ sorts: $sorts")
      spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    }
    val want = (1000L until 2000L).map(k => (k, k * 2, k * 5)).toArray
    assert(got.sameElements(want), s"SPJ changed results: ${got.length}")
  }

  test("catalog resolves the routed-tree shape: pruned SQL equals the library route") {
    val root = tmp()
    val ev = graft.Tables.t(spark, sf("sf0.001"), "events")
      .select("event_id", "user_id", "event_type")
    graft.lake.ZOrder.writeZOrdered(ev, s"$root/db/ev/data", 8,
      "user_id", "event_id")
    Routing.indexStats(spark, s"$root/db/ev", Seq("user_id"))
    register("gcat_tree", root)
    val df = spark.sql(
      "SELECT event_id, user_id FROM gcat_tree.db.ev WHERE user_id >= 140")
    val got = df.collect().map(_.getLong(0)).sorted
    val want = spark.read.parquet(s"$root/db/ev/data")
      .filter(col("user_id") >= 140).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), "catalog routed read changed results")
    // files opened == the library route's admitted set
    val route = Routing.route(spark, s"$root/db/ev", col("user_id") >= lit(140L))
    assert(scannedFiles(df) == route.files.map(normPath).toSet,
      "catalog scan must open exactly the library route's files")
    // and the metadata-only aggregate pushes down through the catalog too
    val agg = spark.sql(
      "SELECT count(*) AS n, min(user_id) AS mn FROM gcat_tree.db.ev")
    assert(scannedFiles(agg).isEmpty,
      "catalog aggregate pushdown must open zero files")
    val r = agg.head()
    assert(r.getLong(0) == ev.count())
  }

  test("VERSION AS OF resolves snapshot and bucketed history through the library protocol") {
    val root = tmp()
    // plain snapshot table: two published versions
    import spark.implicits._
    Snapshot.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      s"$root/db/snap", tag = 1)
    Snapshot.publish(Seq((1L, "a2"), (2L, "b2"), (3L, "c")).toDF("id", "s"),
      s"$root/db/snap", tag = 2)
    register("gcat_tt", root)
    val v1 = spark.sql(
      "SELECT id, s FROM gcat_tt.db.snap VERSION AS OF 1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(v1.sameElements(Array((1L, "a"), (2L, "b"))), v1.mkString(","))
    val cur = spark.sql("SELECT count(*) FROM gcat_tt.db.snap").head.getLong(0)
    assert(cur == 3L)
    // bucketed table: v1 then an upsert at v2; AS OF 1 sees pre-upsert rows
    val b1 = spark.range(0, 100)
      .select(col("id").as("k"), lit("old").as("s"), lit(1L).as("ver"))
    BucketedUpsert.applyBatch(b1, s"$root/db/bt", "k", "ver",
      nBuckets = 4, tag = 1, keep = 3)
    val b2 = spark.range(0, 50)
      .select(col("id").as("k"), lit("new").as("s"), lit(2L).as("ver"))
    BucketedUpsert.applyBatch(b2, s"$root/db/bt", "k", "ver",
      nBuckets = 4, tag = 2, keep = 3)
    val old = spark.sql(
      "SELECT s, count(*) AS n FROM gcat_tt.db.bt VERSION AS OF 1 GROUP BY s")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(old.sameElements(Array(("old", 100L))), old.mkString(","))
    val now = spark.sql(
      "SELECT s, count(*) AS n FROM gcat_tt.db.bt GROUP BY s ORDER BY s")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(now.sameElements(Array(("new", 50L), ("old", 50L))),
      now.mkString(","))
    // a tag past retention fails loudly naming the keep knob
    val ex = intercept[Exception](spark.sql(
      "SELECT * FROM gcat_tt.db.snap VERSION AS OF 0").collect())
    assert(ex.getMessage.contains("retention") ||
      ex.getMessage.contains("predates"), ex.getMessage)
  }

  test("catalog is read-facing and lists only real tables") {
    val root = tmp()
    import spark.implicits._
    Snapshot.publish(Seq((1L, "x")).toDF("id", "s"), s"$root/db/a", tag = 1)
    new java.io.File(s"$root/db/notatable").mkdirs()
    register("gcat_ddl", root)
    val tables = spark.sql("SHOW TABLES IN gcat_ddl.db").collect()
      .map(_.getString(1))
    assert(tables.toSeq == Seq("a"), tables.mkString(","))
    val ex = intercept[Exception](spark.sql(
      "CREATE TABLE gcat_ddl.db.b (id BIGINT) USING parquet"))
    assert(ex.getMessage.contains("read-facing"), ex.getMessage)
    val ex2 = intercept[Exception](spark.sql("DROP TABLE gcat_ddl.db.a"))
    assert(ex2.getMessage.contains("read-facing"), ex2.getMessage)
    // namespaces: dirs that are not themselves tables; USE + SHOW work,
    // mutation refuses like table DDL
    val nss = spark.sql("SHOW NAMESPACES IN gcat_ddl").collect()
      .map(_.getString(0))
    assert(nss.toSeq == Seq("db"), nss.mkString(","))
    spark.sql("USE gcat_ddl.db")
    try {
      val t2 = spark.sql("SHOW TABLES").collect().map(_.getString(1))
      assert(t2.toSeq == Seq("a"), t2.mkString(","))
    } finally spark.sql("USE spark_catalog.default")
    val ex3 = intercept[Exception](
      spark.sql("CREATE NAMESPACE gcat_ddl.db2"))
    assert(ex3.getMessage.contains("read-facing"), ex3.getMessage)
    // a TABLE dir is not a namespace: listing inside it must be loud
    // absence, never its internal layout dirs as namespaces
    val exNs = intercept[Exception](
      spark.sql("SHOW NAMESPACES IN gcat_ddl.db.a").collect())
    assert(exNs.getMessage.contains("SCHEMA_NOT_FOUND") ||
      exNs.getMessage.contains("db.a"), exNs.getMessage)
    // a namespace that CONTAINS a table literally named `data` stays a
    // namespace (the data-dir probe disambiguates one level down)
    Snapshot.publish(Seq((7L, "z")).toDF("id", "s"),
      s"$root/db2x/data", tag = 1)
    assert(!graft.sources.GraftCatalog.isTableDir(spark, s"$root/db2x"),
      "a namespace holding a table named 'data' must not read as a table")
    val t3 = spark.sql("SHOW TABLES IN gcat_ddl.db2x").collect()
      .map(_.getString(1))
    assert(t3.toSeq == Seq("data"), t3.mkString(","))
    assert(spark.sql("SELECT count(*) FROM gcat_ddl.db2x.data")
      .head.getLong(0) == 1L)
  }

  test("the catalog bucket function agrees with the writer's route for every stringy/integral key type") {
    import org.apache.spark.sql.types._
    val fn = graft.sources.GraftBucketFunction
    for ((dt, mk) <- Seq[(DataType, Long => Any)](
        (LongType, identity),
        (IntegerType, _.toInt),
        (StringType, l => org.apache.spark.unsafe.types.UTF8String
          .fromString(s"k$l")))) {
      val bound = fn.bind(StructType(Seq(
        StructField("n", IntegerType), StructField("k", dt))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      val probeCol = dt match {
        case LongType => col("id")
        case IntegerType => col("id").cast("int")
        case _ => concat(lit("k"), col("id").cast("string"))
      }
      val want = spark.range(0, 50)
        .select(BucketedUpsert.bucketOf(probeCol, 8)).collect().map(_.getInt(0))
      val got = (0L until 50L).map { l =>
        bound.produceResult(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](8, mk(l)))).intValue()
      }
      assert(got.toArray.sameElements(want),
        s"bucket function drifted from the writer for $dt")
    }
  }
}
