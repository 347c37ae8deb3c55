package graft

import graft.functions.Skew
import graft.lake.Bucketing
import org.apache.spark.sql.functions._

/** Plan-level proof of the two scale tools SCALE.md leans on: bucketed
  * tables join without a shuffle, and salted joins return exactly the
  * unsalted result.
  */
class BucketingSkewSpec extends SparkSpec {
  import spark.implicits._

  private def withoutBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("join of two same-bucketed tables plans no shuffle exchange") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 4)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 4)
    withoutBroadcast {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      // no hash-partition shuffle on either side: bucket layout is reused
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(900)}")
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(joined.count() ==
        orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
    }
  }

  test("bucketed groupBy on the bucket key aggregates without a shuffle") {
    withoutBroadcast {
      val agg = spark.table("b_orders").groupBy("o_custkey").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    }
  }

  test("salted join equals the unsalted join exactly") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) 1L else i.toLong % 100, i.toLong))
      .toDF("k", "payload") // key 1 is hot
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    val plain = big.join(small, big("k") === small("k2"))
      .select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", "k2", saltFactor = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
