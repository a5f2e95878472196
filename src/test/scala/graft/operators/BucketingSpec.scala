package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Co-located bucketed joins: the equi-join over two tables bucketed on
  * the join key plans with ZERO shuffle exchanges, while the same join
  * over plain parquet shuffles both sides. This is the bucketing leg of
  * the 100 TB join strategy (broadcast for dims, buckets for fact-fact,
  * salting for skew).
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact-fact equi-join plans with zero shuffles") {
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .select("c_custkey", "c_nationkey")
      .withColumnRenamed("c_custkey", "o_custkey")

    // force the non-broadcast path: co-location is about fact-fact joins
    // where neither side fits in a broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(orders, "graft_b_orders", "o_custkey", 8)
      Bucketing.writeBucketed(customer, "graft_b_customer", "o_custkey", 8)
      val bucketed = Bucketing.bucketedJoin(spark, "graft_b_orders", "graft_b_customer", "o_custkey")
      assert(Bucketing.exchangeCount(bucketed) == 0,
        s"bucketed join should not shuffle:\n${bucketed.queryExecution.executedPlan}")

      val plain = orders.join(customer, "o_custkey")
      assert(Bucketing.exchangeCount(plain) >= 2,
        "plain parquet fact-fact join should shuffle both sides")

      // same rows either way
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }
}
