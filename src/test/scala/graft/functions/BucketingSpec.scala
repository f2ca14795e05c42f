package graft.functions

import graft.SparkSuite

/** Bucketed co-located join: same-key bucketed tables sort-merge-join
  * with zero Exchange (broadcast disabled so the shuffle elimination is
  * attributable to bucketing, not to a small side), and the result equals
  * the plain join of the raw frames.
  */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("same-key bucketed tables join with zero Exchange and identical results") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val customer = spark.read.parquet(sf() + "/customer.parquet")
      .select($"c_custkey".as("o_custkey"), $"c_name")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
      Bucketing.writeBucketed(customer, "b_customer", "o_custkey", 8)

      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_customer", "o_custkey")
      assert(Bucketing.isCoLocated(joined),
        s"plan has an Exchange:\n${joined.queryExecution.executedPlan}")
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))

      val got = joined.select("o_orderkey", "c_name")
        .as[(Long, String)].collect().sorted.toSeq
      val want = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
        .as[(Long, String)].collect().sorted.toSeq
      assert(got == want && got.nonEmpty)

      // a NON-bucketed copy of one side forces an Exchange — the control
      spark.read.parquet(sf() + "/orders.parquet")
        .select($"o_custkey", $"o_orderkey")
        .createOrReplaceTempView("plain_orders")
      val control = spark.table("plain_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      assert(!Bucketing.isCoLocated(control))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.catalog.dropTempView("plain_orders")
    }
  }
}
