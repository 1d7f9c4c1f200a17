package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketedSpec extends SparkSpec {

  test("co-located join of bucketed tables plans with zero shuffle exchanges") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val customer = Tables(spark, "/root/testdata/sf0.001", "customer")
    Bucketed.write(orders.withColumnRenamed("o_custkey", "custkey"),
      "orders_b", buckets = 8, key = "custkey")
    Bucketed.write(customer.withColumnRenamed("c_custkey", "custkey"),
      "customer_b", buckets = 8, key = "custkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.colocatedJoin(spark, "orders_b", "customer_b", "custkey")
      val n = joined.count()
      assert(n == orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
