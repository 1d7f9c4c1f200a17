package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("equals the row_number window formulation, including ties") {
    val df = Seq(
      ("g1", 1L, 10.0), ("g1", 2L, 10.0), ("g1", 3L, 9.0), ("g1", 4L, 8.0),
      ("g2", 5L, 1.0),
      ("g3", 6L, 3.0), ("g3", 7L, 2.0)
    ).toDF("g", "id", "v")
    val got = rowSet(TopKPerGroup(df, Seq("g"), Seq("v", "id"), 2))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)
    val want = rowSet(df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn"))
    assert(got == want)
  }

  test("plan contains the custom exec and exactly one exchange, no sort") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val topk = TopKPerGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice", "o_orderkey"), 3)
    topk.collect()
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Sort"), s"expected sort-free plan:\n$plan")
  }

  test("matches the window answer on real data at k=3") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val got = rowSet(TopKPerGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice", "o_orderkey"), 3))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val want = rowSet(orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn"))
    assert(got == want)
  }
}
