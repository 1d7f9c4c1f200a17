package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed Dataset surface: case-class Encoders give compile-time row types,
  * but the engine's posture (README/SURVEY) is columns-first — these tests
  * pin WHY: a typed lambda filter deserializes every row and blocks parquet
  * pushdown, while the equivalent Column filter reaches the scan. Typed
  * views are for API ergonomics at the edges, never in the hot path.
  */
case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: java.sql.Timestamp,
    o_orderpriority: String)

class TypedDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables(spark, "/root/testdata/sf0.001", "orders")

  test("case-class encoder round-trips the orders schema") {
    val ds = orders.as[Order]
    val first = ds.head()
    assert(first.o_orderkey >= 0 && first.o_orderstatus.nonEmpty)
    assert(ds.count() == orders.count())
  }

  test("typed and column filters agree; only the column filter pushes down") {
    val ds = orders.as[Order]
    val viaLambda = ds.filter(_.o_totalprice > 200000)
    val viaColumn = ds.filter(col("o_totalprice") > 200000)

    assert(viaLambda.count() == viaColumn.count())

    val lambdaPlan = viaLambda.queryExecution.executedPlan.toString
    val columnPlan = viaColumn.queryExecution.executedPlan.toString
    // row objects materialize for the lambda (Spark 4 inlines the
    // deserializer into the filter's invoke)
    assert(lambdaPlan.contains("newInstance(class graft.Order)"), lambdaPlan)
    assert(!lambdaPlan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan"),
      lambdaPlan)
    assert(columnPlan.contains("GreaterThan(o_totalprice,200000"), columnPlan)
  }

  test("typed map-groups aggregation agrees with the columnar aggregate") {
    val ds = orders.as[Order]
    val typed = ds.groupByKey(_.o_orderstatus)
      .mapGroups((k, rows) => (k, rows.length))
      .collect().toMap
    val columnar = orders.groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().map { case (k, v) => (k, v.toInt) }.toMap
    assert(typed == columnar)
  }
}
