package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** In-flight metrics via `Dataset.observe` — data-quality counters
  * (row counts, null counts, sums) computed DURING a job's own pass instead
  * of as separate counting jobs: at 100 TB a second "SELECT count(*)" scan
  * is a second 100 TB read, while observe piggybacks on the write.
  */
class ObservationSpec extends SparkSpec {

  test("observe collects row/null/sum metrics in the same pass as the action") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val obs = Observation("dq")
    val out = orders.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("n_null_price"),
      sum(round(col("o_totalprice") * 100, 0).cast("long")).as("price_cents"))
    val n = out.filter(col("o_orderstatus") =!= "X").count()

    val m = obs.get
    assert(m("n_rows") == orders.count())
    assert(m("n_null_price") == 0L)
    assert(m("price_cents").asInstanceOf[Long] > 0L)
    assert(n > 0)
  }
}
