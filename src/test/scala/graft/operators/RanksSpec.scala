package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-phase global rank must be BIT-EQUAL to the single-partition
  * window form it replaces at scale — the Parallelism.fanOut both-forms
  * discipline applied to the dq_mannwhitney family. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The judged dq_mannwhitney's per-user metric frame, rebuilt (the arm
    * coin is the engine-standard md5 first-hex-digit split). */
  private lazy val armed = {
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    graft.sources.Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(sum(when(col("ts") >= split, col("value")).otherwise(lit(0.0))
        .cast("decimal(20,4)")).cast("decimal(20,4)").as("y"))
      .select(
        when(substring(md5(col("user_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit("A"))
          .otherwise(lit("B")).as("arm"),
        col("y"))
  }

  test("two-phase midranks equal the global-window midranks, row for row") {
    val twoPhase = Ranks.globalMidranks2x(armed.select("y"), "y")
      .groupBy("y", "r2").count()
    val window = armed.select("y")
      .withColumn("rmin", rank().over(Window.orderBy("y")).cast("long"))
      .withColumn("t", count(lit(1)).over(Window.partitionBy("y")))
      .withColumn("r2", lit(2L) * col("rmin") + col("t") - lit(1L))
      .groupBy("y", "r2").count()
    assert(rowSet(twoPhase) === rowSet(window))
    assert(twoPhase.count() > 0)
  }

  test("ties never straddle a range-partition boundary (tie counts are local)") {
    // a frame that is ALL ties across many more rows than one partition's
    // share: every row must report the full tie count and the same r2
    val allTies = spark.range(0, 1000).select(lit(7.0).as("y"))
    val got = Ranks.globalMidranks2x(allTies, "y", parts = 8)
    // min_rank = 1, t = 1000 → r2 = 2·1 + 999 = 1001 for every row
    assert(got.select("r2").distinct().as[Long].collect().toSeq === Seq(1001L))
    assert(got.count() === 1000)
  }

  test("the two-phase Mann-Whitney equals the judged single-window form") {
    val prod = Ranks.mannWhitney(armed, col("arm"), col("y"))
    val judged = graft.Registry.byName("dq_mannwhitney").fn(spark, sf)
    assert(rowSet(prod) === rowSet(judged))
  }
}
