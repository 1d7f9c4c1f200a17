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

  test("two-phase ntile equals the window ntile on the ev_rfm metric frame") {
    val anchor = to_date(lit("2024-02-01"))
    val byUser = graft.sources.Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(datediff(anchor, to_date(max(col("ts")))).cast("long").as("r_days"),
        count(lit(1)).as("f"))
    val windowed = byUser
      .withColumn("r_q", ntile(5).over(Window.orderBy(col("r_days"),
        col("user_id"))).cast("long"))
      .withColumn("f_q", ntile(5).over(Window.orderBy(col("f").desc,
        col("user_id"))).cast("long"))
    val twoPhase = Ranks.globalNtile(
      Ranks.globalNtile(byUser, Seq(col("r_days"), col("user_id")), 5, "r_q"),
      Seq(col("f").desc, col("user_id")), 5, "f_q")
    assert(rowSet(twoPhase.select("user_id", "r_q", "f_q")) ===
      rowSet(windowed.select("user_id", "r_q", "f_q")))
  }

  test("two-phase ntile edge layouts: N < n and non-divisible N") {
    def check(rows: Int, n: Int): Unit = {
      val df = spark.range(0, rows).select(col("id"))
      val win = df.withColumn("b",
        ntile(n).over(Window.orderBy("id")).cast("long"))
      val got = Ranks.globalNtile(df, Seq(col("id")), n, "b", parts = 4)
      assert(rowSet(got) === rowSet(win), s"rows=$rows n=$n")
    }
    check(rows = 3, n = 5)   // N < n: one row per bucket 1..3
    check(rows = 7, n = 5)   // rem = 2: buckets of 2,2,1,1,1
    check(rows = 100, n = 5) // divisible
    check(rows = 1, n = 1)
  }

  test("per-key two-phase ntile equals the per-key window ntile " +
      "(the tx_ppl_buckets shape)") {
    // skewed keys: one dominant key spanning many range partitions
    val df = spark.range(0, 500)
      .select(when(col("id") < 400, lit("en")).otherwise(
        when(col("id") < 450, lit("de")).otherwise(lit("fr"))).as("lang"),
        (col("id") * 37 % 101).as("score"), col("id"))
    val win = df.withColumn("b", ntile(3).over(
      Window.partitionBy("lang").orderBy(col("score"), col("id"))).cast("long"))
    val got = Ranks.ntilePerKey(df, Seq("lang"),
      Seq(col("score"), col("id")), 3, "b", parts = 8)
    assert(rowSet(got.select("lang", "id", "b")) ===
      rowSet(win.select("lang", "id", "b")))
  }

  test("the two-phase Mann-Whitney equals the judged single-window form") {
    val prod = Ranks.mannWhitney(armed, col("arm"), col("y"))
    val judged = graft.Registry.byName("dq_mannwhitney").fn(spark, sf)
    assert(rowSet(prod) === rowSet(judged))
  }

  test("per-key two-phase row_number equals the per-key window row_number " +
      "(the tx_length_gini rank attach)") {
    // dominant key spanning many range partitions + a key smaller than
    // one partition + heavy ties in the order column
    val df = spark.range(0, 500)
      .select(when(col("id") < 420, lit("en")).otherwise(
        when(col("id") < 470, lit("de")).otherwise(lit("fr"))).as("lang"),
        (col("id") % 13).as("len"), col("id"))
    val win = df.withColumn("rn", row_number().over(
      Window.partitionBy("lang").orderBy(col("len"), col("id"))).cast("long"))
    val got = Ranks.rowNumberPerKey(df, Seq("lang"),
      Seq(col("len"), col("id")), "rn", parts = 8)
    assert(rowSet(got.select("lang", "id", "rn")) ===
      rowSet(win.select("lang", "id", "rn")))
  }
}
