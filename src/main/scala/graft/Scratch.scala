package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf-experiment main (not part of the judged surface). */
object Scratch {
  def time[A](label: String)(f: => A): Unit = {
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    def t(n: String) = Tables(spark, sfDir, n)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(t("lineitem").groupBy("l_returnflag").count())

    time("q09 as-is") {
      noop(Registry.byName("q09_group_avg").fn(spark, sfDir))
    }
    time("q09 fanout-first") {
      noop(operators.Parallelism.fanOut(t("lineitem"))
        .groupBy("l_returnflag")
        .agg((sum(col("l_quantity").cast("decimal(20,4)")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("avg_qty").desc, col("l_returnflag")))
    }
    time("q09 double-sum (non-judged variant)") {
      noop(t("lineitem").groupBy("l_returnflag")
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"), count(lit(1)).as("n_rows"))
        .orderBy(col("avg_qty").desc, col("l_returnflag")))
    }
    time("j2 as-is") {
      noop(Registry.byName("j2_fk_join").fn(spark, sfDir))
    }
    time("j2 broadcast-customer") {
      noop(t("orders")
        .join(broadcast(t("customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(20,4)")).cast("double").as("revenue")))
    }
    time("scan lineitem only") { noop(t("lineitem")) }
    time("scan lineitem 2cols") { noop(t("lineitem").select("l_returnflag", "l_quantity")) }
    time("dd_lsh_pairs as-is") {
      noop(Registry.byName("dd_lsh_pairs").fn(spark, sfDir))
    }
    time("tx_tfidf as-is") {
      noop(Registry.byName("tx_tfidf").fn(spark, sfDir))
    }
    time("lsh: bands only") {
      noop(operators.Dedup.minhashBands(t("documents"), col("doc_id"), col("text"), 16, 4))
    }
    time("lsh: shingle explode only") {
      noop(operators.Parallelism.fanOut(t("documents").select(col("doc_id"), col("text").as("__text")))
        .select(col("doc_id"), explode(graft.functions.TextFunctions.shingles(col("__text"), 2)).as("shingle")))
    }
    time("lsh: sig agg only") {
      val sh = operators.Parallelism.fanOut(t("documents").select(col("doc_id"), col("text").as("__text")))
        .select(col("doc_id"), explode(graft.functions.TextFunctions.shingles(col("__text"), 2)).as("shingle"))
      val sigAgg = org.apache.spark.sql.GraftBridge.column(
        graft.expressions.MinHashSig(
          org.apache.spark.sql.GraftBridge.expression(col("shingle")), 16).toAggregateExpression())
      noop(sh.groupBy("doc_id").agg(sigAgg.as("sig")))
    }
    time("sim_bruteforce as-is") {
      noop(Registry.byName("sim_bruteforce_topk").fn(spark, sfDir))
    }
    spark.stop()
  }
}
