package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf-experiment main (not part of the judged surface).
  * Round 13: attribute dd_prefix_pairs' construction-time job + plan cost. */
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
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          println(s"[jobstart] ${js.stageInfos.map(_.name).mkString(" | ")}")
          ()
        }
      })
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    docs.count() // warm listing
    println("==== constructing dd_prefix_pairs (watch for jobstart) ====")
    time("dd_prefix_pairs construct+plan") {
      Registry.byName("dd_prefix_pairs").fn(spark, sfDir)
        .queryExecution.executedPlan
    }
    Thread.sleep(1000)
    println("==== prefix fragment plan EXACTLY as the operator builds it ====")
    val sets = graft.plans.LazyCheckpoint.of(
      graft.operators.Parallelism.fanOut(
          docs.select(col("doc_id"), col("text").as("__text")))
        .select(col("doc_id"),
          graft.functions.TextFunctions.shingles(col("__text"), 2).as("sh"))
        .filter(size(col("sh")) > 0))
    println("---- sets checkpoint done (any jobstart above this line is from sets) ----")
    val ex = sets.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("df", "shingle")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val fragment = ex.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n"))
      .select(col("doc_id"), col("n"), col("rn"), col("shingle"))
    println(fragment.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .mkString("\n"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
