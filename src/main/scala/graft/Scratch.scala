package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf-experiment main (not part of the judged surface).
  * Round 13: stage-attribute dd_prefix_pairs at sf0.1. */
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
      .config("spark.sql.codegen.useIdInClassName", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    docs.count()
    def sets = graft.operators.Parallelism.fanOut(
        docs.select(col("doc_id"), col("text").as("__text")))
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("__text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
    noop(sets)
    time("stage1: shingle sets only") { noop(sets) }
    def ex = sets.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    time("stage2: + explode") { noop(ex) }
    def dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("stage3: + dfreq agg") { noop(dfreq) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("df", "shingle")
    def prefix = ex.hint("merge").join(dfreq, "shingle")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - ceil(lit(0.5) * col("n") - lit(1e-9))
        .cast("long") + 1)
    time("stage4: + join + rank window") { noop(prefix) }
    def ceilT(x: org.apache.spark.sql.Column) =
      ceil(lit(0.5) * x - lit(1e-9)).cast("long")
    def prefixCk = graft.plans.LazyCheckpoint.of(
      ex.hint("merge").join(dfreq, "shingle")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("n") - ceilT(col("n")) + 1)
        .select(col("doc_id"), col("n"), col("rn"), col("shingle")))
    def candOf(p: org.apache.spark.sql.DataFrame) = {
      val joined = p.as("a").join(p.as("b"), "shingle")
        .filter(col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * 0.5 <=
            least(col("a.n"), col("b.n")))
      joined.filter(
          lit(1L) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >=
            ceilT(greatest(col("a.n"), col("b.n"))))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
    time("stage5: candidate self-join (fresh ckpt per run)") {
      noop(candOf(prefixCk))
    }
    val pMat = prefixCk
    noop(candOf(pMat))
    time("stage5b: candidate self-join (ckpt materialized once)") {
      noop(candOf(pMat))
    }
    println(s"[scratch] prefix rows=${pMat.count()} cand rows=${candOf(pMat).count()}")
    val full = Registry.byName("dd_prefix_pairs")
    noop(full.fn(spark, sfDir))
    time("full dd_prefix_pairs") { noop(full.fn(spark, sfDir)) }
    spark.stop()
  }
}
