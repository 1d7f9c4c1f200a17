package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FanOutExpensiveProjections: scans feeding MinHash/cosine projections get
  * a round-robin repartition to shuffle width; plans without expensive
  * expressions are untouched; the rewrite is idempotent.
  */
class FanOutRuleSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FanOutExpensiveProjections
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq FanOutExpensiveProjections)
  }

  private val docs = "/root/testdata/sf0.001"

  private def sigDf = {
    val d = graft.sources.Tables(spark, docs, "documents")
    d.select(col("doc_id"), org.apache.spark.sql.GraftBridge.column(
      graft.expressions.MinHashSignature(
        org.apache.spark.sql.GraftBridge.expression(col("text")), 2, 4)).as("sig"))
  }

  test("rule inserts a round-robin repartition under expensive projections") {
    val without = sigDf.queryExecution.optimizedPlan.toString
    assert(!without.contains("Repartition"), without)
    withRule {
      val optimized = sigDf.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Repartition"), optimized)
      // idempotent: exactly one repartition even though optimizer batches
      // run to fixpoint
      assert("Repartition".r.findAllIn(optimized).size == 1, optimized)
    }
  }

  test("rule fires through pushable filters (selective scan stays wide)") {
    withRule {
      val d = graft.sources.Tables(spark, docs, "documents")
      val filtered = d.filter(col("doc_id") < 100)
        .select(col("doc_id"), org.apache.spark.sql.GraftBridge.column(
          graft.expressions.MinHashSignature(
            org.apache.spark.sql.GraftBridge.expression(col("text")), 2, 4)).as("sig"))
      val optimized = filtered.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Repartition"), optimized)
    }
  }

  test("plans without expensive expressions are untouched") {
    withRule {
      val plain = graft.sources.Tables(spark, docs, "documents")
        .select(col("doc_id"), length(col("text")).as("n"))
        .queryExecution.optimizedPlan.toString
      assert(!plain.contains("Repartition"), plain)
    }
  }

  test("rewritten plan computes the same signatures") {
    val want = sigDf.collect().map(_.toString).sorted.toSeq
    withRule {
      val got = sigDf.collect().map(_.toString).sorted.toSeq
      assert(got == want && got.nonEmpty)
    }
  }
}
