package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.sources.Tables

/** The in-engine logistic-regression quality filter: separable data fits
  * perfectly, training is bit-deterministic under repartitioning (the
  * scaled-long gradient contract), the fixture distillation clears the
  * judged entry's floors, and the weight contract check trips on a
  * poisoned weights frame.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("linearly separable data: perfect fit, finite weights") {
    // y = 1 iff feature > 0, with a wide margin — GD must reach 100%
    val data = (0 until 64).map { i =>
      val v = if (i % 2 == 0) 0.8 + (i % 5) * 0.03 else -0.8 - (i % 5) * 0.03
      (i.toLong, v, i % 2 == 0)
    }.toDF("id", "v", "y")
    val feats = array(lit(1.0), col("v"))
    val w = QualityClassifier.train(data, feats, col("y"),
      iters = 40, lr = 4.0, nFeatures = 2)
    val rows = w.collect()
    assert(rows.length == 1 && rows.head.getSeq[Double](0).length == 2)
    val pred = QualityClassifier.classify(data, w, feats)
    assert(pred.filter(col("kept") =!= col("y")).isEmpty,
      "separable data must classify perfectly")
  }

  test("training is deterministic under repartitioning") {
    val label = TextFunctions.gateRules(col("text")).map(_._2).reduce(_ && _)
    def weightsOf(parts: Int): Seq[Double] =
      QualityClassifier.train(docs.repartition(parts),
        QualityClassifier.marginFeatures(col("text")), label,
        iters = 10, lr = 4.0)
        .collect().head.getSeq[Double](0)
    assert(weightsOf(2) == weightsOf(13),
      "scaled-long gradient sums must make weights partition-invariant")
  }

  test("fixture distillation clears the judged accuracy/recall/specificity floors") {
    val label = TextFunctions.gateRules(col("text")).map(_._2).reduce(_ && _)
    val w = QualityClassifier.train(docs,
      QualityClassifier.marginFeatures(col("text")), label)
    val scored = QualityClassifier.classify(
      docs.select(col("doc_id"), col("text"), label.as("y")), w,
      QualityClassifier.marginFeatures(col("text")))
    val m = scored.agg(
      sum(when(col("kept") === col("y"), 1L).otherwise(0L)).as("ok"),
      sum(when(col("y") && col("kept"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
      sum(when(!col("y") && !col("kept"), 1L).otherwise(0L)).as("tn"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("neg"),
      count(lit(1)).as("n")).collect().head
    val (ok, tp, pos, tn, neg, n) = (m.getLong(0), m.getLong(1),
      m.getLong(2), m.getLong(3), m.getLong(4), m.getLong(5))
    assert(pos > 0 && neg > 0, "fixture must exercise both classes")
    assert(ok * 100 >= n * 95, s"accuracy floor: $ok/$n")
    assert(tp * 100 >= pos * 97, s"recall floor: $tp/$pos")
    assert(tn * 10 >= neg * 9, s"specificity floor: $tn/$neg")
    assert(QualityClassifier.contractViolations(w).isEmpty)
  }

  test("weight contract trips on non-finite or diverged weights") {
    val bad = Seq(Tuple1(Seq(0.1, Double.NaN, 0.2, 0.0, 0.0))).toDF("w")
    assert(QualityClassifier.contractViolations(bad).count() == 1)
    val huge = Seq(Tuple1(Seq(0.1, 2e6, 0.2, 0.0, 0.0))).toDF("w")
    assert(QualityClassifier.contractViolations(huge).count() == 1)
    val fine = Seq(Tuple1(Seq(0.1, -3.5, 0.2, 0.0, 11.0))).toDF("w")
    assert(QualityClassifier.contractViolations(fine).isEmpty)
  }

  test("empty and single-token docs get defined margins and a score row") {
    val edge = Seq((1L, ""), (2L, "word"), (3L, "a b")).toDF("doc_id", "text")
    val scored = QualityClassifier.classify(edge,
      spark.range(1).select(array(lit(0.0), lit(1.0), lit(1.0), lit(1.0),
        lit(1.0)).as("w")),
      QualityClassifier.marginFeatures(col("text")))
    assert(scored.count() == 3)
    assert(scored.filter(col("quality_score").isNull ||
      isnan(col("quality_score"))).isEmpty)
  }
}
