package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions

/** Model-based document quality filtering — the classifier stage of a
  * curation pipeline (the GPT-3/LLaMA recipe: a cheap linear model scores
  * every crawl document against a "looks like the reference corpus"
  * objective; only docs clearing the score gate are kept). Here the
  * classifier is a logistic regression DISTILLED from the engine's own
  * rule gate ([[TextFunctions.gateRules]]): rules label a corpus slice,
  * the model learns a smooth score that generalizes the conjunction —
  * exactly how production pipelines bootstrap a learned filter from a
  * hand-written one (or from expensive LLM labels) before applying it at
  * full-crawl scale.
  *
  * Training is batch gradient descent run INSIDE the engine as iterative
  * aggregation, with the repo's cross-partition determinism contract:
  * each doc's per-feature gradient contribution is pre-rounded to a
  * scaled long (1e-6) and summed EXACTLY as integers, so the fitted
  * weights are bit-identical under any partitioning; the weight vector
  * itself is a ONE-ROW DataFrame broadcast-joined into each pass (the
  * [[BpeTrainer]] discipline — nothing collects to the driver).
  *
  * Scale shape: the corpus collapses ONCE to the (features, label)
  * projection (~50 bytes/doc) behind a lineage cut; each of the `iters`
  * rounds is then one map + one global partial aggregate over that
  * projection — map-side combine ships F longs per partition, no keyed
  * exchange anywhere. Inference ([[classify]]) is a pure row-local map
  * against the broadcast weights: zero shuffles at any corpus size.
  */
object QualityClassifier {

  /** Feature count of [[marginFeatures]] (bias + one margin per gate
    * rule). */
  val NumFeatures = 5

  private def clamp(c: Column): Column =
    greatest(lit(-1.0), least(lit(1.0), c))

  /** Clamped per-rule margin features `[1, m_len, m_word, m_stop, m_rep]`
    * — each gate rule's SIGNED distance to its threshold, scaled to the
    * rule's natural width and clamped to [-1, 1]. A raw-feature encoding
    * leaves the gate's interval rules (length band, word-length band)
    * linearly inseparable; margins make each rule a half-plane and the
    * clamp keeps one badly-violated rule from being outvoted by the
    * others, so the conjunction becomes (near-)separable for a linear
    * model. All inputs are exact-int-derived doubles (same IEEE division
    * both engines); undefined features (empty doc, single token) default
    * to the same conservative values the gate uses. */
  def marginFeatures(text: Column): Column = {
    val nTok = TextFunctions.tokenCount(text).cast("double")
    val nonSpace = length(regexp_replace(text, " ", "")).cast("double")
    val avgLen = coalesce(nonSpace / nullif(nTok, lit(0.0)), lit(0.0))
    val stop = coalesce(
      TextFunctions.stopwordCount(text, TextFunctions.EnglishStopwords)
        .cast("double") / nullif(nTok, lit(0.0)), lit(0.0))
    val rep = coalesce(
      when(nTok >= 2, lit(1.0) -
        size(TextFunctions.shingles(text, 2)).cast("double") / (nTok - 1)),
      lit(0.0))
    array(
      lit(1.0),
      clamp(least(nTok - 10, lit(1000.0) - nTok) / 50),
      clamp(least(avgLen - 2.0, lit(10.0) - avgLen) / 4),
      clamp((stop - 0.05) * 20),
      clamp((lit(0.8) - rep) * 5))
  }

  /** Left-to-right fold dot product — fixed association order, so the
    * double result is identical under any plan. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Fit logistic-regression weights to `(features, label)` by `iters`
    * rounds of full-batch gradient descent. Returns the ONE-ROW weights
    * frame (`w: array<double>`, length [[NumFeatures]]).
    *
    * Determinism: per-doc gradient contributions `(p − y)·x_j` are
    * rounded to 1e-6 scaled longs and integer-summed (order-free); the
    * update `w_j − lr·(G_j/1e6)/n` is then a fixed chain of IEEE ops on
    * exact integers — evaluated on the DRIVER over the per-round
    * collected gradient row, which is bounded by construction
    * (nFeatures + 1 longs, the model-table collect class). The weights
    * travel back into each round as LITERALS, so a round's plan is one
    * Aggregate over the checkpointed projection — round 15 replaced the
    * one-row-DataFrame weight carry (per-round crossJoin(broadcast(w)) +
    * LazyCheckpoint lineage cut) after profiling showed the 40-round
    * loop's cost was almost entirely that per-round Catalyst machinery
    * (~6.2s of plan assembly at sf0.1; the gradient jobs themselves are
    * milliseconds on the ~50-byte/doc projection). Bit-identical by
    * construction: same per-doc expression, same integer sums, and the
    * driver update mirrors the old Catalyst chain op for op
    * (`w_j − lr·((g/1e6)/n)` — literal-vs-column only changes where the
    * double lives, not the IEEE ops; QualityClassifierSpec pins the
    * fitted weights). An empty corpus yields null sums → null weights,
    * exactly the old null-propagation behavior. */
  def train(docs: DataFrame, features: Column, label: Column,
      iters: Int = 40, lr: Double = 4.0,
      nFeatures: Int = NumFeatures): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val f = nFeatures
    // LazyCheckpoint: construction must not run the feature scan (the
    // fragment is a fan-out projection with no joins, so no AQE decision
    // is lost; the checkpointed RDD materializes once, at round 1)
    val data = graft.plans.LazyCheckpoint.of(Parallelism.fanOut(docs)
      .select(features.as("x"), label.cast("double").as("y")))
    val spark = data.sparkSession
    var w: Array[java.lang.Double] = Array.fill(f)(Double.box(0.0))
    def wCol: Column = array(w.map(v =>
      if (v == null) lit(null).cast("double") else lit(v.doubleValue)): _*)
    // rounds 2..iters run over a SIZE-ADAPTIVE coalesce of the
    // checkpointed projection: round 1 (at full fan-out width — the
    // feature scan itself must run wide) reports the exact row count, and
    // ~32 MB of the ~8(f+1)+16-byte rows per task is plenty for the
    // per-round gradient pass — without it every round schedules
    // shuffle-width tasks over what is, after the collapse, a few KB per
    // core (39 × 33 near-empty tasks measured ≈ half the training time at
    // sf0.1). Coalesce is count-preserving and the sums are order-free
    // integers, so the fitted weights are unchanged at any width.
    var dataR = data
    for (i <- 0 until iters) {
      val p = sigmoid(dot(wCol, col("x")))
      val grads = dataR
        .select(Seq(lit(1L).as("n")) ++ (0 until f).map { j =>
          round((p - col("y")) * element_at(col("x"), j + 1) * 1e6, 0)
            .cast("long").as(s"g$j")
        }: _*)
        .agg(sum(col("n")).as("n"),
          (0 until f).map(j => sum(col(s"g$j")).as(s"g$j")): _*)
        .head() // bounded: f + 1 longs — the model-table collect class
      w =
        if (grads.isNullAt(0)) Array.fill(f)(null) // empty corpus: null w
        else {
          val n = grads.getLong(0).toDouble
          if (i == 0) {
            val rowBytes = 8L * (f + 1) + 16
            val target = math.min(
              math.max(1L, grads.getLong(0) * rowBytes / (32L << 20)),
              data.rdd.getNumPartitions.toLong).toInt
            if (target < data.rdd.getNumPartitions)
              dataR = data.coalesce(target)
          }
          Array.tabulate(f) { j =>
            if (w(j) == null) null
            else Double.box(w(j).doubleValue -
              lr * (grads.getLong(j + 1).toDouble / 1e6 / n))
          }
        }
    }
    spark.range(1).select(wCol.as("w"))
  }

  /** Score + gate every row of `docs`: adds `quality_score` (the model
    * probability, 6dp) and `kept` (score ≥ `threshold`). Row-local map
    * against the broadcast one-row weights — zero shuffles. */
  def classify(docs: DataFrame, weights: DataFrame, features: Column,
      threshold: Double = 0.5): DataFrame =
    docs.crossJoin(broadcast(weights))
      .withColumn("quality_score", round(sigmoid(dot(col("w"), features)), 6))
      .withColumn("kept", col("quality_score") >= threshold)
      .drop("w")

  /** Weight-vector contract violations — empty for any table produced by
    * [[train]] on finite features: every weight must be a finite double
    * of plausible magnitude (|w| ≤ 1e6; gradients are clamped-margin
    * bounded, so divergence or a NaN/Inf leak is a trainer bug, not a
    * data property). The machine-checkable face of the iterative trainer,
    * judged alongside the accuracy-gated label emission. */
  def contractViolations(weights: DataFrame): DataFrame =
    weights.filter(exists(col("w"),
      v => isnan(v) || v.isNull || abs(v) > 1e6))
      .select(lit("violation").as("kind"), lit(null).cast("long").as("doc_id"),
        lit(null).cast("long").as("y"))
}
