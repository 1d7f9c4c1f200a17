package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The prefix-join applicability guard (round-15 directive #3): the sf1
  * rehearsal measured a regime — low-entropy vocabulary at t = 0.5 —
  * where the prefix filter admits 36% of ALL doc pairs, and the
  * exact-recall refine is then inherently quadratic. The guard estimates
  * the admitted-candidate fraction from prefix-bucket occupancy BEFORE
  * the refine runs and warns (or routes to the LSH screen under a flag).
  * These tests pin the estimator against both regimes and prove the
  * guard never changes the exact path's output.
  */
class PrefixGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Degenerate regime — the sf1 fixture's shape at toy size: every doc
    * drawn from a 4-word vocabulary, so rarest-first prefixes concentrate
    * on the same few bigrams and most pairs share one. */
  private lazy val degenerate = {
    val rng = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "d")
    (0 until 200).map { i =>
      val len = 8 + rng.nextInt(12)
      (i.toLong, Array.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** High-entropy regime — the Zipf-vocabulary shape the prefix-filter
    * theory targets: each doc's tokens are (almost) unique to it, so
    * prefix buckets are near-singletons. */
  private lazy val highEntropy = {
    val rng = new scala.util.Random(11)
    (0 until 200).map { i =>
      val len = 8 + rng.nextInt(12)
      // unique-per-doc tokens with a 5% chance of one globally shared word
      val toks = Array.tabulate(len)(j =>
        if (rng.nextDouble() < 0.05) "shared" else s"w${i}_$j")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def estimate(docs: org.apache.spark.sql.DataFrame,
      t: Double): Double = {
    val sets = Dedup.prefixShingleSets(docs, col("doc_id"), col("text"), 2)
    Dedup.estimatedCandidateFraction(
      Dedup.prefixTokens(sets, t), sets.count())
  }

  test("estimator: degenerate (sf1-regime) corpus estimates far above the " +
      "bound, high-entropy corpus far below") {
    val bad = estimate(degenerate, 0.5)
    val good = estimate(highEntropy, 0.5)
    assert(bad > 0.2, s"degenerate-regime estimate $bad should be >> 0.05")
    assert(good < 0.01, s"high-entropy estimate $good should be << 0.05")
    assert(bad > Dedup.DefaultGuardFraction && good < Dedup.DefaultGuardFraction)
  }

  test("estimator is a true upper bound on the admitted candidate fraction") {
    // Σ C(bucket, 2) counts emissions; distinct admitted candidates after
    // band+positional can only be fewer — on both corpora
    for (docs <- Seq(degenerate, highEntropy); t <- Seq(0.5, 0.8)) {
      val sets = Dedup.prefixShingleSets(docs, col("doc_id"), col("text"), 2)
      val n = sets.count().toDouble
      val est = estimate(docs, t)
      val actual =
        Dedup.prefixCandidates(sets, t, positional = true).count() /
          (n * (n - 1) / 2.0)
      assert(est >= actual - 1e-9,
        s"estimate $est under-counts actual candidate fraction $actual")
    }
  }

  test("fp boundary: a pair whose jaccard EQUALS the threshold survives " +
      "every screen stage (the round-15 guard-spec catch)") {
    // 10 distinct words → 9 bigram shingles; the superset doc adds one
    // word → 10 shingles, intersection 9, union 10: jaccard = 9/10 = 0.9
    // exactly. Unguarded double products straddle the boundary
    // (10·0.9 = 9.000000000000002 rejects the band; 9·1.9 <
    // 0.9·19 wrongly bails the merge walk) — this pins the 1e-9 guards.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11")
    ).toDF("doc_id", "text")
    val got = rowSet(Dedup.prefixFilterPairs(
      docs, col("doc_id"), col("text"), 0.9, guardFraction = 0.0))
    assert(got == Seq("[1,2,0.9]"), s"boundary pair lost: $got")
  }

  test("warn-only guard (the default) never changes the exact output") {
    for (t <- Seq(0.5, 0.8)) {
      val guarded = rowSet(Dedup.prefixFilterPairs(
        degenerate, col("doc_id"), col("text"), t))
      val unguarded = rowSet(Dedup.prefixFilterPairs(
        degenerate, col("doc_id"), col("text"), t, guardFraction = 0.0))
      assert(guarded == unguarded)
    }
  }

  test("autoRouteToLsh in the degenerate regime: same schema, every pair " +
      "is a true pair with its exact jaccard") {
    val t = 0.9 // tight threshold keeps the exact truth small on this corpus
    val routed = Dedup.prefixFilterPairs(degenerate, col("doc_id"),
      col("text"), t, autoRouteToLsh = true)
    assert(routed.columns.toSeq == Seq("doc_a", "doc_b", "jaccard"))
    val truth = rowSet(Dedup.prefixFilterPairs(degenerate, col("doc_id"),
      col("text"), t, guardFraction = 0.0)).toSet
    val got = rowSet(routed)
    assert(got.nonEmpty, "LSH route found no pairs — banding broken")
    assert(got.toSet.subsetOf(truth),
      "LSH route emitted a pair that is not a true >=t pair (exact confirm " +
        "must filter false candidates)")
  }

  test("autoRouteToLsh does NOT route in the high-entropy regime — the " +
      "exact path runs and output matches the unguarded form") {
    val a = rowSet(Dedup.prefixFilterPairs(highEntropy, col("doc_id"),
      col("text"), 0.5, autoRouteToLsh = true))
    val b = rowSet(Dedup.prefixFilterPairs(highEntropy, col("doc_id"),
      col("text"), 0.5, guardFraction = 0.0))
    assert(a == b)
  }
}
