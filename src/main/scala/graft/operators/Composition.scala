package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-composition operators — the mixing/selection stage between
  * curation and training. After cleaning and dedup, a training-data
  * pipeline decides WHAT the corpus is made of: cap any one domain's share
  * (C4/RefinedWeb-style per-source quotas), then sample every source toward
  * a target mixture (the data-mixing knob behind every LLM data recipe).
  * Both are deterministic — re-running the pipeline, at any cluster layout,
  * reproduces the same corpus bit-for-bit.
  */
object Composition {

  /** Keep at most `quota` rows per domain, best-first by `order`
    * (descending, later columns break ties) — the per-source cap that stops
    * one crawl domain from dominating the corpus.
    *
    * Scale shape: delegates to [[graft.plans.TopKPerGroup]] — one exchange
    * on the domain key into k-bounded per-group heaps; no per-partition
    * sort, no window, task memory O(groups-in-partition × quota) regardless
    * of how skewed the biggest domain is (the operator the naive
    * row_number-window formulation is NOT at 100 TB, where one hot domain
    * would sort-buffer its whole partition). */
  def domainQuota(docs: DataFrame, domain: String, order: Seq[String],
      quota: Int): DataFrame =
    graft.plans.TopKPerGroup(docs, Seq(domain), order, quota)

  /** Deterministic downsample toward a target source mixture: given target
    * proportions `targets` (must sum to 1), find the LARGEST corpus
    * achievable without upsampling any source — scale C = min over sources
    * of n_s / w_s — and hash-sample each source to C·w_s rows in
    * expectation. Sources absent from `targets` are dropped; the
    * tightest-supplied source is kept whole (rate 1).
    *
    * Per-row survival is a pure function of the id (the engine's Knuth
    * multiplicative-hash uniform, same construction as `sm_weighted_sample`
    * — reduced into 31-bit space before the multiply so ANSI mode cannot
    * overflow), so membership is reproducible across engines, partitionings
    * and cluster layouts, and composes with incremental ingest: a doc's
    * verdict never depends on which other docs arrived.
    *
    * Scale shape: one map-side-combined count per source (rows: one per
    * source), rates derived ON the tiny counts frame (a one-row global min
    * broadcast-joined back), then one broadcast hash join of the rates onto
    * the corpus scan — the corpus itself never shuffles. */
  /** The engine's deterministic per-row uniform: Knuth multiplicative hash
    * of the id, reduced into 31-bit space BEFORE the multiply so the
    * product can never overflow signed 64-bit under ANSI mode (same
    * construction as `sm_weighted_sample`; DuckDB reproduces it with plain
    * integer arithmetic). Range [0, 2^32). */
  private def knuthHash(id: Column): Column =
    pmod(id, lit(2147483648L)) * 2654435761L % 4294967296L

  /** Deterministic training-shard assignment + within-shard pseudo-random
    * order — the final-mile export step before training: shard =
    * hash(id) mod `nShards`, position = rank of (hash, id) inside the
    * shard. The order is exactly the "global shuffle" a training run wants
    * (hash order ≈ random, but reproducible on any engine or cluster
    * layout), without ever building a global ordering: ONE exchange on the
    * shard key, then each shard sorts locally — a single corpus-wide
    * `orderBy(rand())` would range-partition the world and be
    * unreproducible to boot. Emits the input columns plus (shard, pos). */
  def shardOrder(docs: DataFrame, id: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__shard").orderBy(col("__h"), id)
    docs.withColumn("__h", knuthHash(id))
      .withColumn("__shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("shard", col("__shard"))
      .drop("__h", "__shard")
  }

  def mixtureSample(docs: DataFrame, source: Column, id: Column,
      targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      "target proportions must sum to 1")
    require(targets.forall(_._2 > 0), "target proportions must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = targets.toDF("__source", "__w")
    val counts = docs.groupBy(source.as("__source"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val joined = counts.join(weights, "__source") // inner: non-target sources drop
    val c = joined.agg(min(col("__n") / col("__w")).as("__c"))
    val rates = joined.crossJoin(broadcast(c))
      .select(col("__source"),
        least(lit(1.0), col("__c") * col("__w") / col("__n")).as("__rate"))
    val uniform = knuthHash(id).cast("double") / 4294967296.0
    docs.join(broadcast(rates), source === col("__source"))
      .filter(uniform < col("__rate"))
      .drop("__source", "__rate")
  }
}
