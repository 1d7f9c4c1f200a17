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
    * tightest-supplied source is kept whole (rate 1). A TARGET source with
    * ZERO corpus rows (typo'd name, empty source) makes C = 0 and the
    * output EMPTY — the contract taken literally (the largest corpus that
    * doesn't upsample an empty source has no rows), and the loud outcome: a
    * silently re-weighted mixture missing one ingredient would look healthy
    * while violating every declared proportion.
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
    * integer arithmetic). Range [0, 2^32).
    *
    * `salt` decorrelates the uniforms of DIFFERENT sampling stages: each
    * operator here draws from its own salt, so chaining them (quota →
    * temperature → mixture in [[graft.RunCuration.compose]]) filters on
    * independent-looking uniforms. With a SHARED uniform the stages would
    * nest instead of compose — every doc surviving stage one at rate r1
    * already has u < r1, so stage two at rate r2 would keep
    * min(r1, r2)/r1 of them rather than r2, silently violating its declared
    * proportions. Salt 0 is the unsalted one-round form (`sm_weighted_sample`
    * and `cp_mixture_sample` oracles pin it).
    *
    * The salt enters as an XOR of a WIDE per-salt constant (a splitmix-style
    * mix of the salt, computed driver-side) before a second multiplicative
    * round — never additively: the Knuth map is linear, so BOTH
    * hash(id + salt) and a second round over (h + salt) are pure rotations
    * of the unsalted uniform — and rotations of EACH OTHER for any two
    * salts — i.e. still 100% correlated (an interval of survivors maps to
    * an interval; the first shipped salting had exactly this flaw between
    * nonzero salts). XOR with a wide constant is not affine over Z_2^31,
    * so the second multiply smears any survivor interval across the whole
    * range for EVERY salt pair (spec: chained proportions; verified
    * pairwise over all four salts at build time of this code). Still pure
    * integer ops — XOR of two 31-bit values then one multiply < 2^63,
    * ANSI-safe, and DuckDB reproduces it with `xor()`. */
  private def saltConst(salt: Long): Long =
    (salt * 0x9E3779B97F4A7C15L) >>> 33 // 31-bit splitmix-style mix
  private def knuthHash(id: Column, salt: Long = 0L): Column = {
    val h0 = pmod(id, lit(2147483648L)) * 2654435761L % 4294967296L
    if (salt == 0L) h0
    else (h0 % 2147483648L).bitwiseXOR(lit(saltConst(salt))) *
      2654435761L % 4294967296L
  }

  /** The engine's deterministic uniform-[0,1) draw for `id` — the
    * [[knuthHash]] scaled to a double, the exact expression every sampling
    * operator here gates on (`draw < rate`). Public so composed samplers
    * (e.g. the CCNet middle-bucket rate in [[CcnetBuckets]]) share ONE
    * draw definition with [[mixtureSample]]/[[temperatureSample]] — and
    * one DuckDB re-derivation. */
  def uniformDraw(id: Column, salt: Long = 0L): Column =
    knuthHash(id, salt).cast("double") / 4294967296.0

  /** Deterministic training-shard assignment + within-shard pseudo-random
    * order — the final-mile export step before training: shard =
    * hash(id) mod `nShards`, position = rank of (hash, id) inside the
    * shard. The order is exactly the "global shuffle" a training run wants
    * (hash order ≈ random, but reproducible on any engine or cluster
    * layout), without ever building a global ordering: ONE exchange on the
    * shard key, then each shard sorts locally — a single corpus-wide
    * `orderBy(rand())` would range-partition the world and be
    * unreproducible to boot. Emits the input columns plus (shard, pos).
    *
    * Salted (3): shard export runs AFTER the sampling stages, and an
    * UNSALTED order would inherit their selection bias — every survivor of
    * a rate-r source has hash < r·2^32, so low-rate sources would sort
    * systematically to the FRONT of every shard (a training-order bias),
    * and high-hash docs would never lead a shard. A distinct salt makes
    * the export order independent of every survival draw. */
  def shardOrder(docs: DataFrame, id: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__shard").orderBy(col("__h"), id)
    docs.withColumn("__h", knuthHash(id, salt = 3L))
      .withColumn("__shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("shard", col("__shard"))
      .drop("__h", "__shard")
  }

  /** Curriculum-ordered shard export — [[shardOrder]] with a leading
    * PHASE key: within each shard, docs sort by (phase ASC, hash, id), so
    * a training run reading shards front-to-back consumes phase 0 first
    * (e.g. the CCNet head tercile), then phase 1, then 2 — the
    * quality-annealed schedule curriculum training reads, still
    * pseudo-randomly shuffled WITHIN each phase by the salted hash.
    * Same scale shape and salt as [[shardOrder]] (ONE shard-keyed
    * exchange + per-shard local sort; salt 3 keeps the order independent
    * of every survival draw); `phase` must be a deterministic per-row
    * column or the export stops being reproducible. */
  def curriculumOrder(docs: DataFrame, id: Column, phase: Column,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__shard").orderBy(col("__phase"), col("__h"), id)
    docs.withColumn("__h", knuthHash(id, salt = 3L))
      .withColumn("__shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("__phase", phase)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("shard", col("__shard"))
      .drop("__h", "__shard", "__phase")
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
    // left join FROM the targets: non-target sources drop, but a target
    // source with no corpus rows survives as n = 0 (an inner join would
    // silently delete it from the mixture — see scaladoc)
    val joined = weights.join(counts, Seq("__source"), "left")
      .select(col("__source"), col("__w"),
        coalesce(col("__n"), lit(0.0)).as("__n"))
    val c = joined.agg(min(col("__n") / col("__w")).as("__c"))
    val rates = joined.crossJoin(broadcast(c))
      .select(col("__source"),
        // ANSI mode raises on ANY division by zero (doubles included), so
        // the n = 0 row guards its rate explicitly; 0.0 is also the right
        // value (an empty source contributes nothing at any scale)
        when(col("__n") > 0,
          least(lit(1.0), col("__c") * col("__w") / col("__n")))
          .otherwise(lit(0.0)).as("__rate"))
    val uniform = uniformDraw(id)
    docs.join(broadcast(rates), source === col("__source"))
      .filter(uniform < col("__rate"))
      .drop("__source", "__rate")
  }

  /** Token-budget-weighted mixture sampling — [[mixtureSample]] with the
    * proportions measured in a per-doc SIZE column (token counts) instead
    * of document counts: production data recipes declare "30% code, 20%
    * web" in TOKENS, and a doc-count mixture silently skews toward
    * whichever source writes shorter documents. Given target token
    * proportions `targets` (sum 1), find the largest corpus achievable
    * without upsampling — scale C = min over sources of tok_s / w_s where
    * tok_s is the source's total of `size` — and keep each source's docs
    * at rate min(1, C·w_s / tok_s). Docs are sampled uniformly WITHIN a
    * source (the expected token total is rate·tok_s = C·w_s regardless of
    * the source's length distribution), so the kept token shares converge
    * to the targets at corpus scale while every verdict stays a pure
    * function of the id. A target source with zero tokens empties the
    * output, for exactly [[mixtureSample]]'s loud-contract reason.
    *
    * Salted (5): composes with every other sampling stage (see
    * [[knuthHash]] — an unsalted draw would nest with the doc-count
    * mixture's selection instead of composing).
    *
    * Scale shape: identical to [[mixtureSample]] — one map-side-combined
    * SUM per source (one row per source), rate math on the tiny frame
    * with a one-row global min cross-joined, one broadcast join onto the
    * corpus scan; the corpus never shuffles. */
  def tokenMixtureSample(docs: DataFrame, source: Column, id: Column,
      size: Column, targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      "target proportions must sum to 1")
    require(targets.forall(_._2 > 0), "target proportions must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = targets.toDF("__source", "__w")
    val counts = docs.groupBy(source.as("__source"))
      .agg(sum(size).cast("double").as("__tok"))
    val joined = weights.join(counts, Seq("__source"), "left")
      .select(col("__source"), col("__w"),
        coalesce(col("__tok"), lit(0.0)).as("__tok"))
    val c = joined.agg(min(col("__tok") / col("__w")).as("__c"))
    val rates = joined.crossJoin(broadcast(c))
      .select(col("__source"),
        when(col("__tok") > 0,
          least(lit(1.0), col("__c") * col("__w") / col("__tok")))
          .otherwise(lit(0.0)).as("__rate"))
    val uniform = uniformDraw(id, salt = 5L)
    docs.join(broadcast(rates), source === col("__source"))
      .filter(uniform < col("__rate"))
      .drop("__source", "__rate")
  }

  /** Temperature-scaled source rebalancing (the multilingual/data-recipe
    * knob: sample sources toward weights ∝ n_s^alpha, flattening the
    * natural distribution — alpha 1 keeps it, alpha 0 equalizes). As with
    * [[mixtureSample]], the output is the LARGEST corpus achievable without
    * upsampling, which makes the normalization cancel algebraically:
    * rate_s = (n_min / n_s)^(1−alpha), the smallest source kept whole.
    *
    * DETERMINISM across engines: `pow` is not correctly rounded and
    * differs between libms, so instead of comparing
    * `u < (n_min/n_s)^(1−alpha)` the filter raises the uniform to
    * `e = 1/(1−alpha)` and compares `u^e · n_s < n_min` (monotone-
    * equivalent for u ≥ 0). Whenever `e` is a small integer — the natural
    * alpha family 0, 1/2, 2/3, 3/4… — `u^e` is repeated IEEE
    * multiplication, each step correctly rounded, so membership is
    * bit-identical on any engine, partitioning, or cluster layout (the same
    * contract every other sampler here carries). Non-integer `e` falls back
    * to `pow` and loses only that cross-engine bit-guarantee.
    *
    * Scale shape: one map-side-combined count per source, a one-row global
    * min broadcast onto the tiny counts frame, one broadcast join onto the
    * corpus scan — the corpus never shuffles. */
  def temperatureSample(docs: DataFrame, source: Column, id: Column,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha < 1.0, "alpha must be in [0, 1)")
    val e = 1.0 / (1.0 - alpha)
    val counts = docs.groupBy(source.as("__source"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
    // salt 1: independent of mixtureSample's draw (salt 0) so the two
    // stages compose when chained (see knuthHash)
    val u = uniformDraw(id, salt = 1L)
    val uPow =
      if (e == math.rint(e) && e <= 16)
        (1 to e.toInt).map(_ => u).reduce(_ * _)
      else pow(u, lit(e))
    docs.join(broadcast(rates), source === col("__source"))
      .filter(uPow * col("__n") < col("__nmin"))
      .drop("__source", "__n", "__nmin")
  }

  /** The temperature-sweep tuning table behind [[temperatureSample]]'s
    * single-α knob: for every integer exponent e in 1..`maxE` (α = 1−1/e,
    * i.e. α ∈ {0, 1/2, 2/3, 3/4, …} — exactly the exponents whose
    * survival test u^e·n < n_min is pure repeated IEEE multiplication, no
    * libm pow), the per-source sampled count and resulting mixture share.
    * This is how the α knob is actually chosen: look at how flat each
    * candidate makes the mix and what it costs in docs. ONE corpus scan
    * evaluates all e values row-locally (the membership flags explode from
    * the same draw); every rollup after that runs on the
    * |sources|·maxE-bounded frame. Same salt-1 draw as
    * [[temperatureSample]], so the e matching a deployed α reproduces its
    * exact membership. */
  def temperatureCurve(docs: DataFrame, source: Column, id: Column,
      maxE: Int): DataFrame = {
    require(maxE >= 1 && maxE <= 16, "maxE must be in [1, 16]")
    val counts = docs.groupBy(source.as("bucket"))
      .agg(count(lit(1)).as("n_in"))
    val nmin = counts.agg(min(col("n_in")).cast("double").as("nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
    val u = uniformDraw(id, salt = 1L)
    val flags = docs.select(source.as("bucket"), u.as("u"))
      .join(broadcast(rates), "bucket")
      .select(col("bucket"), col("n_in"), explode(array((1 to maxE).map { e =>
        val uPow = (1 to e).map(_ => col("u")).reduce(_ * _)
        struct(lit(e.toLong).as("e"),
          when(uPow * col("n_in").cast("double") < col("nmin"), 1L)
            .otherwise(0L).as("f"))
      }: _*)).as("x"))
      .groupBy(col("x.e").as("e"), col("bucket"))
      .agg(max(col("n_in")).as("n_in"), sum(col("x.f")).as("n_sampled"))
    // per-e totals via ONE window over the |sources|·maxE-bounded frame
    // (round 13): the former agg + join-back needed a lineage-cutting
    // checkpoint whose construction ran the corpus scan (a bare lazy
    // checkpoint executes under AQE — 5 jobs per plan-only build); the
    // window keeps the frame single-consumer, so nothing is forced at
    // construction and the corpus-side broadcasts stay adaptive.
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy("e")
    flags
      .withColumn("tot", sum(col("n_sampled")).over(wTot))
      .select(col("e"),
        (lit(1.0) - lit(1.0) / col("e").cast("double")).as("alpha"),
        col("bucket"), col("n_in"), col("n_sampled"),
        (col("n_sampled").cast("double") / col("tot").cast("double"))
          .as("share"))
  }

  /** Water-filling token-budget allocator — the recipe SOLVER the other
    * composition ops assume has already run: given per-source available
    * tokens, integer target weights, and a total budget, allocate each
    * source min(available, r·w_s) for the largest feasible rate r. Sources
    * that saturate (can't supply their weighted share) get everything they
    * have and their unmet share redistributes over the rest — the
    * classic water-filling fixpoint, reached in ≤ |sources| rounds.
    *
    * EXACT end to end: integer weights make every saturation test a
    * cross-multiplication (a_s·W_U ≤ R·w_s with R = budget − Σ_sat a,
    * W_U = Σ_unsat w — no rational r ever materializes) and the final
    * unsaturated allocation is one integral division floor(R·w_s / W_U).
    * Scale shape: the loop runs entirely on the |sources|-sized state
    * frame (localCheckpoint per round, the power-iteration discipline);
    * the corpus appears only in the caller's one availability aggregate. */
  def budgetFill(avail: DataFrame, weights: Seq[(String, Long)],
      budget: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0) && budget >= 0)
    val session = avail.sparkSession
    import session.implicits._
    val wdf = weights.toDF("source", "w")
    def roundAgg(st: DataFrame) = st.agg(
      coalesce(sum(when(col("sat") === 1L, col("a"))), lit(0L)).as("asat"),
      coalesce(sum(when(col("sat") === 0L, col("w"))), lit(0L)).as("wu"))
    // Round totals ride a WHOLE-FRAME window instead of a broadcast
    // attach (round 13): a broadcast inside a checkpointed fragment
    // submits its collect at construction, and with a bare lazy
    // checkpoint every round's exchanges ran at plan-only build
    // (measured 8 jobs). The window is a single-partition pass over the
    // |sources|-sized state — free — and LazyCheckpoint keeps each
    // round's lineage cut job-free. The FINAL total attach (below) is
    // never checkpointed, so its broadcast stays lazy.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // no broadcast hint on wdf: inside the lazily-checkpointed fragment
    // the hinted exchange collects its (projected-LocalRelation) side at
    // construction — one job per plan-only build; both sides are
    // |sources|-bounded, so the SMJ the planner picks instead is free
    var st = graft.plans.LazyCheckpoint.of(
      avail.select(col("source"), col("a").cast("long").as("a"))
        .join(wdf, "source")
        .withColumn("sat", lit(0L)))
    for (_ <- weights.indices) {
      st = graft.plans.LazyCheckpoint.of(st
        .withColumn("asat",
          coalesce(sum(when(col("sat") === 1L, col("a"))).over(wAll), lit(0L)))
        .withColumn("wu",
          coalesce(sum(when(col("sat") === 0L, col("w"))).over(wAll), lit(0L)))
        .select(col("source"), col("a"), col("w"),
          when(col("sat") === 1L ||
            (col("wu") > 0 &&
              col("a") * col("wu") <= (lit(budget) - col("asat")) * col("w")),
            1L).otherwise(0L).as("sat")))
    }
    st.crossJoin(broadcast(roundAgg(st)))
      .select(col("source"), col("a").as("available"), col("w").as("weight"),
        col("sat").as("saturated"),
        when(col("sat") === 1L, col("a"))
          .otherwise(expr(
            s"((${budget}L - asat) * w) div greatest(wu, 1)"))
          .as("allocated"))
  }

  /** Deterministic mixture with UPSAMPLING — the epoch/repeat form of
    * [[mixtureSample]] for when the recipe needs more of a source than it
    * has (every production run that repeats Wikipedia while reading the
    * web once). Each source is scaled to `totalRows · w_s` rows in
    * expectation via a per-doc repeat count: `r_s = totalRows·w_s / n_s`
    * epochs per doc — `floor(r_s)` full replications, plus one more for the
    * docs whose id-hash uniform falls below the fractional part. Emits the
    * input columns plus `epoch` (0-based); a doc's epochs are
    * `0 .. its repeat count − 1`, so downstream shuffles/shards see distinct
    * (id, epoch) keys and dedup-by-id still recovers the unique corpus.
    *
    * Everything is single-operation IEEE arithmetic on exact integer
    * counts (no transcendentals), so the emitted multiset is bit-identical
    * across engines and layouts. Replication is `explode(sequence(...))`
    * against the broadcast per-source rate — row-local, no shuffle; the
    * sequence is guarded so a zero-epoch doc drops instead of emitting a
    * descending [0, −1] range (Spark's sequence() counts DOWN when
    * start > stop). */
  def mixtureEpochs(docs: DataFrame, source: Column, id: Column,
      targets: Seq[(String, Double)], totalRows: Long): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      "target proportions must sum to 1")
    require(targets.forall(_._2 > 0), "target proportions must be > 0")
    require(totalRows > 0, "totalRows must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = targets.toDF("__source", "__w")
    val counts = docs.groupBy(source.as("__source"))
      .agg(count(lit(1)).cast("double").as("__n"))
    // inner join: a target source with zero corpus rows cannot be
    // replicated into existence, and (unlike mixtureSample's global scale
    // C) no cross-source constraint couples the others — they still hit
    // their budgets and the output lands w_missing short of totalRows,
    // which IS the observable signal here; there is no row-level way to
    // encode the violation
    val rates = weights.join(counts, "__source")
      .select(col("__source"),
        (lit(totalRows.toDouble) * col("__w") / col("__n")).as("__r"))
    // salt 2: the fractional-epoch draw is independent of the downsampling
    // stages' draws (see knuthHash)
    val u = uniformDraw(id, salt = 2L)
    val nEpochs = floor(col("__r")).cast("long") +
      when(u < col("__r") - floor(col("__r")), 1L).otherwise(0L)
    docs.join(broadcast(rates), source === col("__source"))
      .withColumn("__ne", nEpochs)
      .filter(col("__ne") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__ne") - 1)))
      .drop("__source", "__r", "__ne")
  }
}
