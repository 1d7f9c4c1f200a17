package graft

/** Registry invariants: every judged query has a unique name, builds an
  * analyzable plan against the smoke fixtures, and its Spark output column
  * names exactly match what the driver's column-sorted compare needs (no
  * duplicates, no auto-generated names).
  */
class RegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length)
  }

  test("every query analyzes and exposes clean, unique column names") {
    Registry.all.foreach { q =>
      val df = q.fn(spark, sf)
      val cols = df.columns.toSeq
      assert(cols.distinct.length == cols.length, s"${q.name}: duplicate columns $cols")
      cols.foreach { c =>
        assert(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"${q.name}: auto-generated or unaliased column name '$c'")
      }
    }
  }

  test("judged outputs are scalar-only (driver compare cannot hash complex cells)") {
    import org.apache.spark.sql.types._
    Registry.all.filter(q => q.sql.isDefined).foreach { q =>
      q.fn(spark, sf).schema.fields.foreach { f =>
        val bad = f.dataType match {
          case _: ArrayType | _: MapType | _: StructType | _: BinaryType => true
          case _: DecimalType => true // degrades to float64 in the compare
          case _ => false
        }
        assert(!bad, s"${q.name}: column '${f.name}' has non-scalar judged type ${f.dataType}")
      }
    }
  }

  test("no judged query plans an all-pairs join (CartesianProduct or BNLJ)") {
    // j4 is an intentional (dims-only) cross join and rj joins a literal
    // band table, both deliberately broadcast-nested-loop; every other
    // judged plan must be a broadcast-hash or keyed join — an all-pairs
    // join over fact-sized inputs is the classic does-not-survive-100TB
    // plan, and BroadcastNestedLoopJoin is how Spark spells it for
    // inequality-only conditions
    // Allowlisted BNLJ plans are all bounded-broadcast by construction:
    //  - p13: build side is a single-row global aggregate (scalar subquery)
    //  - rj: literal band table broadcast against the fact scan
    //  - sim_bruteforce: the DECLARED brute-force ANN baseline — bounded
    //    broadcast query set against one corpus scan (the scale paths are
    //    sim_ivf/sim_lsh, which must and do stay keyed)
    //  - sim_ivf (single- and multi-probe): cluster assignment rides a
    //    SINGLE-ROW broadcast of the packed centroid array against each
    //    vector (row-local argmax expression; the corpus never self-joins)
    //  - tx_tfidf / tx_unigram_logprob / tx_ppl_buckets / cp_ccnet_mixture
    //    / cp_curriculum_shards / tx_bm25 / emb_centroid_outliers: build
    //    side is a broadcast SINGLE-ROW corpus-stats aggregate (the
    //    scalar-subquery shape)
    //  - q13: exercises the SQL-registered graft_cosine through the parser
    //    on a declared 64-row subset; the scale-safe pair paths are the
    //    dd_/sim_ queries above
    //  - sim_pq_codes / sim_pq_adc_topk / dd_semantic_keep: PQ encode and
    //    k-means assignment ride a SINGLE-ROW broadcast of the packed
    //    codebook/centroid set against each vector (row-local argmin; the
    //    corpus never self-joins), and ADC additionally broadcasts the
    //    bounded query-table set — the same shape as sim_ivf
    //  - tx_bpe_train: each merge round left-joins the ONE-ROW winning
    //    rule (lit(true) condition → BNLJ of a 1-row broadcast)
    //  - cp_mixture_sample / cp_temperature_sample: the global scale
    //    factor (C resp. n_min) is a SINGLE-ROW aggregate cross-joined
    //    onto the sources-sized rates frame (the scalar-subquery shape;
    //    the corpus side joins rates equi-keyed)
    //  - sim_hard_negatives / sim_triplet_mine / sim_ann_recall: the
    //    sim_bruteforce shape — bounded broadcast query set against one
    //    corpus scan (an IVF-probed scan is the drop-in 100 TB path, same
    //    as search); triplets/recall join branches only AFTER each
    //    collapses through the k-heap
    //  - sim_hybrid_rrf: composes the tx_bm25 single-row-stats broadcast
    //    and the sim_bruteforce query-set broadcast; the fusion itself is
    //    keyed joins over bounded top-50 retrieval outputs
    //  - cp_dsir_score / cp_dsir_select / cp_dsir_mixture: the per-side
    //    token totals are SINGLE-ROW aggregates cross-joined onto the
    //    ≤4096-row bucket frames (the tx_bm25 single-row-stats shape); the
    //    corpus joins the finished ratio table equi-keyed on bucket (the
    //    mixture additionally cross-joins the one-row scale factor, the
    //    cp_mixture_sample shape)
    //  - sim_lsh_recall / sim_adc_recall: the sim_ann_recall shape — the
    //    truth leg is the DECLARED brute-force baseline (bounded broadcast
    //    query set against one corpus scan), the ADC leg broadcasts the
    //    packed codebooks + per-query tables, and the recall gate
    //    cross-joins a SINGLE-ROW hit total
    val cartesianOk = Set("j4_cross_join")
    //  - sim_range_search: the sim_bruteforce shape minus even the heap —
    //    bounded broadcast query set, one corpus scan, row-local
    //    threshold predicate (IVF probed scan is the 100 TB scan side)
    //  - tx_quality_classifier: each GD round and the metric gate
    //    broadcast a ONE-ROW frame (weights resp. corpus metrics) — the
    //    tx_bpe_train / sim_adc_recall single-row-broadcast shape
    //  - cp_token_mixture: the cp_mixture_sample shape — the global token
    //    scale factor is a SINGLE-ROW aggregate cross-joined onto the
    //    sources-sized rates frame; the corpus joins rates equi-keyed
    //  - tx_bigram_lm: the tx_unigram_logprob shape — corpus token total
    //    is a SINGLE-ROW broadcast onto the bigram-model frame; the corpus
    //    side joins the finished model equi-keyed on the bigram
    //  - sim_sq8_topk / sim_binary_topk / sim_binary_rerank: the
    //    sim_bruteforce shape — bounded broadcast query set against one
    //    corpus scan of the quantized codes (IVF probed scan is the
    //    100 TB scan side); the rerank stage joins equi-keyed on the
    //    heap-bounded candidate list
    //  - tx_collocations: the tx_bigram_lm model stage — corpus totals
    //    are a SINGLE-ROW aggregate cross-joined onto the bigram frame
    //  - ev_market_basket: the session total is a SINGLE-ROW aggregate
    //    cross-joined onto the (type_a, type_b) pair frame (tiny — type
    //    cardinality squared); the session self-join is equi-keyed
    //  - dq_source_kl: the corpus token total is a SINGLE-ROW aggregate
    //    cross-joined onto the (source, token) frame; all other joins are
    //    broadcast equi-keyed
    //  - sim_adc_rerank: the sim_adc_recall shape — brute-force truth leg
    //    (bounded broadcast query set), broadcast codebooks/query tables,
    //    and a SINGLE-ROW hit-total gate cross-join; the rerank join
    //    itself is equi-keyed on the heap-bounded candidate list
    val bnljOk = Set("j4_cross_join", "rj_range_join", "p13_scalar_subquery",
      "sim_bruteforce_topk", "sim_ivf_topk", "sim_ivf_multiprobe",
      "sim_range_search", "tx_quality_classifier",
      //  - tx_head_mass: the BNLJ attaches the ONE-ROW (vocab size, total
      //    occurrences) aggregate onto the vocabulary-sized ranked frame
      //    (the p13 scalar-subquery shape)
      "tx_head_mass",
      "tx_tfidf", "tx_unigram_logprob", "tx_ppl_buckets", "cp_ccnet_mixture",
      "cp_curriculum_shards", "tx_bm25", "emb_centroid_outliers",
      "q13_sql_udf_cosine",
      "sim_pq_codes", "sim_pq_adc_topk", "dd_semantic_keep", "tx_bpe_train",
      //  - cp_budget_fill: every round cross-joins the |sources|-sized
      //    state frame with its OWN one-row (asat, wu) aggregate (the
      //    power-iteration scalar shape); the corpus appears only in the
      //    availability aggregate
      "cp_budget_fill",
      "cp_mixture_sample", "cp_temperature_sample", "cp_temperature_curve",
      "sim_hard_negatives", "sim_hybrid_rrf", "sim_triplet_mine",
      //  - sim_sq8_recall / sim_binary_recall: both legs reuse the
      //    sanctioned bruteforce/sq8/binary shapes — the bounded query
      //    subset broadcasts against one corpus scan; the eval join itself
      //    is a keyed broadcast over k-bounded outputs
      "sim_ann_recall", "sim_lsh_recall", "sim_adc_recall",
      "sim_sq8_recall", "sim_binary_recall", "sim_probe_recall", "sim_rbo",
      //  - sim_1nn_accuracy: bruteForceTopK over the DECLARED 256-vector
      //    verification subset (the sim_hubness shape); labels attach as
      //    keyed broadcasts
      "sim_1nn_accuracy",
      //  - sim_rocchio_accuracy: the emb_centroid_outliers shape — the
      //    eval scan cross-joins the broadcast ≤|labels|-row centroid
      //    frame (train collapses through one map-combined VectorSum)
      "sim_rocchio_accuracy",
      //  - emb_intrinsic_dim: 2-NN over the DECLARED 256-vector
      //    verification subset (the sim_1nn_accuracy shape); the
      //    full-corpus path is the NN-Descent graph's top-2 edges
      "emb_intrinsic_dim",
      "cp_dsir_score", "cp_dsir_select", "cp_dsir_mixture",
      //  - dq_cramers_v / dq_kruskal_wallis: the BNLJ attaches a ONE-ROW
      //    broadcast aggregate (the grand total / the tie-correction sum)
      //    onto a ≤|groups|-row frame — the p13 scalar-subquery shape
      "dq_cramers_v", "dq_kruskal_wallis",
      //  - dq_fisher_exact: one-row broadcast frames (the 2×2 table, the
      //    log C(n,mc) constant, the observed log-probability) cross-join
      //    the margin-bounded support frame — the p13 shape throughout
      "dq_fisher_exact",
      //  - ev_pareto_share: the 5-row quintile frame cross-joins its own
      //    one-row total (the p13 scalar-subquery shape)
      "ev_pareto_share",
      "cp_token_mixture", "tx_bigram_lm", "sim_adc_rerank",
      "sim_sq8_topk", "sim_binary_topk", "sim_binary_rerank",
      "tx_collocations", "ev_market_basket", "dq_source_kl",
      //  - dq_benford: the 9-row digit-count frame cross-joins its OWN
      //    single-row total (the scalar-subquery shape); the fact scan
      //    collapses through a map-combined count first
      //  - ev_pagerank: each of the ten power iterations cross-joins the
      //    SINGLE-ROW node-count aggregate onto the |event types|-bounded
      //    node frame (the cp_mixture_sample scalar shape); the event
      //    stream collapses through the ev_markov window before any join
      //  - emb_top_eigen: the corpus collapses through ONE CoMoments
      //    aggregate; every cross join after that broadcasts a SINGLE-ROW
      //    frame (the renormalization divisor, the sign scalar) onto
      //    64-row iteration frames
      //  - dq_ks_drift: the threshold grid rides a ONE-ROW collect_set
      //    broadcast onto the |sources|-bounded source list (the
      //    scalar-subquery shape); everything else is keyed joins over
      //    value-range-bounded frames
      //  - sim_hubness: kNN edges reuse the sim_bruteforce shape — the
      //    DECLARED 256-vector verification subset broadcast against the
      //    same bounded scan; both metrics then ride the k-bounded edges
      //  - ev_user_features: the corpus max-day is a SINGLE-ROW aggregate
      //    cross-joined onto the per-user feature frame (the p13 scalar-
      //    subquery shape); every other join is user-keyed
      //  - dq_chi2_independence: the category-bounded contingency cells
      //    cross-join their OWN single-row grand total (the scalar shape);
      //    margins attach as keyed broadcasts
      //  - emb_abtt: emb_top_eigen's iteration shape plus ONE more corpus
      //    scan that cross-joins a SINGLE-ROW broadcast (n, S, v) stats
      //    frame (the scalar-subquery shape); nothing corpus-sized joins
      "dq_benford", "ev_pagerank", "emb_top_eigen", "emb_abtt", "dq_ks_drift",
      //  - sm_balanced_downsample: the min-class-size quota is a SINGLE-ROW
      //    two-level aggregate cross-joined onto the ranked frame
      "sim_hubness", "ev_user_features", "dq_chi2_independence",
      //  - ev_decay_score: the corpus max-day is a SINGLE-ROW aggregate
      //    cross-joined onto the event scan (the ev_user_features / p13
      //    scalar-subquery shape) before the user-keyed aggregate
      //  - tx_rm3_expansion: the tx_bm25 single-row-stats broadcast (its
      //    top-10 comes from the same bm25Scores helper); the expansion
      //    pass itself joins the 10-row doc-id set equi-keyed
      //  - ev_pmi: the ev_market_basket shape — the one-row distinct-
      //    observation total cross-joins onto the item-pair frame; the
      //    pair pipeline itself is the capped equi-keyed covisitation path
      //  - ev_graph_stats: the one-row (n_nodes, max_degree) aggregate
      //    cross-joins the one-row edge-moment aggregate (two scalar
      //    frames — the p13 shape); the degree joins are equi-keyed
      //  - ev_rec_hitrate: the final metric row cross-joins two ONE-ROW
      //    aggregates (user total × hit/MRR sums — the p13 scalar shape);
      //    every data-sized join is user- or item-keyed
      //  - tx_kn_bigram: the tx_bigram_lm shape — the one-row bigram-type
      //    total cross-joins onto the vocab²-bounded type table; the
      //    history/continuation joins are equi-keyed
      "sm_balanced_downsample", "ev_decay_score", "tx_rm3_expansion",
      //  - ev_smoothing: the one-row min-day aggregate cross-joins onto
      //    the collapsed (type, day) frame (the ev_decay_score shape)
      //  - tx_ql_dirichlet: the tx_bm25 shape — ONE single-row corpus-stats
      //    aggregate cross-joined onto the row-local scoring pass
      "ev_pmi", "ev_graph_stats", "ev_rec_hitrate", "tx_kn_bigram",
      //  - dq_jackknife: the one-row totals aggregate cross-joins onto the
      //    |sources|-bounded per-source frame (the p13 scalar shape)
      //  - ev_cusum: the one-row global day-range aggregate cross-joins
      //    onto the |types|-bounded scaffold (the p13 scalar shape)
      //  - sm_kcenter_coreset: each greedy round cross-joins the ONE-ROW
      //    newly-selected center onto the corpus (the tx_bpe_train
      //    broadcast-winner shape); winners are one-row TakeOrdereds
      //  - ev_lag_features: the ev_cusum scaffold — the one-row day-range
      //    aggregate cross-joins onto the |types|-bounded frame
      //  - sm_coreset_coverage: the coreset construction's one-row winner
      //    joins plus an 8-ROW center-vector broadcast against one corpus
      //    pass (the sim_bruteforce bounded-broadcast shape)
      //  - tx_textrank: the ev_pagerank shape — every iteration
      //    cross-joins the SINGLE-ROW node-count aggregate onto the
      //    vocab-bounded node frame; edge joins stay keyed
      "ev_smoothing", "tx_ql_dirichlet", "dq_jackknife", "ev_cusum",
      "sm_kcenter_coreset", "ev_lag_features", "sm_coreset_coverage",
      //  - dq_psi: the one-row reference-total aggregate cross-joins onto
      //    the sources×10-bounded dense bin grid (the p13 scalar shape);
      //    bin counts and the reference column attach as keyed broadcasts
      //  - tx_jsd: the dq_source_kl shape — the one-row corpus token
      //    total cross-joins onto the (source, token) frame, and the
      //    |sources|-bounded totals row set cross-joins the token frame
      //    to densify it (a bounded constant-multiplier fan-out, not a
      //    data×data product)
      //  - sm_facility_coreset: each stochastic-greedy round cross-joins
      //    the hash-drawn BOUNDED candidate pool against one corpus pass
      //    (the sim_bruteforce bounded-broadcast shape — stochastic-greedy
      //    sizes the pool to O((n/k)ln(1/ε)) by construction) plus the
      //    sm_kcenter one-row winner update
      //  - dd_blocking_quality: the data legs are the existing banded
      //    (dd_lsh_pairs) and prefix-filter (dd_prefix_pairs) paths; the
      //    audit itself cross-joins four ONE-ROW count aggregates into
      //    the single metrics row (the p13 scalar shape)
      "tx_textrank", "dq_psi", "tx_jsd", "sm_facility_coreset",
      "dd_blocking_quality",
      //  - sim_label_ndcg: the BNLJ is bruteForceTopK's broadcast of the
      //    16-row query set against one corpus scan (the sim_bruteforce
      //    declared-verification shape); everything downstream is k- or
      //    label-bounded
      //  - sim_silhouette: the BNLJ is the assignClusters fan-out — the
      //    8-row centroid table broadcast against one corpus scan (every
      //    vector scores every centroid BY DESIGN; k centroids, not n²)
      "sim_label_ndcg", "sim_silhouette",
      //  - tx_chi2_terms: the BNLJ attaches the ONE-ROW corpus-total frame
      //    (the tx_bm25 single-row-stats pattern); the contingency joins
      //    are all keyed or |sources|-bounded broadcasts
      //  - ev_hits: per-round L1 normalization attaches a ONE-ROW sum via
      //    crossJoin(broadcast(...)) — the cp_mixture_sample totals shape,
      //    ×2 per power-iteration round
      "tx_chi2_terms", "ev_hits",
      //  - cp_neyman_alloc: the BNLJ attaches the ONE-ROW summed-weight
      //    frame to the |sources|-bounded weight table (p13 scalar shape)
      "cp_neyman_alloc",
      //  - dq_hll_distinct: the BNLJ attaches the ONE-ROW exact-distinct
      //    truth frame to the one-row sketch-estimate frame (p13 shape)
      //  - sim_mmr_exact: the BNLJ is bruteForceTopK's 4-row query
      //    broadcast (the sim_bruteforce declared-verification shape);
      //    every greedy round is k-bounded
      "dq_hll_distinct", "sim_mmr_exact",
      //  - dq_event_sanity: three ONE-ROW summary aggregates cross-joined
      //    into the single audit row (the p13 scalar-subquery shape)
      "dq_event_sanity",
      //  - ev_fano / ev_acf / ev_seasonal_naive / ev_rescaled_range: the
      //    BNLJ crosses the |types|-bounded distinct frame with the
      //    broadcast |days|-bounded scaffold (both collapse from
      //    one-row/grouped aggregates — the zero-fill grid, not data)
      "ev_fano", "ev_acf", "ev_seasonal_naive", "ev_rescaled_range",
      "ev_page_hinkley",
      //  - dq_mann_kendall / dq_runs_test / ev_dow_seasonality: the same
      //    zero-fill grid (|types| × broadcast |days| scaffold) over the
      //    LazyCheckpoint-ed counts collapse; every data-bearing join is
      //    keyed
      "dq_mann_kendall", "dq_runs_test", "ev_dow_seasonality",
      //  - dq_ljung_box: the same zero-fill grid scaffold, plus the
      //    7-ROW constant lag frame crossed onto the |types|·|days| grid
      //    (both bounded); the lagged-pair join itself is keyed on
      //    (event_type, day)
      "dq_ljung_box",
      //  - dq_friedman: the grid scaffold plus ONE-ROW (k, n) / (a2)
      //    aggregates cross-joined onto the |types|-row rank-sum frame
      //    (the p13 scalar-subquery shape)
      "dq_friedman",
      //  - dq_kendall_tau: the day-pair self-join (a.day < b.day) rides
      //    the |days|-bounded two-series grid — the dq_mann_kendall
      //    pair-frame adjudication with a single series key — plus
      //    one-row tie/total scalars cross-joined for the closing chain
      "dq_kendall_tau",
      //  - dq_theil_index: the ONE-ROW (n, N) total cross-joins onto the
      //    per-user count frame (the p13 scalar-subquery shape); the
      //    corpus collapses through one user-keyed map-combined count
      "dq_theil_index",
      //  - dq_levene: the ONE-ROW (k, N, grand-z) aggregate cross-joins
      //    onto the |types|-row group frame (the p13 scalar-subquery
      //    shape); the corpus-sized joins are keyed on event_type
      "dq_levene",
      //  - dq_fdr_bh: the ONE-ROW (d0, nd) date-span aggregate
      //    cross-joins the event scan to assign terciles (the p13
      //    scalar-subquery shape); the BH ladder runs on the
      //    |types|-bounded frame
      "dq_fdr_bh",
      //  - tx_heldout_ppl: the tx_bigram_lm shape on the train split —
      //    the ONE-ROW (n, V) totals frame cross-joins the eval bigram
      //    scoring pass; model joins are keyed or vocab-bounded broadcasts
      "tx_heldout_ppl",
      //  - dq_mannwhitney: the ONE-ROW tie-correction aggregate
      //    cross-joins the one-row rank-sum stats frame (two scalar
      //    frames — the ev_graph_stats shape); _2p is the same scalar
      //    attach over the two-phase rank machinery
      "dq_mannwhitney", "dq_mannwhitney_2p",
      //  - dq_cuped: the ONE-ROW pooled-moments aggregate cross-joins onto
      //    the ≤2-row per-arm frame (the p13 scalar-subquery shape); the
      //    only corpus-sized exchange is the user-keyed map-combined sum
      "dq_cuped",
      //  - dq_t_closeness: the ONE-ROW corpus-total frame cross-joins onto
      //    the (cell, lang) terms (the tx_bm25 single-row-stats shape);
      //    everything else is equi-keyed on lang / the QI cell
      "dq_t_closeness",
      //  - dq_conformal: the ONE-ROW n_cal frame cross-joins onto the
      //    distinct-score cumulative frame (the p13 shape); the 2-row
      //    threshold frame joins the eval side BY alpha (equi, broadcast)
      "dq_conformal",
      //  - sim_nndescent: the ONE-ROW ring-size scalar cross-joins onto
      //    the id frame for the seed graph (the p13 shape); every
      //    iteration step is keyed joins + k-bounded windows
      //  - sim_nndescent_recall: the sim_nndescent ring scalar plus the
      //    declared 256-query brute-force truth leg (the sim_ann_recall
      //    shape); the eval join rides k-bounded outputs
      //  - sim_graph_expand: the graph leg carries sim_nndescent's one-row
      //    corpus-size scalar; seeds/expansion/rerank are all keyed joins
      //    over k-bounded frames
      //  - sim_knn_components: the graph build carries sim_nndescent's
      //    one-row corpus-size scalar; mutuality and the component rounds
      //    are keyed self-joins on the k-bounded edge set
      "sim_nndescent", "sim_nndescent_recall", "sim_graph_expand",
      //  - sim_cluster_purity: the sim_knn_components build (ring scalar)
      //    plus label joins keyed on vec_id and component-bounded windows
      //  - sim_ari / sim_nmi: the same build; their contingency rollups
      //    are ONE-ROW frames attached by crossJoin(broadcast) (the
      //    tx_bm25 single-row-stats shape)
      "sim_knn_components", "sim_cluster_purity", "sim_ari", "sim_nmi")
    val violations = Registry.all.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      val cart = if (!cartesianOk(q.name) && plan.contains("CartesianProduct"))
        Some(s"${q.name}: CartesianProduct") else None
      val bnlj = if (!bnljOk(q.name) && plan.contains("BroadcastNestedLoopJoin"))
        Some(s"${q.name}: BroadcastNestedLoopJoin") else None
      cart.toSeq ++ bnlj.toSeq
    }
    assert(violations.isEmpty,
      s"all-pairs join plans detected:\n${violations.mkString("\n")}")
  }

  test("no judged query plans an exact percentile/median outside the sketch-verification rows") {
    // exact percentile buffers EVERY value of a group in the aggregate
    // (ObjectHashAggregate over a fact column) — a memory cliff at 100 TB.
    // The judged rows that legitimately use it exist to verify the sketch
    // counterparts and are documented as verification-scale constructs:
    //  - a10/a17: the exact contract the a19 sketch is bound-checked against
    //  - a19: carries the exact columns alongside the sketch's error bound
    //  - ev_mad_outliers: Hampel's identifier is DEFINED on exact medians
    //    (its scaladoc owns the production swap to mergeable quantile
    //    sketches, a19's shape, without changing the flag rule); the
    //    grouped frames are event-type-bounded, not per-fact-key
    //  - dq_levene: Brown–Forsythe is DEFINED on group medians (same
    //    adjudication as ev_mad_outliers — |types|-bounded groups, scaladoc
    //    owns the sketch swap at 100 TB)
    val exactOk = Set("a10_percentiles", "a17_median", "a19_approx_percentile",
      "ev_mad_outliers", "dq_levene")
    val exactAgg = "(?<![_a-z])(percentile|median)\\(".r
    val violations = Registry.all.filter(q => q.sql.isDefined && !exactOk(q.name))
      .flatMap { q =>
        val plan = q.fn(spark, sf).queryExecution.analyzed.toString
        if (exactAgg.findFirstIn(plan).isDefined) Some(q.name) else None
      }
    assert(violations.isEmpty,
      s"exact percentile/median planned outside the verification allowlist: $violations")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
