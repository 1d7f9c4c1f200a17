package graft

/** The cluster-determinism pledge (SURVEY §8), tested: every judged query
  * whose output contains derived floats must produce IDENTICAL rows under
  * different shuffle widths — the local proxy for different executor
  * counts, task orders, and partitionings. Exact sums, per-term rounding
  * before accumulation, and forward-order row-local loops are what make
  * this hold; a raw double SUM would fail it.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // the float-bearing judged queries (everything else is exact by type)
  private val risky = Seq(
    "q09_group_avg", "j2_fk_join", "a9_moments", "a10_percentiles",
    "a11_corr", "w2_running_sum", "w6_range_frame", "tx_tfidf",
    "tx_unigram_logprob", "sim_bruteforce_topk", "dd_embed_neardup",
    "q14_pricing_summary", "tx_quality", "emb_norms",
    // round 7: contamination fraction (double of exact ints). The judged
    // ADC entry (sim_pq_adc_topk) became a violations query in round 9 —
    // its CORRECT output is empty, so it would only ever check
    // empty == empty here; the distance-EMITTING ADC form gets its own
    // dedicated test below instead.
    "dq_contam_score",
    // round 11: threshold search (rounded cosines) and perplexity terciles
    // (scaled-long LM sums -> 6dp mean -> ntile over a total order)
    "sim_range_search", "tx_ppl_buckets",
    // round 11 batch 2: interpolated-bigram LM + entropy (scaled-long ln
    // sums), PMI ranking (rounded ln ordering a bounded top-k), SQ8
    // dequant cosine, binary-rerank exact cosine, exact-L2 ADC rerank,
    // dedup-rate fraction (double of exact ints)
    "tx_bigram_lm", "tx_entropy", "tx_collocations",
    "sim_sq8_topk", "sim_binary_rerank", "sim_adc_rerank",
    "dq_dedup_rate", "emb_dim_stats")

  test("float-bearing queries are bit-identical across shuffle widths") {
    val conf = "spark.sql.shuffle.partitions"
    val original = spark.conf.get(conf)
    try {
      risky.foreach { name =>
        val q = Registry.byName(name)
        spark.conf.set(conf, "3")
        val narrow = rowSet(q.fn(spark, sf))
        spark.conf.set(conf, "13")
        val wide = rowSet(q.fn(spark, sf))
        assert(narrow == wide, s"$name differs between 3 and 13 shuffle partitions")
        // dd_embed_neardup's threshold yields zero pairs at this SF (so does
        // its oracle); sim_pq_adc_topk is a violations query since round 9
        // (ProductQuantizer.adcTopKViolations) whose CORRECT output is empty
        // — empty-but-equal across widths is the right answer for both
        if (name != "dd_embed_neardup")
          assert(narrow.nonEmpty, s"$name returned no rows")
      }
    } finally spark.conf.set(conf, original)
  }

  test("ADC distances are bit-identical across shuffle widths") {
    // the raw distance-emitting ADC path (train -> encode -> adcTopK):
    // k-means partial sums, the packed codebook fold, and the per-code
    // table lookups must all be partition-order-independent — the judged
    // entry can't cover this since its correct output is empty
    import org.apache.spark.sql.functions.col
    val conf = "spark.sql.shuffle.partitions"
    val original = spark.conf.get(conf)
    try {
      def run(): Seq[String] = {
        val emb = graft.sources.Tables(spark, sf, "embeddings")
          .select("vec_id", "embedding")
        val books = graft.operators.ProductQuantizer.train(
          emb, m = 4, k = 8, iters = 2, dim = 64)
        rowSet(graft.operators.ProductQuantizer.adcTopK(
          graft.operators.ProductQuantizer.encode(emb, books, m = 4, dim = 64),
          emb.filter(col("vec_id") < 4), books, m = 4, dim = 64, k = 5))
      }
      spark.conf.set(conf, "3")
      val narrow = run()
      spark.conf.set(conf, "13")
      val wide = run()
      assert(narrow == wide, "adcTopK differs between 3 and 13 shuffle partitions")
      assert(narrow.nonEmpty, "adcTopK returned no rows")
    } finally spark.conf.set(conf, original)
  }
}
