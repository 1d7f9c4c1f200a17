package graft

import org.apache.spark.sql.functions._

/** The curation composition, stage by stage on a handcrafted corpus where
  * each document exists to be dropped by exactly one stage (or to
  * survive). */
class RunCurationSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while data systems process many queries fast and tables group rows"

  test("each stage drops its target document; clean unique docs survive") {
    val eval = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val docs = Seq(
      100L -> good,                                  // survives everything
      101L -> good,                                  // exact duplicate of 100
      102L -> good.replace("quick", "quickest"),     // near-dup of 100
      103L -> "too short here now",                  // fails the length gate
      // shares the 3 trigrams of "alpha beta gamma delta epsilon" with eval
      104L -> "the alpha beta gamma delta epsilon and the filler words continue to flow here",
      105L -> "many columns store values and the scan reads rows quickly during every query run"
    ).toDF("doc_id", "text")
    val kept = RunCuration.curate(docs, eval, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(100L, 105L))
  }

  test("compose caps each source longest-first and mixture-samples the cap's output") {
    val corpus = Seq(
      (1L, "a " * 50, "web"), (2L, "b " * 40, "web"), (3L, "c " * 30, "web"),
      (4L, "d " * 20, "wiki"), (5L, "e " * 10, "wiki")
    ).toDF("doc_id", "text", "source")
    // quota 2: web keeps its two longest (1, 2); wiki keeps both
    val capped = RunCuration.compose(corpus, quotaPerSource = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(capped === Seq(1L, 2L, 4L, 5L))
    // with a mixture, non-target sources are dropped and target ones sampled
    val mixed = RunCuration.compose(corpus, quotaPerSource = 2,
      mixture = Some(Seq("web" -> 1.0)))
      .select("source").distinct().as[String].collect().toSeq
    assert(mixed === Seq("web"))
  }

  test("compose token-mixture stage rebalances by token budget and equals " +
      "the standalone operator over the capped corpus") {
    val corpus = Seq(
      (1L, "a " * 50, "web"), (2L, "b " * 40, "web"), (3L, "c " * 30, "web"),
      (4L, "d " * 20, "wiki"), (5L, "e " * 10, "wiki")
    ).toDF("doc_id", "text", "source")
    val out = RunCuration.compose(corpus, quotaPerSource = 100,
      tokenMixture = Some(Seq("web" -> 0.5, "wiki" -> 0.5)))
    // wiki is the token-tightest target (32 vs 123 whitespace-split tokens
    // of the trailing-space texts) → kept whole; web sampled toward parity
    assert(out.filter($"source" === "wiki").count() === 2L)
    assert(out.columns.toSeq === corpus.columns.toSeq,
      "the stage's working column must not leak into the composed output")
    // the composed stage is the SAME computation as the standalone operator
    val standalone = graft.operators.Composition.tokenMixtureSample(
      corpus.withColumn("__n_tokens",
        graft.functions.TextFunctions.tokenCount($"text").cast("long")),
      $"source", $"doc_id", $"__n_tokens",
      Seq("web" -> 0.5, "wiki" -> 0.5)).drop("__n_tokens")
    assert(rowSet(out) === rowSet(standalone))
  }

  test("boilerplate stage cuts shared chrome BEFORE dedup: dup pairs " +
      "collapse, unique bodies survive with the chrome removed") {
    val eval = Seq((1L, "zzz yyy xxx")).toDF("doc_id", "text")
    val footer = "copyright example site all rights reserved contact us today"
    val bodyB = "the independent article discusses the storage engine and the " +
      "compaction strategy used across all of the workloads with careful measurement of results"
    // 300/301 share their whole text (body `good` + footer, either order):
    // every 8-gram of both body and footer is cross-doc duplicated, both
    // docs scrub to empty, and exact dedup collapses them to 300. 302 has
    // a UNIQUE body + the shared footer: only the footer is cut.
    val docs = Seq(
      300L -> s"$good $footer",
      301L -> s"$footer $good",
      302L -> s"$bodyB $footer"
    ).toDF("doc_id", "text")
    val without = RunCuration.curate(docs, eval, jaccardThreshold = 0.99)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(without === Seq(300L, 301L, 302L),
      "sanity: chrome placement defeats both fingerprint and 0.99-Jaccard dedup")
    val withStage = RunCuration.curate(docs, eval, jaccardThreshold = 0.99,
      boilerplate = Some((8, 2)))
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(withStage.map(_._1) === Seq(300L, 302L),
      "cutting shared chrome must let exact dedup collapse the 300/301 pair")
    assert(withStage.find(_._1 == 302L).get._2 === bodyB,
      "the unique body must survive with exactly the footer removed")
  }

  test("compose DSIR stage selects target-like docs before the quota; " +
      "equals the standalone score-and-select composition") {
    // two token dialects: "wiki-ish" docs share the target's vocabulary,
    // "web-ish" docs use a disjoint one — DSIR must rank every wiki-ish doc
    // above every web-ish doc regardless of source labels
    val wikiText = "astronomy describes orbital mechanics and stellar physics"
    val webText = "click here buy now limited offer discount deal subscribe"
    val target = Seq((900L, wikiText)).toDF("doc_id", "text")
    val corpus = (0L until 12L).map(i =>
        (i, if (i % 2 == 0) s"$wikiText item $i" else s"$webText item $i",
          if (i < 6) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val out = RunCuration.compose(corpus, quotaPerSource = 100,
      dsir = Some((target, 6)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(0L, 2L, 4L, 6L, 8L, 10L),
      "the top-6 DSIR selection must be exactly the target-dialect docs")
    // the composed stage is the SAME computation as the standalone judged
    // operators (cp_dsir_score -> select): no drift between the two paths
    val ratios = graft.operators.Dsir.bucketLogRatios(
      target, col("text"), corpus, col("text"))
    val direct = graft.operators.Dsir.select(
      graft.operators.Dsir.importanceScores(
        corpus, col("doc_id"), col("text"), ratios)
        .select("doc_id", "score"), 6)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out === direct)
  }

  test("compose ccnet stage drops each source's tail tercile and equals " +
      "the standalone bucket-and-sample composition") {
    // 9 docs per source, LM-separable: low-index docs repeat the corpus's
    // common vocabulary (high mean logprob -> head), high-index docs are
    // made of rare one-off tokens (low mean logprob -> tail)
    val common = "the system reads the data and the data flows"
    val corpus = (0L until 18L).map { i =>
      val rare = s"zq$i xv$i wk$i jj$i qq$i vv$i ww$i kk$i yy$i"
      val text = if (i % 9 < 3) common
        else if (i % 9 < 6) s"the system item$i runs zq$i xv$i"
        else rare
      (i, text, if (i < 9) "a" else "b")
    }.toDF("doc_id", "text", "source")
    // midRate 1.0: keep head AND middle whole, drop exactly the tail — the
    // deterministic slice of the gate (no draw involved)
    val out = RunCuration.compose(corpus, quotaPerSource = 100,
      ccnet = Some(1.0))
    assert(out.count() === 12L, "each source keeps its 6 head+middle docs")
    // the composed stage is the SAME computation as the standalone judged
    // operator path (cp_ccnet_mixture): no drift between the two
    val direct = graft.operators.CcnetBuckets.sample(
      graft.operators.CcnetBuckets.bucketed(
        corpus, col("doc_id"), col("source"), col("text")),
      col("id"), midRate = 1.0)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq === direct)
    // midRate 0 keeps ONLY the head tercile
    assert(RunCuration.compose(corpus, quotaPerSource = 100,
      ccnet = Some(0.0)).count() === 6L)
  }

  test("compose temperature stage flattens skewed sources toward the smallest") {
    val corpus = (0L until 40L).map(i =>
        (i, s"doc number $i with text", if (i < 32) "web" else "wiki"))
      .toDF("doc_id", "text", "source")
    // alpha=0.5 over sizes web=32, wiki=8: wiki kept whole (8), web sampled
    // at sqrt(8/32) = 0.5 in expectation
    val out = RunCuration.compose(corpus, quotaPerSource = 100,
      temperature = Some(0.5))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out("wiki") === 8L, "smallest source is kept whole")
    assert(out("web") < 32L, "the dominant source must be downsampled")
  }

  test("run collapse rewrites text in place before dedup") {
    val eval = Seq((1L, "zzz yyy xxx")).toDF("doc_id", "text")
    // identical AFTER collapsing the doubled token: exact dedup must fire
    val docs = Seq(
      200L -> good,
      201L -> good.replace("quick", "quick quick")
    ).toDF("doc_id", "text")
    val kept = RunCuration.curate(docs, eval, jaccardThreshold = 0.99)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(200L))
  }
}
