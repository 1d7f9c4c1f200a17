package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** End-to-end corpus-curation driver — the training-data counterpart of
  * [[RunPipeline]]: compose the judged cleaning operators into the job a
  * data team actually runs, stage by stage:
  *
  *   1. quality gate   — C4-style row-local filter (tx_quality_gate rules)
  *   2. in-place clean — collapse token runs + redact PII placeholders
  *   3. exact dedup    — one fingerprint hash-agg keeps the smallest id
  *   4. near-dup keep  — MinHash LSH → Jaccard refine → greedy keep
  *   5. decontaminate  — drop docs sharing ≥ minShared trigrams with eval
  *   6. split          — deterministic hash train/val assignment
  *
  * Every stage is a pure DataFrame transform (the same code paths the
  * judged queries run), so the whole job executes as ONE plan into the
  * corpus write; stats and the log line read the written output back
  * rather than re-running the plan. Writes the curated corpus partitioned
  * by split plus a per-split document-count table.
  *
  * Usage: runMain graft.RunCuration <sfDir> <outDir> [evalMaxDocId]
  */
object RunCuration {

  /** The curation composition on an open (doc_id, text) frame; `eval` is
    * the held-out set to decontaminate against. `boilerplate = Some((k,
    * minDocs))` enables cross-document boilerplate-span removal (the
    * tx_boilerplate operator) between cleaning and dedup — BEFORE dedup on
    * purpose: two docs differing only in shared chrome become exact/near
    * duplicates once the chrome is cut, which is when dedup can see them. */
  def curate(docs: DataFrame, eval: DataFrame, jaccardThreshold: Double = 0.9,
      minShared: Int = 3, boilerplate: Option[(Int, Int)] = None): DataFrame = {
    // 1. gate — THE tx_quality_gate rule set (shared definition, can't drift)
    val gated = docs.filter(
      TextFunctions.gateRules(col("text")).map(_._2).reduce(_ && _))
    // 2. in-place clean (run collapse + PII redaction — pure map)
    val mapped = gated.select(col("doc_id"),
      TextFunctions.redact(TextFunctions.collapseRepeats(col("text"))).as("text"))
    // 2b. cross-doc boilerplate-span removal (opt-in)
    val cleaned = boilerplate.fold(mapped) { case (k, minDocs) =>
      Dedup.boilerplateSpans(mapped, col("doc_id"), col("text"), k, minDocs)
        .select(col("doc_id"), col("clean_text").as("text"))
    }
    // 3. exact dedup: keep the smallest id per fingerprint
    val exactKept = cleaned.join(
      Dedup.exact(cleaned,
          Seq(TextFunctions.fingerprint(col("text"))), col("doc_id"))
        .select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    // 4. near-dup keep (LSH -> Jaccard refine -> greedy smallest-id keep)
    val nearKept = exactKept.join(
      Dedup.nearDupKeep(exactKept, col("doc_id"), col("text"),
        numHashes = 16, bands = 4, threshold = jaccardThreshold),
      Seq("doc_id"), "left_semi")
    // 5. decontamination: drop docs sharing >= minShared DISTINCT trigrams
    // with the eval set — distinct, or a trigram common to several eval
    // docs would count with multiplicity and over-trip the threshold
    val evG = eval.select(explode(shingles(col("text"), 3)).as("g")).distinct()
    val contaminated = nearKept
      .select(col("doc_id"), explode(shingles(col("text"), 3)).as("g"))
      .join(broadcast(evG), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minShared)
      .select("doc_id")
    nearKept.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Corpus-composition stage (after curation, before the split):
    * optionally triage quality FIRST with `ccnet = Some(midRate)` — CCNet
    * perplexity terciles per SOURCE (the recipe's grouping key here;
    * CCNet's own is language), head kept, middle hash-sampled at
    * `midRate`, tail dropped (`cp_ccnet_mixture`, salt-4 draw) — then
    * optionally select the `dsir = Some((target, topK))` most-target-like
    * docs (`cp_dsir_score`/`cp_dsir_select` — importance ratios
    * trained on the curated `target` slice vs this corpus, id-tiebroken
    * top-k; selection BEFORE the quota so the cap applies to what survives
    * selection, not the raw pool), then cap any one source's share of the
    * corpus — longest-first, the `cp_domain_quota` operator — then
    * optionally rebalance sources with a temperature exponent
    * (`cp_temperature_sample`, weights ∝ n^alpha) and sample every source
    * toward a target mixture (`cp_mixture_sample`). The composed
    * DSIR-then-mixture shape is the judged `cp_dsir_mixture` entry.
    * `corpus` must carry `source` alongside (doc_id, text). */
  def compose(corpus: DataFrame, quotaPerSource: Int,
      mixture: Option[Seq[(String, Double)]] = None,
      temperature: Option[Double] = None,
      dsir: Option[(DataFrame, Int)] = None,
      ccnet: Option[Double] = None,
      tokenMixture: Option[Seq[(String, Double)]] = None): DataFrame = {
    val triaged = ccnet.fold(corpus) { midRate =>
      corpus.join(
        graft.operators.CcnetBuckets.sample(
          graft.operators.CcnetBuckets.bucketed(
            corpus, col("doc_id"), col("source"), col("text")),
          col("id"), midRate)
          .select(col("id").as("doc_id")),
        Seq("doc_id"), "left_semi")
    }
    val selected = dsir.fold(triaged) { case (target, topK) =>
      val ratios = graft.operators.Dsir.bucketLogRatios(
        target, col("text"), triaged, col("text"))
      triaged.join(
        graft.operators.Dsir.select(
          graft.operators.Dsir.importanceScores(
            triaged, col("doc_id"), col("text"), ratios)
            .select("doc_id", "score"), topK)
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
    }
    val sized = selected.withColumn("__n_chars", length(col("text")))
    val capped = graft.operators.Composition
      .domainQuota(sized, "source", Seq("__n_chars", "doc_id"), quotaPerSource)
      .drop("__n_chars")
    val tempered = temperature.fold(capped)(a => graft.operators.Composition
      .temperatureSample(capped, col("source"), col("doc_id"), a))
    val mixed = mixture.fold(tempered)(t => graft.operators.Composition
      .mixtureSample(tempered, col("source"), col("doc_id"), t))
    // token-budget mixture LAST: it rebalances whatever survives the doc
    // stages toward token-share targets (the form recipes are written in);
    // its salt-5 draw composes with every upstream stage's
    tokenMixture.fold(mixed)(t => graft.operators.Composition
      .tokenMixtureSample(
        mixed.withColumn("__n_tokens",
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long")),
        col("source"), col("doc_id"), col("__n_tokens"), t)
      .drop("__n_tokens"))
  }

  /** Deterministic hash split column (train/val ~80/20), same contract as
    * the judged tx_train_split. */
  def splitCol: org.apache.spark.sql.Column =
    when(substring(md5(col("doc_id").cast("string")), 1, 2) < "cd", "train")
      .otherwise("val")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val evalMax = if (args.length > 2) args(2).toLong else 50L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.sources.Tables(spark, sfDir, "documents").select("doc_id", "text")
    val eval = all.filter(col("doc_id") < evalMax)
    val train = all.filter(col("doc_id") >= evalMax)
    // composition runs on the curated survivors with their source attached
    // (curation works on the (doc_id, text) projection; one id-keyed join
    // re-attaches the source column for the quota)
    val sources = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "source")
    compose(
      curate(train, eval, boilerplate = Some((8, 2))).join(sources, "doc_id"),
      quotaPerSource = 200)
      .withColumn("split", splitCol)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("split").parquet(s"$outDir/corpus")
    // stats + log read the WRITTEN corpus back: one execution of the
    // curation plan total, instead of re-running the dedup joins per action
    val written = spark.read.parquet(s"$outDir/corpus")
    written.groupBy("split").agg(count(lit(1)).as("n_docs"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stats")
    println(s"[curation] wrote ${written.count()} docs to $outDir/corpus")
    spark.stop()
  }
}
