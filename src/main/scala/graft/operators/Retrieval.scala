package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-level retrieval composition — fusing independently-produced
  * candidate rankings (a lexical BM25 list, an ANN cosine list, …) into one
  * hybrid ranking. Hybrid retrieval is the standard shape for mining
  * training pairs from a corpus: lexical recall catches exact-term matches
  * embeddings miss, vector recall catches paraphrases lexical scoring
  * misses, and rank fusion needs NO score calibration between the two —
  * only ranks, which makes it robust to incomparable score scales.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * every input list contributes `1 / (c + rank)` for each (query_id, id)
    * it contains (rank = 1-based position by score DESC, id ASC tiebreak);
    * candidates absent from a list get no contribution from it. Returns the
    * top `k` per query by (fused score DESC, id ASC) as
    * (query_id, id, rrf), rrf rounded to 6dp AFTER summation.
    *
    * Inputs are frames of (query_id, id, score) — ALREADY truncated to
    * whatever list depth the caller wants fused (list depth is the recall
    * knob and belongs to the retrieval step, not the fusion).
    *
    * Determinism: contributions are summed in LIST-INDEX order via a sorted
    * array fold, not a floating `sum` whose partial-aggregation order could
    * flip last-bit results between runs — fused scores are bit-stable for
    * any number of input lists.
    *
    * Scale shape: each list's rank window partitions by query_id — per-query
    * candidate lists are bounded by construction (top-N retrieval output),
    * so no partition-wide sort of corpus data ever happens; the union
    * aggregates on (query_id, id) with map-side combine, and the final
    * per-query top-k is the k-bounded heap ([[graft.plans.TopKPerGroup]]),
    * not a sort. */
  def rrfFuse(lists: Seq[DataFrame], c: Int, k: Int): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(c >= 1, s"rrf constant must be >= 1, got $c")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id").asc)
    val contribs = lists.zipWithIndex.map { case (df, li) =>
      df.select(col("query_id"), col("id"), col("score"))
        .withColumn("__rank", row_number().over(w))
        .select(col("query_id"), col("id"),
          struct(lit(li).as("li"),
            (lit(1.0) / (lit(c) + col("__rank"))).as("contrib")).as("__c"))
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "id")
      .agg(round(aggregate(array_sort(collect_list(col("__c"))),
        lit(0.0), (acc, x) => acc + x.getField("contrib")), 6).as("rrf"))
    graft.plans.TopKPerGroup(
      fused.withColumn("__neg_id", -col("id")),
      group = Seq("query_id"),
      order = Seq("rrf", "__neg_id"),
      k = k)
      .select("query_id", "id", "rrf")
  }

  /** 4dp-rounded cosine as a pure higher-order-function composition —
    * usable INSIDE array lambdas (the codegen'd CosineSimilarity
    * expression is bit-identical to this form per its scaladoc, but
    * lambda-variable children belong to the HOF world). ONE definition
    * for [[mmrTopK]]'s greedy fold and [[mmrViolations]]' recompute. */
  private def cosR(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (s, v) => s + v)
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 4)
  }

  private def mmrScore(rel: Column, maxSim: Column, lambda: Double): Column =
    round(lit(lambda) * rel - lit(1.0 - lambda) * maxSim, 6)

  /** The per-query candidate pool [[mmrTopK]] and [[mmrViolations]] share:
    * brute-force top-`candidates` by cosine, raw vectors re-attached
    * (broadcast candidate list against one corpus scan — the rerank
    * shape). */
  private def mmrCandidates(corpus: DataFrame, queries: DataFrame,
      candidates: Int): DataFrame =
    corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("vec"))
      .join(broadcast(
        Similarity.bruteForceTopK(corpus, queries, candidates)), "neighbor_id")
      .select(col("query_id"), col("neighbor_id").as("id"),
        col("sim").as("rel"), col("vec"))

  /** Maximal-marginal-relevance diversified reranking (Carbonell &
    * Goldstein 1998) — the anti-redundancy pass between retrieval and
    * consumption (RAG context assembly, hard-negative pools): greedily
    * select `k` of the top-`candidates` cosine candidates, each step
    * maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` (6dp-rounded,
    * ties to the smaller id; the empty selection contributes similarity
    * 0, so step 1 is the λ-scaled relevance argmax). λ = 1 reduces to the
    * plain top-k; lower λ trades relevance for novelty — a pool whose top
    * hits are near-duplicates yields k DISTINCT neighborhoods instead of
    * one repeated k times.
    *
    * Scale shape: candidate generation is the brute-force/IVF serving
    * path (swap freely); vectors re-attach via the broadcast-candidate
    * rerank join; then ONE query-keyed collect gathers the ≤`candidates`
    * structs per query and the ENTIRE greedy loop runs as a row-local
    * array fold (k × candidates × candidates bounded work per query —
    * never a corpus op, nothing iterates on the driver). Returns
    * (query_id, rank 1-based, neighbor_id, mmr). */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, candidates: Int,
      k: Int, lambda: Double): DataFrame = {
    require(candidates >= k && k >= 1, "need candidates >= k >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val gathered = mmrCandidates(corpus, queries, candidates)
      .groupBy("query_id")
      .agg(sort_array(collect_list(
        struct(col("id"), col("rel"), col("vec")))).as("cs"))
    val selType = "array<struct<rank:int,id:bigint,mmr:double,vec:array<float>>>"
    val selected = aggregate(sequence(lit(1), lit(k)),
      array().cast(selType), (sel, step) => {
        val remaining = filter(col("cs"), c =>
          !exists(sel, s => s.getField("id") === c.getField("id")))
        val scoredArr = transform(remaining, c => {
          val maxSim = coalesce(array_max(transform(sel, s =>
            cosR(c.getField("vec"), s.getField("vec")))), lit(0.0))
          val score = mmrScore(c.getField("rel"), maxSim, lambda)
          struct((-score).as("neg"), c.getField("id").as("id"),
            score.as("score"), c.getField("vec").as("vec"))
        })
        val pick = array_min(scoredArr)
        when(size(remaining) > 0,
          concat(sel, array(struct(step.cast("int").as("rank"),
            pick.getField("id").as("id"), pick.getField("score").as("mmr"),
            pick.getField("vec").as("vec")))))
          .otherwise(sel)
      })
    gathered.select(col("query_id"), explode(selected).as("s"))
      .select(col("query_id"), col("s.rank").as("rank"),
        col("s.id").as("neighbor_id"), col("s.mmr").as("mmr"))
  }

  /** Violations of [[mmrTopK]]'s greedy contract, expected EMPTY — the
    * oracle-checkable form (the greedy loop itself has no tractable SQL
    * analogue, but every property of its OUTPUT does; the sim_pq pattern).
    * Recomputed INDEPENDENTLY of the fold: availability, max-sim-to-prior,
    * and scores are re-derived with plain joins/aggregates over the
    * k-bounded output × the candidate pool. Kinds:
    *   - `score_mismatch`: a selected row whose emitted mmr differs from
    *     the recomputed score of that id at that step;
    *   - `beaten`: an available candidate that strictly beats the selected
    *     row at its step under (score DESC, id ASC). */
  def mmrViolations(corpus: DataFrame, queries: DataFrame, candidates: Int,
      k: Int, lambda: Double): DataFrame = {
    val out = mmrTopK(corpus, queries, candidates, k, lambda)
      .localCheckpoint(eager = false)
    val sel = out.select(col("query_id"), col("rank"),
      col("neighbor_id").as("sel_id"), col("mmr"))
    val cand = mmrCandidates(corpus, queries, candidates)
      .localCheckpoint(eager = false)
    // every (step, candidate) pair, minus candidates already selected
    // BEFORE that step
    val stepCand = cand
      .join(sel.select("query_id", "rank").distinct(), "query_id")
      .join(sel.select(col("query_id"), col("rank").as("__selr"),
        col("sel_id").as("id")), Seq("query_id", "id"), "left")
      .filter(col("__selr").isNull || col("__selr") >= col("rank"))
      .select("query_id", "rank", "id", "rel", "vec")
    val prior = sel.join(cand.select(col("query_id"),
        col("id").as("sel_id"), col("vec").as("sel_vec")),
      Seq("query_id", "sel_id"))
    val maxSim = stepCand
      .join(prior.select(col("query_id"), col("rank").as("__pr"),
        col("sel_vec")), "query_id")
      .filter(col("__pr") < col("rank"))
      .groupBy("query_id", "rank", "id")
      .agg(max(cosR(col("vec"), col("sel_vec"))).as("max_sim"))
    val scored = stepCand
      .join(maxSim, Seq("query_id", "rank", "id"), "left")
      .withColumn("__score", mmrScore(col("rel"),
        coalesce(col("max_sim"), lit(0.0)), lambda))
      .join(sel, Seq("query_id", "rank"))
    val mismatch = scored.filter(col("id") === col("sel_id") &&
        col("__score") =!= col("mmr"))
      .select(col("query_id"), col("rank"), col("id"),
        lit("score_mismatch").as("kind"))
    val beaten = scored.filter(col("id") =!= col("sel_id") &&
        (col("__score") > col("mmr") ||
          (col("__score") === col("mmr") && col("id") < col("sel_id"))))
      .select(col("query_id"), col("rank"), col("id"),
        lit("beaten").as("kind"))
    mismatch.unionByName(beaten)
  }
}
