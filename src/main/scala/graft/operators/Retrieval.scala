package graft.operators

import org.apache.spark.sql.DataFrame
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
}
