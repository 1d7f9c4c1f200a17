package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring — Data Selection via Importance
  * Resampling (Xie et al. 2023, arXiv:2302.03169): select raw-corpus
  * documents whose hashed-token profile looks like a TARGET corpus (a
  * small curated slice — wiki/books in the paper) rather than like the raw
  * pool. Every token hashes into one of [[Buckets]] buckets; target and
  * raw each induce an add-one-smoothed categorical distribution over
  * buckets; a document's importance score is the sum over its tokens of
  * ln(p_target[bucket] / q_raw[bucket]) — its log likelihood ratio under
  * the two bucket models. High score = looks like the target. The
  * north-star LLM-pipeline scope (BASELINE.json): the reference app has no
  * data-selection stage at all.
  *
  * Determinism contract (SURVEY §7.4): the only transcendental (ln) is
  * evaluated per BUCKET (≤ [[Buckets]] values), with each double factor an
  * exactly-representable integer so the product/quotient are IEEE-identical
  * across engines, then rounded to 6dp and scaled to a long. Per-document
  * scores are exact integer sums of those longs — order-independent under
  * any partitioning, and bit-identical in DuckDB, which re-derives the
  * same buckets from the same md5 digests (a strpos fold over the first 3
  * hex chars mirrors [[bucket]]'s base-16 parse).
  *
  * Scale shape (100 TB): each distribution estimate is one
  * map-side-combined count per bucket (≤ [[Buckets]] rows out of its
  * scan); the ratio table derives from those two tiny frames plus their
  * one-row totals (broadcast); scoring explodes tokens row-locally,
  * broadcast-joins the ratio table, and map-side-combines the doc-keyed
  * sum (a doc's tokens never leave their partition before the partial
  * agg). No shuffle ever carries the corpus; [[select]] is a bounded
  * top-k (TakeOrderedAndProject), never a global sort.
  */
object Dsir {

  /** Bucket count for the hashed-token distributions (the paper uses 10^4;
    * 4096 = 3 hex chars keeps the cross-engine hash trivially portable). */
  val Buckets = 4096

  /** Hashed-token bucket in [0, [[Buckets]]): the first 3 hex chars of
    * md5(token), parsed base-16. Engine-portable (DuckDB folds the same
    * chars positionally) and uniform enough for distribution hashing. */
  def bucket(token: Column): Column =
    conv(substring(md5(token), 1, 3), 16, 10).cast("long")

  /** (bucket, n) token-bucket counts of a corpus slice's text column. */
  private def bucketCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(textCol)).as("__tok"))
      .select(bucket(col("__tok")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** The ≤ [[Buckets]]-row log-likelihood-ratio table:
    * (bucket, lr_scaled) with lr_scaled = round(round(ln(p/q), 6)·10^6)
    * as a long, where p = (ct+1)/(nt+B) and q = (cr+1)/(nr+B) are the
    * add-one-smoothed bucket probabilities (ct/cr = target/raw counts of
    * the bucket, nt/nr = total target/raw tokens, B = [[Buckets]]). The
    * quotient is computed as ((ct+1)·(nr+B)) / ((cr+1)·(nt+B)) with each
    * factor cast to double BEFORE the multiply — at 100 TB the exact
    * integer product would overflow a long, while the double form stays
    * IEEE-deterministic on every engine. Buckets unseen in both corpora
    * carry no tokens, so they never contribute to a score and are simply
    * absent. */
  def bucketLogRatios(target: DataFrame, targetText: Column,
      raw: DataFrame, rawText: Column): DataFrame = {
    val tc = bucketCounts(target, targetText)
    val rc = bucketCounts(raw, rawText)
    val totals = tc.agg(coalesce(sum("n"), lit(0L)).as("nt"))
      .crossJoin(rc.agg(coalesce(sum("n"), lit(0L)).as("nr")))
    val num = (col("ct") + 1).cast("double") *
      (col("nr") + lit(Buckets.toLong)).cast("double")
    val den = (col("cr") + 1).cast("double") *
      (col("nt") + lit(Buckets.toLong)).cast("double")
    tc.select(col("bucket"), col("n").as("ct"))
      .join(rc.select(col("bucket"), col("n").as("cr")), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(round(log(num / den), 6) * 1000000, 0).cast("long").as("lr_scaled"))
  }

  /** (doc_id, score, n_tokens) importance scores for EVERY raw document
    * with non-null text — guaranteed one row per such doc: score = Σ over
    * tokens of the token's bucket log-ratio (exact long sum of the
    * pre-rounded per-bucket values, surfaced as a double at the end).
    * Null-text docs are excluded; a doc with no in-ratio tokens still gets
    * a row with score 0. Tokens whose bucket is absent from `ratios`
    * contribute 0 to the score but do count in n_tokens — such tokens can
    * only occur when scoring docs OUTSIDE the pool `ratios` was trained on
    * (in the DSIR setup raw ⊆ training, so every bucket is present).
    * `ratios` is broadcast — it is ≤ [[Buckets]] rows by construction. */
  def importanceScores(raw: DataFrame, idCol: Column, textCol: Column,
      ratios: DataFrame): DataFrame =
    Parallelism.fanOut(raw.select(idCol.as("doc_id"), textCol.as("__text"))
        .filter(col("__text").isNotNull))
      .select(col("doc_id"),
        explode_outer(graft.functions.TextFunctions.tokens(col("__text"))).as("__tok"))
      .select(col("doc_id"), bucket(col("__tok")).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg((coalesce(sum(col("lr_scaled")), lit(0L)).cast("double") / 1000000.0)
          .as("score"),
        count(col("bucket")).as("n_tokens"))

  /** Importance selection: the k highest-scoring documents, ties broken by
    * doc_id ascending — deterministic on any engine or layout. Top-k, not
    * a global sort: per-partition heaps merge k rows on the driver. */
  def select(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
}
