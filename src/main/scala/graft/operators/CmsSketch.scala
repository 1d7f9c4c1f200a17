package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Count-min sketch (Cormode & Muthukrishnan 2005) shared by the judged
  * batch audit (tx_cms_freq) and the streaming counter-ledger sink
  * ([[graft.streaming.EventStreams.startCmsLedgerSink]]) — ONE definition
  * of the depth/width/hash/estimate contract, so the streaming serving
  * path can never drift from the batch formula it is judged against (the
  * HllSketch single-definition discipline).
  *
  * Cross-engine exactness: d = 3 rows × w = 4096 buckets keyed by three
  * DISJOINT 3-hex-digit slices of the engine-portable md5 (the cp_dsir
  * bucket idiom — re-derivable in DuckDB by hex-digit arithmetic), and
  * every counter is an exact long sum, so estimates are exact integers on
  * both engines and min() needs no float contract at all. The estimate is
  * one-sided by construction: est ≥ exact, always.
  *
  * Scale shape: [[counters]] collapses ANY token stream through one
  * map-combined token count, then folds the vocabulary-sized frame into
  * the ≤12,288-counter matrix — the canonical LINEAR sketch. Counter
  * merge is plain addition over (r, bucket): associative and commutative
  * (what makes per-batch ledger partitions batching-invariant) but NOT
  * idempotent — a replayed ledger batch WOULD double-count, so the
  * streaming sink must guarantee exactly-once by ADDRESSING (overwrite of
  * `batch_id=N`), unlike the HLL ledger which is also safe by algebra.
  */
object CmsSketch {

  val Depth = 3
  val Width = 4096

  /** The d=3 (r, bucket) addresses of one token — the SINGLE hash
    * definition; bucket r reads md5 hex digits [1+3r, 3+3r] as a base-16
    * integer in [0, 4095]. */
  def buckets(tokenCol: Column): Column =
    array((0 until Depth).map(r => struct(lit(r).as("r"),
      conv(substring(md5(tokenCol), 1 + 3 * r, 3), 16, 10)
        .cast("long").as("bucket"))): _*)

  /** ≤ d·w rows (r, bucket, c): the count-min counter matrix of the
    * whitespace-token stream of `textCol` over `df`. The raw stream
    * collapses through ONE map-combined token count before the
    * vocabulary-sized frame fans out to its d addresses. */
  def counters(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(textCol))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .select(explode(buckets(col("token"))).as("rb"), col("n"))
      .groupBy(col("rb").getField("r").as("r"),
        col("rb").getField("bucket").as("bucket"))
      .agg(sum(col("n")).as("c"))

  /** Fold any union of counter frames back to ≤ d·w counters — plain
    * addition (linear sketch), associative and commutative, NOT
    * idempotent (see object scaladoc). */
  def merge(ctrs: DataFrame): DataFrame =
    ctrs.groupBy("r", "bucket").agg(sum(col("c")).as("c"))

  /** Point-frequency estimates for the `token` column of `queries`:
    * est = min over the d addressed counters (0 for a never-seen
    * address). The counter matrix is a bounded broadcast; the join is
    * (r, bucket)-keyed — nothing query- or corpus-sized self-joins. */
  def estimates(ctrs: DataFrame, queries: DataFrame): DataFrame =
    queries
      .select(col("token"), explode(buckets(col("token"))).as("rb"))
      .select(col("token"), col("rb").getField("r").as("r"),
        col("rb").getField("bucket").as("bucket"))
      .join(broadcast(merge(ctrs)), Seq("r", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  /** Serve point-frequency estimates from a streaming counter ledger
    * (per-batch `batch_id=N` partitions of counter matrices): sum the
    * ≤ d·w·batches ledger rows back to the merged matrix, then the shared
    * estimate — history (the raw stream) is never re-scanned, and the
    * ledger grows O(d·w) per batch regardless of batch size. */
  def estimatesFromLedger(spark: SparkSession, ledgerDir: String,
      queries: DataFrame): DataFrame =
    estimates(spark.read.parquet(ledgerDir).select("r", "bucket", "c"),
      queries)
}
