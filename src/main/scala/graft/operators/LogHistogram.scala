package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** HDR-style log₂ bucket histogram (Gray's "high dynamic range histogram"
  * shape; the DDSketch/t-digest role with a TRANSCENDENTAL-FREE bucket
  * function) shared by the judged batch derivation and the streaming
  * quantile-ledger sink
  * ([[graft.streaming.EventStreams.startQuantileLedgerSink]]) — ONE
  * definition of the bucket/merge/serve contract, the
  * CmsSketch/HllSketch single-definition discipline.
  *
  * Bucket function: for a non-negative long v, shift = max(0,
  * bitlength(v) − 1 − R) and m = v >> shift — pure integer bit ops
  * (bitlength via the binary-string length, identical in Spark and
  * DuckDB), so bucketing is exact on both engines with no log() and no
  * float boundary cases. Values below 2^(R+1) are bucketed EXACTLY
  * (shift = 0); above, each bucket covers [m<<shift, (m+1)<<shift) with
  * relative width 2^−R (≈3% at R = 5). Distinct (shift, m) buckets have
  * distinct lower bounds (m ≥ 2^R whenever shift ≥ 1), so bucket order
  * by lower bound is a total order aligned with value order.
  *
  * A quantile q is served as the CONTAINING BUCKET of the rank
  * ceil(q·n) element: (lo, hi) brackets the true order statistic by
  * construction — a rank guarantee, not an estimate, so there is no
  * accuracy contract to drift. Counter merge is plain addition over
  * (shift, m): associative/commutative (batching-invariant) but NOT
  * idempotent — the streaming sink must be exactly-once BY ADDRESSING
  * (overwrite of `batch_id=N`), the CmsSketch ledger rule.
  *
  * Scale shape: [[buckets]] is one map-combined groupBy over a
  * projection (the histogram never exceeds (64−R)·2^R + 2^(R+1) ≈ 2k
  * rows regardless of corpus size); serving windows/joins only that
  * bounded frame. */
object LogHistogram {

  /** Sub-bucket resolution bits: buckets per octave = 2^R. */
  val Resolution = 5

  /** max(0, bitlength(v) − 1 − R): the bucket's right-shift. */
  private def shiftOf(v: Column): Column =
    greatest(lit(0), length(bin(v)) - 1 - Resolution)

  /** Per-group log-bucket histograms: ≤ ~2k rows PER KEY of
    * (keys..., shift, m, c) for the non-negative integer `valueCol`
    * over `df` (null AND negative values excluded — out-of-contract rows
    * leave the population rather than corrupting it: a negative long
    * would take shift = 58 with a negative mantissa, silently breaking
    * bucket order and every quantile bracket downstream; callers
    * pre-filter when they want the exclusion explicit). One map-combined
    * groupBy over a projection. */
  def bucketsBy(df: DataFrame, keys: Seq[Column],
      valueCol: Column): DataFrame = {
    val keyed = df.select(keys :+ valueCol.cast("long").as("__v"): _*)
      .filter(col("__v") >= 0)
      .withColumn("shift", shiftOf(col("__v")))
      .withColumn("m", expr("shiftright(__v, shift)"))
    val keyNames = keyed.columns.filterNot(Set("__v", "shift", "m"))
    require(keyNames.length == keys.length,
      "key columns must not be named __v/shift/m (histogram internals)")
    keyed.groupBy((keyNames.map(col) :+ col("shift") :+ col("m")): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** The ungrouped histogram: ≤ ~2k rows (shift, m, c). */
  def buckets(df: DataFrame, valueCol: Column): DataFrame =
    bucketsBy(df, Nil, valueCol)

  /** Fold any union of (optionally keyed) histogram frames back to one
    * histogram per key — plain addition (linear sketch), associative
    * and commutative, NOT idempotent (see object scaladoc). */
  def mergeBy(hists: DataFrame, keys: Seq[String]): DataFrame =
    hists.groupBy((keys.map(col) :+ col("shift") :+ col("m")): _*)
      .agg(sum(col("c")).as("c"))

  def merge(hists: DataFrame): DataFrame = mergeBy(hists, Nil)

  /** Serve quantiles per key from (merged) keyed histograms: one row
    * per (key, q) with the key's population size, the target rank
    * ceil(q·n), and the containing bucket's [lo, hi]. Every frame here
    * is histogram-bounded (≤ ~2k rows per key) — the key-partitioned
    * cumulative window and the per-q argmin never see the corpus. */
  def quantilesBy(hist: DataFrame, keys: Seq[String],
      qs: Seq[Double]): DataFrame = {
    val kcols = keys.map(col)
    val ordW = org.apache.spark.sql.expressions.Window
      .partitionBy(kcols: _*).orderBy("lo")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val allW = org.apache.spark.sql.expressions.Window
      .partitionBy(kcols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val bounded = mergeBy(hist, keys)
      .select(kcols ++ Seq(col("c"),
        expr("shiftleft(m, shift)").as("lo"),
        expr("shiftleft(m + 1, shift) - 1").as("hi")): _*)
      .withColumn("cum", sum(col("c")).over(ordW))
      .withColumn("n", sum(col("c")).over(allW))
    bounded
      .select(kcols ++ Seq(col("cum"), col("n"), col("lo"), col("hi"),
        explode(array(qs.map(lit(_)): _*)).as("q")): _*)
      .filter(col("cum") >= ceil(col("q") * col("n").cast("double")).cast("long"))
      .groupBy((kcols :+ col("q")): _*)
      .agg(min(col("n")).as("n"),
        min_by(struct(col("lo"), col("hi")), col("lo")).as("b"))
      .select(kcols ++ Seq(col("q"), col("n"),
        ceil(col("q") * col("n").cast("double")).cast("long").as("rank"),
        col("b.lo").as("lo"), col("b.hi").as("hi")): _*)
  }

  /** The ungrouped serve: one row per q. */
  def quantiles(hist: DataFrame, qs: Seq[Double]): DataFrame =
    quantilesBy(hist, Nil, qs)

  /** Serve quantiles from a streaming histogram ledger (per-batch
    * `batch_id=N` partitions): sum the histogram-bounded ledger rows
    * back to one histogram, then the shared serve — history is never
    * re-scanned, and the ledger grows O(2k rows) per batch regardless
    * of batch size. */
  def quantilesFromLedger(spark: SparkSession, ledgerDir: String,
      qs: Seq[Double]): DataFrame =
    quantiles(spark.read.parquet(ledgerDir).select("shift", "m", "c"), qs)
}
