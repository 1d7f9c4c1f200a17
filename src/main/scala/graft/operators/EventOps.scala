package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators over the `events` table (and, via [[graft.streaming.EventStreams]],
  * over the equivalent stream). Everything here is a `DataFrame => DataFrame`
  * transform so the exact same code runs in batch (judged/oracled) and under
  * Structured Streaming.
  */
object EventOps {

  /** As-of join: for each left event, the most recent right event with
    * right.ts <= left.ts for the same user (ties at equal ts include the
    * right event).
    *
    * Spark lacks a native as-of join; rather than a per-key loop or an
    * exploding range join, this uses the union-and-window formulation:
    * tag both sides, sort each user's events once, and carry the last seen
    * right-side timestamp forward. ONE shuffle (by user), O(n log n) within
    * partitions, no candidate blow-up — the formulation that survives 100 TB,
    * and skew-safe as long as a single user's events fit a partition. */
  def asofJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"))
    val r = right.select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
      lit(0).as("side"))
    // side asc puts the right event first at equal ts ⇒ ">=" as-of semantics
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("view_ts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("view_ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("view_ts"))
  }

  /** Tumbling-window counts/sums. `sum` is exact decimal, surfaced as double
    * (Registry determinism contract). Works identically on a stream after
    * `withWatermark`. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(24,6)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window counts (width/slide). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Gap-based sessions per user: one row per session with start/end and
    * event count. `session_window` in batch mode; the same expression is the
    * streaming stateful-session operator under a watermark. */
  def sessionize(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Per-user event-type count pivot over a FIXED type list (required: an
    * unbounded pivot would collect distinct types to the driver). Missing
    * combos are 0, matching SQL conditional aggregation. */
  def pivotCounts(events: DataFrame, types: Seq[String]): DataFrame = {
    val p = events.groupBy("user_id").pivot("event_type", types).agg(count(lit(1)))
    types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
  }

  /** Parse the `props` JSON string into a typed map and extract key `k` as a
    * bigint — schema-on-read over a semi-structured column. */
  def propsKey(events: DataFrame, key: String): DataFrame =
    events.select(col("event_id"),
      from_json(col("props"), lit("map<string,bigint>"))(key).as(key))
}
