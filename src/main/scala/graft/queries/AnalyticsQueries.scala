package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.GreatestPerGroup

/** The reference's 10 analytics queries (SURVEY §2.8;
  * /root/reference/app.py:441–596) over the warehouse tables, each in two
  * equivalent forms: a DataFrame program and the SQL string run through
  * `spark.sql` against the registered views — the pairing mirrors the
  * reference's SQL strings 1:1 and gives free metamorphic testing (both
  * forms must agree; asserted in AnalyticsQueriesSpec).
  *
  * Orderings carry a deterministic tiebreaker (natural key asc) per the
  * SURVEY §7.4 decision — the reference's sorts are non-total.
  */
object AnalyticsQueries {

  /** Q1 — channel names, null-filtered (app.py:441–454; returns channel
    * names only despite its prompt — implemented semantics replicated). */
  def q1(spark: SparkSession): DataFrame =
    spark.table("channel")
      .filter(col("channel_name").isNotNull)
      .select("channel_name")
  val q1Sql = "SELECT channel_name FROM channel WHERE channel_name IS NOT NULL"

  /** Q2 — channels by upload count desc (app.py:459–474). */
  def q2(spark: SparkSession): DataFrame =
    spark.table("channel")
      .select("channel_name", "channel_uploads")
      .orderBy(col("channel_uploads").desc, col("channel_name"))
  val q2Sql =
    "SELECT channel_name, channel_uploads FROM channel ORDER BY channel_uploads DESC, channel_name"

  /** Q3 — top-10 most-viewed videos (app.py:479–499). */
  def q3(spark: SparkSession): DataFrame =
    spark.table("video")
      .select("channel_name", "video_title", "views")
      .orderBy(col("views").desc, col("video_id"))
      .limit(10)
  val q3Sql =
    "SELECT channel_name, video_title, views FROM video ORDER BY views DESC, video_id LIMIT 10"

  /** Q4 — videos by comment count desc (app.py:504–511; the count is the
    * API's pre-aggregated counter — a projection, per SURVEY A4). */
  def q4(spark: SparkSession): DataFrame =
    spark.table("video")
      .select("channel_name", "video_title", "comment_count")
      .orderBy(col("comment_count").desc, col("video_id"))
  val q4Sql =
    "SELECT channel_name, video_title, comment_count FROM video ORDER BY comment_count DESC, video_id"

  /** Q5 — greatest-likes-per-channel, ALL TIES SURVIVE (app.py:516–530,
    * derived-table join J1). */
  def q5(spark: SparkSession): DataFrame =
    GreatestPerGroup.viaJoin(spark.table("video"), "channel_id", "likes")
      .select("channel_name", "video_title", "likes")
      .orderBy(col("likes").desc, col("video_title"))
  val q5Sql =
    """SELECT v.channel_name, v.video_title, v.likes
      |FROM video v
      |JOIN (SELECT channel_id, MAX(likes) AS mx FROM video GROUP BY channel_id) m
      |  ON v.channel_id = m.channel_id AND v.likes = m.mx
      |ORDER BY v.likes DESC, v.video_title""".stripMargin

  /** Q6 — top-10 videos by likes (app.py:535–543). */
  def q6(spark: SparkSession): DataFrame =
    spark.table("video")
      .select("channel_name", "video_title", "likes")
      .orderBy(col("likes").desc, col("video_id"))
      .limit(10)
  val q6Sql =
    "SELECT channel_name, video_title, likes FROM video ORDER BY likes DESC, video_id LIMIT 10"

  /** Q7 — channels by total views desc (app.py:548–556). */
  def q7(spark: SparkSession): DataFrame =
    spark.table("channel")
      .select("channel_name", "channel_views")
      .orderBy(col("channel_views").desc, col("channel_name"))
  val q7Sql =
    "SELECT channel_name, channel_views FROM channel ORDER BY channel_views DESC, channel_name"

  /** Q8 — distinct channels that released videos in 2022 (app.py:561–568). */
  def q8(spark: SparkSession): DataFrame =
    spark.table("video")
      .filter(year(col("release_date")) === 2022)
      .select("channel_name")
      .distinct()
  val q8Sql =
    "SELECT DISTINCT channel_name FROM video WHERE year(release_date) = 2022"

  /** Q9 — average video duration per channel (app.py:574–583); avg cast to
    * double on both forms (SURVEY §7.4 AVG-typing decision). */
  def q9(spark: SparkSession): DataFrame =
    spark.table("video")
      .groupBy("channel_name")
      .agg(avg("duration").cast("double").as("avg_time"))
      .orderBy(col("avg_time").desc, col("channel_name"))
  val q9Sql =
    """SELECT channel_name, CAST(AVG(duration) AS DOUBLE) AS avg_time
      |FROM video GROUP BY channel_name ORDER BY avg_time DESC, channel_name""".stripMargin

  /** Q10 — top-10 videos by comment count (app.py:587–596). */
  def q10(spark: SparkSession): DataFrame =
    spark.table("video")
      .select("channel_name", "video_title", "comment_count")
      .orderBy(col("comment_count").desc, col("video_id"))
      .limit(10)
  val q10Sql =
    "SELECT channel_name, video_title, comment_count FROM video ORDER BY comment_count DESC, video_id LIMIT 10"

  /** Bonus validation pair per SURVEY A4: the TRUE comment count computed
    * from the comment table, versus the API counter the reference trusts. */
  def trueCommentCounts(spark: SparkSession): DataFrame =
    spark.table("video").alias("v")
      .join(spark.table("comment").groupBy("video_id").count().alias("c"),
        Seq("video_id"), "left")
      .select(col("video_id"), col("v.comment_count").as("api_count"),
        coalesce(col("c.count"), lit(0L)).as("true_count"))

  val all: Seq[(String, SparkSession => DataFrame, String)] = Seq(
    ("q1", q1 _, q1Sql), ("q2", q2 _, q2Sql), ("q3", q3 _, q3Sql),
    ("q4", q4 _, q4Sql), ("q5", q5 _, q5Sql), ("q6", q6 _, q6Sql),
    ("q7", q7 _, q7Sql), ("q8", q8 _, q8Sql), ("q9", q9 _, q9Sql),
    ("q10", q10 _, q10Sql))
}
