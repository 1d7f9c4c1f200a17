package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake zone: one nested document per channel with four embedded entity
  * arrays (K1, /root/reference/app.py:236–250), persisted as parquet
  * partitioned by channel.
  *
  * The reference stores RAW extract output in the lake and cleans only on a
  * dead in-memory path (SURVEY §3.1) — we therefore also persist the raw
  * entity rows and apply cleaning at migration, where it takes effect.
  *
  * Scale posture: document assembly is four grouped collect_lists co-keyed
  * on channel_id (shuffle per entity, no driver collection); the write is
  * partitioned by channel_name so downstream per-channel reads prune.
  */
object Lake {

  /** Assemble nested per-channel documents from the four entity tables.
    * Channels with no playlists/videos/comments get empty arrays (the
    * reference would store empty lists likewise). */
  def buildDocuments(channels: DataFrame, playlists: DataFrame,
      videos: DataFrame, comments: DataFrame): DataFrame = {
    val ch = channels
      .groupBy("channel_id", "channel_name")
      .agg(collect_list(struct(channels.columns.map(col): _*)).as("channel_details"))
    val pl = playlists
      .groupBy("channel_id")
      .agg(collect_list(struct(playlists.columns.map(col): _*)).as("playlist_details"))
    val vd = videos
      .groupBy("channel_id")
      .agg(collect_list(struct(videos.columns.map(col): _*)).as("video_details"))
    // comments attach to channels through videos (comment rows carry only
    // video_id, app.py:184–189)
    val cm = comments
      .join(videos.select(col("video_id"), col("channel_id")), "video_id")
      .groupBy("channel_id")
      .agg(collect_list(struct(comments.columns.map(col): _*)).as("comment_details"))
    ch.join(pl, Seq("channel_id"), "left")
      .join(vd, Seq("channel_id"), "left")
      .join(cm, Seq("channel_id"), "left")
      .select(
        col("channel_name"),
        col("channel_details"),
        coalesce(col("playlist_details"), array()).as("playlist_details"),
        coalesce(col("video_details"), array()).as("video_details"),
        coalesce(col("comment_details"), array()).as("comment_details"))
  }

  /** K1 — lake write, one partition directory per channel (the analogue of
    * the reference's per-channel Mongo collection, app.py:245–246). */
  def write(docs: DataFrame, lakePath: String): Unit =
    docs.write.mode("append").partitionBy("channel_name").parquet(lakePath)

  /** S5 — lake scan: ONE read reused for all four entity extractions
    * (the reference re-reads the same document 4×, app.py:297,319,349,369 —
    * a quirk we do not replicate). */
  def read(spark: SparkSession, lakePath: String): DataFrame =
    spark.read.parquet(lakePath)
}
