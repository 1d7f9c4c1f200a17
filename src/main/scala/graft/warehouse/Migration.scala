package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.model.Schemas

/** Migration: lake documents → four flat warehouse tables
  * (/root/reference/app.py:260–400), with the reference's `.get(k, default)`
  * null-defaults (P3, app.py:307–314,330–343,360–364,378–383) applied as
  * `coalesce`, and its exception-swallowing duplicate-PK idempotency
  * (K3, app.py:392–394) replaced by an explicit anti-join guard.
  *
  * The per-channel driver loop of the reference disappears: all channels
  * migrate in one job per entity table, and the lake is scanned once, not
  * 4× per channel.
  */
object Migration {

  private def strDef(c: Column): Column = coalesce(c, lit("N/A"))
  private def numDef(c: Column): Column = coalesce(c, lit(0L))

  /** Explode one entity array out of the lake documents. */
  private def entity(lake: DataFrame, field: String): DataFrame =
    lake.select(explode(col(field)).as("e")).select(col("e.*"))

  /** Warehouse `channel` (app.py:300–314): channel_age dropped. */
  def channelTable(lake: DataFrame): DataFrame =
    entity(lake, "channel_details").select(
      col("channel_name"),
      col("channel_id"),
      strDef(col("country")).as("country"),
      numDef(col("channel_views")).as("channel_views"),
      numDef(col("subscription")).as("subscription"),
      numDef(col("channel_uploads")).as("channel_uploads"),
      strDef(col("channel_status")).as("channel_status"),
      col("channel_playlist_id"))

  /** Warehouse `playlist` (app.py:354–365). */
  def playlistTable(lake: DataFrame): DataFrame =
    entity(lake, "playlist_details").select(
      col("channel_id"), col("playlist_id"),
      strDef(col("playlist_name")).as("playlist_name"))

  /** Warehouse `video` (app.py:322–345): tags dropped; null likes → 0. */
  def videoTable(lake: DataFrame): DataFrame =
    entity(lake, "video_details").select(
      col("channel_name"), col("channel_id"), col("video_id"),
      strDef(col("video_title")).as("video_title"),
      numDef(col("duration")).as("duration"),
      col("release_date"),
      strDef(col("thumbnail")).as("thumbnail"),
      strDef(col("video_quality")).as("video_quality"),
      numDef(col("views")).as("views"),
      numDef(col("likes")).as("likes"),
      numDef(col("favorite")).as("favorite"),
      numDef(col("comment_count")).as("comment_count"),
      strDef(col("description")).as("description"),
      strDef(col("caption_status")).as("caption_status"))

  /** Warehouse `comment` (app.py:372–385). */
  def commentTable(lake: DataFrame): DataFrame =
    entity(lake, "comment_details").select(
      col("video_id"),
      strDef(col("comment_id")).as("comment_id"),
      strDef(col("author_name")).as("author_name"),
      strDef(col("comments")).as("comments"),
      col("commented_date"))

  /** K3 — idempotent append: only rows whose PK is absent from the existing
    * table are written (the *effect* of the reference's swallowed duplicate-
    * key exception, without the exception). Returns the appended rows. */
  def idempotentAppend(newRows: DataFrame, existingPath: String,
      pk: Seq[String]): Long = {
    val spark = newRows.sparkSession
    // dedupe within the batch too: a re-ingested lake (append-mode writes)
    // carries duplicate PKs that the anti-join against the (possibly empty)
    // existing table would not catch
    val batch = newRows.dropDuplicates(pk)
    // Hadoop FS, not java.io.File: on HDFS/S3 a java.io check is ALWAYS
    // false and would silently skip the anti-join guard, appending
    // duplicate PKs on every re-run
    val target = new org.apache.hadoop.fs.Path(existingPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(existingPath).select(pk.map(col): _*)
        batch.join(existing, pk, "left_anti")
      } else batch
    // materialize BEFORE the append: the anti-join's plan re-reads the
    // target path, so a lazy re-execution after the write would see the
    // freshly appended rows and report zero
    fresh.cache()
    val n = fresh.count()
    fresh.write.mode("append").parquet(existingPath)
    fresh.unpersist()
    n
  }

  /** Full migrate: lake → four warehouse parquet tables, idempotently.
    * Returns per-table appended row counts (the reference's per-channel
    * success prints, app.py:396–400, as data instead of stdout). */
  def migrate(spark: SparkSession, lakePath: String, warehousePath: String): Map[String, Long] = {
    val lake = spark.read.parquet(lakePath)
    Map(
      "channel" -> idempotentAppend(channelTable(lake),
        s"$warehousePath/channel", Seq("channel_id")),
      "playlist" -> idempotentAppend(playlistTable(lake),
        s"$warehousePath/playlist", Seq("playlist_id")),
      "video" -> idempotentAppend(videoTable(lake),
        s"$warehousePath/video", Seq("video_id")),
      "comment" -> idempotentAppend(commentTable(lake),
        s"$warehousePath/comment", Seq("comment_id")))
  }

  /** Register the four warehouse tables as temp views so the SQL form of
    * every analytics query resolves (SURVEY §3.3). */
  def registerViews(spark: SparkSession, warehousePath: String): Unit =
    Seq("channel", "playlist", "video", "comment").foreach { t =>
      spark.read.parquet(s"$warehousePath/$t").createOrReplaceTempView(t)
    }
}
