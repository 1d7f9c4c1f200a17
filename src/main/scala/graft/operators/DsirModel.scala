package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Persisted DSIR importance model — the build-then-serve form of
  * [[Dsir]], completing the selection stage's production shape: the
  * log-ratio bucket table is TRAINED ONCE (a target slice vs a raw-pool
  * snapshot — two corpus scans) and then every incoming batch is scored
  * against the STORED table, the way [[BandIndex]] serves its stored bands
  * and [[LexIndex]] its stored postings. Rescoring a new crawl batch costs
  * one scan of the BATCH plus a broadcast of the ≤4096-row model — the
  * pool is never re-read; retraining on a drifted pool is a rebuild,
  * exactly like every index here.
  *
  * The model is ≤ [[Dsir.Buckets]] rows and immutable after build, so
  * persistence is one parquet table plus the [[graft.sources.BuildStamp]]
  * meta/commit pair (no segment manifest needed — nothing is ever
  * appended; scores are only comparable against ONE model generation, so
  * the torn-rebuild stamp is what matters: a crash between a rebuild's
  * meta and its ratios must fail every later score loudly instead of
  * mixing generations). `meta/` also pins the training provenance
  * (n_target/n_raw docs) for the audit trail.
  */
object DsirModel {

  /** Train the bucket log-ratio table on `target` vs `raw` and persist it
    * under `path` (`ratios/` parquet, `meta/` + `commit/` stamps). */
  def build(target: DataFrame, targetText: Column,
      raw: DataFrame, rawText: Column, path: String): Unit = {
    val spark = target.sparkSession
    import spark.implicits._
    val buildId = graft.sources.BuildStamp.newId()
    val nT = target.filter(targetText.isNotNull).count()
    val nR = raw.filter(rawText.isNotNull).count()
    Seq((nT, nR, buildId)).toDF("n_target", "n_raw", "build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    Dsir.bucketLogRatios(target, targetText, raw, rawText)
      .coalesce(1) // ≤4096 rows — one file serves every later broadcast
      .write.mode(SaveMode.Overwrite).parquet(s"$path/ratios")
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  private def requireCommitted(spark: SparkSession, path: String): Unit =
    graft.sources.BuildStamp.requireCommitted(spark, path,
      spark.read.parquet(s"$path/meta").head(), "DSIR model")

  /** The stored log-ratio table (bucket, lr_scaled). */
  def ratios(spark: SparkSession, path: String): DataFrame = {
    requireCommitted(spark, path)
    spark.read.parquet(s"$path/ratios")
  }

  /** Score a batch against the STORED model — identical semantics to
    * [[Dsir.importanceScores]] over the model's training ratios (one row
    * per non-null-text doc, score 0 when no in-ratio tokens; tokens in
    * buckets the training pool never saw count in n_tokens and add 0).
    * Steady-state cost: one scan of the batch + the broadcast model. */
  def score(path: String, docs: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    Dsir.importanceScores(docs, idCol, textCol,
      ratios(docs.sparkSession, path))

  /** Score and keep only batch docs at or above `minScore` — the gate
    * form a selection-filtered ingest composes with its sink. */
  def gate(path: String, docs: DataFrame, idCol: Column, textCol: Column,
      minScore: Double): DataFrame = {
    val keep = score(path, docs, idCol, textCol)
      .filter(col("score") >= minScore)
      .select(col("doc_id").as("__dsir_keep_id"))
    docs.join(keep, idCol === col("__dsir_keep_id"), "left_semi")
  }
}
