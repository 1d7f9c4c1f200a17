package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

import graft.functions.TextFunctions

/** Persisted learned-quality model — the build-then-serve form of
  * [[QualityClassifier]], the serving shape a production quality filter
  * actually runs: the logistic weights are TRAINED ONCE (full-batch GD
  * over a labeled snapshot — `iters` passes over its collapsed
  * (features, label) projection) and then every incoming crawl batch is
  * scored against the STORED weights: one row-local map over the batch
  * with the one-row weights frame broadcast in — the training snapshot is
  * never re-read, and scoring shuffles nothing at any batch size.
  * Retraining on drifted labels is a rebuild, like every model/index
  * here.
  *
  * Persistence is the [[DsirModel]] protocol: a one-row `weights/`
  * parquet plus the [[graft.sources.BuildStamp]] meta/commit pair —
  * nothing is ever appended to a model, and scores are only comparable
  * within one weight generation, so the torn-REBUILD stamp is the
  * protection that matters. `meta/` pins the training provenance
  * (doc count, iterations, learning rate) for the audit trail.
  */
object QualityModel {

  /** Train on `docs` labeled by the rule gate
    * ([[TextFunctions.gateRules]] conjunction — the distillation
    * bootstrap) and persist under `path`. Callers with their own labels
    * use the `label` overload. */
  def build(docs: DataFrame, textCol: Column, path: String,
      iters: Int = 40, lr: Double = 4.0): Unit =
    build(docs, textCol,
      TextFunctions.gateRules(textCol).map(_._2).reduce(_ && _),
      path, iters, lr)

  /** Train logistic weights for `label` over the margin features of
    * `textCol` and persist them (`weights/` parquet, `meta/` + `commit/`
    * stamps). */
  def build(docs: DataFrame, textCol: Column, label: Column, path: String,
      iters: Int, lr: Double): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val buildId = graft.sources.BuildStamp.newId()
    val n = docs.count()
    Seq((n, iters, lr, buildId))
      .toDF("n_docs", "iters", "lr", "build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    QualityClassifier.train(docs,
        QualityClassifier.marginFeatures(textCol), label, iters, lr)
      .coalesce(1) // one row — one file serves every later broadcast
      .write.mode(SaveMode.Overwrite).parquet(s"$path/weights")
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  /** The stored one-row weights frame (`w: array<double>`), torn-rebuild
    * checked. */
  def weights(spark: SparkSession, path: String): DataFrame = {
    graft.sources.BuildStamp.requireCommitted(spark, path,
      spark.read.parquet(s"$path/meta").head(), "quality model")
    spark.read.parquet(s"$path/weights")
  }

  /** Score a batch against the STORED weights — identical semantics to
    * [[QualityClassifier.classify]] under the training-time features:
    * adds `quality_score` and `kept`. Row-local; the model broadcasts. */
  def score(path: String, docs: DataFrame, textCol: Column,
      threshold: Double = 0.5): DataFrame =
    QualityClassifier.classify(docs, weights(docs.sparkSession, path),
      QualityClassifier.marginFeatures(textCol), threshold)

  /** Keep only batch docs the stored model scores at or above
    * `threshold` — the gate form a quality-filtered ingest composes with
    * its sink. A pure function of stored weights and the doc's text, so
    * replayed batches gate identically. */
  def gate(path: String, docs: DataFrame, textCol: Column,
      threshold: Double = 0.5): DataFrame =
    score(path, docs, textCol, threshold)
      .filter(col("kept")).drop("quality_score", "kept")
}
