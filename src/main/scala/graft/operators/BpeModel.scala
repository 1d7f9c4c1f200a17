package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Persisted tokenizer model — the build-then-serve form of
  * [[BpeTrainer]], completing the model family ([[DsirModel]] selection,
  * [[QualityModel]] filtering, now tokenization): the merge table is
  * TRAINED ONCE over a corpus snapshot and every later batch tokenizes
  * under the STORED rules — the invariant an LLM data pipeline lives by,
  * since token counts, packing budgets, and fertility audits are only
  * comparable within one tokenizer generation. Retraining is a rebuild,
  * like every model/index here.
  *
  * Persistence is the [[DsirModel]] protocol: a `rules/` parquet
  * (rank, a, b, cnt — ≤ nMerges rows) plus the
  * [[graft.sources.BuildStamp]] meta/commit pair; `meta/` pins the
  * provenance (doc count, merge count) and the torn-REBUILD stamp makes a
  * crash between meta and rules fail every later read loudly.
  *
  * Serving: the rule table is driver-held by construction (nMerges rows —
  * the same bounded-artifact argument as DsirModel's ≤4096-row ratio
  * table), compiled once per call into the row-local
  * [[BpeTrainer.segmentWord]] fold and shipped inside the projection —
  * tokenizing shuffles nothing at any batch size. */
object BpeModel {

  /** Train `nMerges` BPE rules over `docs` and persist under `path`. */
  def build(docs: DataFrame, textCol: Column, path: String,
      nMerges: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val buildId = graft.sources.BuildStamp.newId()
    val n = docs.count()
    Seq((n, nMerges, buildId))
      .toDF("n_docs", "n_merges", "build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    BpeTrainer.train(docs, textCol, nMerges)
      .coalesce(1) // ≤ nMerges rows — one file serves every later read
      .write.mode(SaveMode.Overwrite).parquet(s"$path/rules")
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  /** The stored merge table (rank, a, b, cnt), torn-rebuild checked. */
  def rules(spark: SparkSession, path: String): DataFrame = {
    graft.sources.BuildStamp.requireCommitted(spark, path,
      spark.read.parquet(s"$path/meta").head(), "bpe model")
    spark.read.parquet(s"$path/rules")
  }

  /** The stored rules as the rank-ordered driver-side list the row-local
    * segmenter folds over. */
  def ruleList(spark: SparkSession, path: String): Seq[(String, String)] =
    rules(spark, path).orderBy("rank")
      .select("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Tokenize a batch under the STORED rules: adds `tokens`
    * (array<string>) and `n_tokens`. Pure row-local map — identical
    * output to [[BpeTrainer.segmentText]] under the training-time table
    * (spec-pinned). */
  def tokenize(path: String, docs: DataFrame, textCol: Column): DataFrame = {
    val rl = ruleList(docs.sparkSession, path)
    docs
      .withColumn("tokens", BpeTrainer.segmentText(textCol, rl))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Fertility audit under the stored tokenizer: per-doc
    * tokens-per-word as a 6dp-rounded double (whitespace words; empty
    * docs report NULL via ANSI-safe division) — the drift metric a
    * tokenizer-pinned pipeline watches as the corpus mix shifts. */
  def fertility(path: String, docs: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    tokenize(path, docs.select(idCol.as("doc_id"), textCol.as("__text")),
        col("__text"))
      .select(col("doc_id"), col("n_tokens"),
        size(filter(split(col("__text"), " "), w => length(w) > 0))
          .cast("long").as("n_words"))
      .withColumn("fertility",
        round(try_divide(col("n_tokens").cast("double"),
          col("n_words").cast("double")), 6))
      .select("doc_id", "n_words", "n_tokens", "fertility")
}
