package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Persisted MinHash-band index — the build-then-serve form of
  * [[Dedup.incrementalNearDupFilter]], mirroring what [[IvfIndex]] gives the
  * ANN side. The recompute form re-derives the history's band projection on
  * EVERY batch, which at 100 TB of accumulated history is a full corpus
  * re-scan per ingest — the exact cost the gate exists to avoid. Here the
  * band projection IS the index: `build` writes it once (bands × ~40 chars
  * per doc, tiny relative to the text), `gate` screens a new batch against
  * the stored bands (one scan of the BATCH plus a semi-join against the
  * index), and `append` extends the index with an accepted batch's bands —
  * steady-state ingest cost is independent of history size on the text
  * side.
  *
  * The MinHash parameters (numHashes, bands, shingleK) are pinned in a
  * one-row `meta/` table written at build time and re-read by gate/append:
  * band keys are only comparable when derived with identical parameters, so
  * letting a caller pass fresh (possibly different) parameters against a
  * stored index would silently screen against garbage. The stored index is
  * the ONLY parameter authority after build.
  *
  * Screen semantics are [[Dedup.screenAgainstBands]] — the same single
  * definition the recompute path uses, so the two can't drift (spec-pinned
  * equal in BandIndexSpec).
  */
object BandIndex {

  /** Derive the history's band projection and persist it (plus the MinHash
    * parameters) under `path` (`bands/` parquet, `meta/` one row). */
  def build(history: DataFrame, idCol: Column, textCol: Column,
      numHashes: Int, bands: Int, shingleK: Int, path: String): Unit = {
    val spark = history.sparkSession
    Dedup.minhashBands(history, idCol, textCol, numHashes, bands, shingleK)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/bands")
    import spark.implicits._
    Seq((numHashes, bands, shingleK))
      .toDF("num_hashes", "bands", "shingle_k")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  private def params(spark: SparkSession, path: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getAs[Int]("num_hashes"), r.getAs[Int]("bands"), r.getAs[Int]("shingle_k"))
  }

  /** Extend the index with an ACCEPTED batch's bands (call after its docs
    * actually enter the lake — indexing a rejected batch would poison the
    * gate against data that isn't there). Parameters come from `meta/`. */
  def append(path: String, accepted: DataFrame, idCol: Column, textCol: Column): Unit = {
    val (nh, b, k) = params(accepted.sparkSession, path)
    Dedup.minhashBands(accepted, idCol, textCol, nh, b, k)
      .write.mode(SaveMode.Append).parquet(s"$path/bands")
  }

  /** The rows of `newBatch` that share NO band with the indexed history —
    * identical to [[Dedup.incrementalNearDupFilter]] over the corpus the
    * index was built+appended from, but the history side is one read of the
    * stored band projection instead of a re-scan of the history text. */
  def gate(path: String, newBatch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val spark = newBatch.sparkSession
    val (nh, b, k) = params(spark, path)
    Dedup.screenAgainstBands(newBatch, idCol,
      Dedup.minhashBands(newBatch, idCol, textCol, nh, b, k),
      spark.read.parquet(s"$path/bands"))
  }

  /** The production ingest step: gate the batch, index the survivors'
    * bands, return the survivors (computed once — the returned frame reads
    * back the materialized screen, not a second gate run). */
  def ingest(path: String, newBatch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val survivors = gate(path, newBatch, idCol, textCol)
      .localCheckpoint(eager = true) // one gate run feeds both uses below
    append(path, survivors, idCol, textCol)
    survivors
  }
}
