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
  * Torn-rebuild protection: `build` writes `meta/` (params + a fresh
  * build_id) BEFORE the bands and a `commit/` marker (the same build_id)
  * AFTER them. A rebuild that crashes anywhere between the two leaves the
  * ids disagreeing, and every subsequent gate/append/ingest fails LOUDLY
  * instead of screening new-parameter batch bands against old-parameter
  * stored bands — the silent-garbage window the meta table exists to close.
  *
  * Maintenance: each `append` lands one small parquet file per batch, so a
  * long-lived index degrades into a small-file storm (footer reads + task
  * scheduling dominate the scan). `append` self-compacts through
  * [[graft.sources.Compaction]] once `bands/` exceeds `maxFiles` fragments,
  * rewriting to `maxFiles / 2` evenly-sized files.
  *
  * CONCURRENCY CONTRACT — single writer. `ingest` is gate-then-append with
  * no cross-caller transaction: two concurrent ingests can BOTH gate the
  * same near-dup pair before either appends, and each admits the other's
  * duplicate. Likewise `append`'s compaction swaps the `bands/` directory
  * (two renames), which a concurrent reader can observe mid-swap. Run one
  * ingest writer at a time (the streaming form — one micro-batch at a time
  * in [[graft.streaming.EventStreams]]-style foreachBatch — satisfies this
  * by construction); concurrent `gate`-only readers are safe between, but
  * not during, writes.
  *
  * Screen semantics are [[Dedup.screenAgainstBands]] — the same single
  * definition the recompute path uses, so the two can't drift (spec-pinned
  * equal in BandIndexSpec).
  */
object BandIndex {

  /** Derive the history's band projection and persist it (plus the MinHash
    * parameters) under `path` (`bands/` parquet, `meta/` + `commit/` one
    * row each — see the torn-rebuild note above). */
  def build(history: DataFrame, idCol: Column, textCol: Column,
      numHashes: Int, bands: Int, shingleK: Int, path: String): Unit = {
    val spark = history.sparkSession
    import spark.implicits._
    val buildId = graft.sources.BuildStamp.newId()
    Seq((numHashes, bands, shingleK, buildId))
      .toDF("num_hashes", "bands", "shingle_k", "build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    Dedup.minhashBands(history, idCol, textCol, numHashes, bands, shingleK)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/bands")
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  /** Repair a compaction that died mid-swap (bands/ parked at bands__old).
    * WRITER-ONLY: a rename from a reader would race a concurrent writer's
    * own swap. Run at the start of every writer sequence — [[ingest]] and
    * the streaming foreachBatch both gate BEFORE their append, so waiting
    * for `append` to self-heal would leave the gate's read failing forever
    * on a torn directory. */
  def recover(spark: SparkSession, path: String): Unit =
    graft.sources.Compaction.recover(spark, s"$path/bands")

  private def params(spark: SparkSession, path: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$path/meta").head()
    graft.sources.BuildStamp.requireCommitted(spark, path, r, "band index")
    (r.getAs[Int]("num_hashes"), r.getAs[Int]("bands"), r.getAs[Int]("shingle_k"))
  }

  private def bandFileCount(spark: SparkSession, path: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/bands")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Extend the index with an ACCEPTED batch's bands (call after its docs
    * actually enter the lake — indexing a rejected batch would poison the
    * gate against data that isn't there). Parameters come from `meta/`.
    * Self-compacts `bands/` to `maxFiles / 2` files once the per-batch
    * appends fragment it past `maxFiles`. Single-writer (see object doc). */
  def append(path: String, accepted: DataFrame, idCol: Column, textCol: Column,
      maxFiles: Int = 64): Unit = {
    val spark = accepted.sparkSession
    val (nh, b, k) = params(spark, path)
    // a compaction that died mid-swap leaves bands/ missing with the only
    // copy parked at bands__old — an Append here would RECREATE bands/ with
    // just this batch and strand the parked history for a later compaction
    // to delete. Restore first (two exists probes when healthy).
    recover(spark, path)
    Dedup.minhashBands(accepted, idCol, textCol, nh, b, k)
      .write.mode(SaveMode.Append).parquet(s"$path/bands")
    if (bandFileCount(spark, path) > maxFiles)
      graft.sources.Compaction.compactToFiles(
        spark, s"$path/bands", math.max(1, maxFiles / 2))
  }

  /** The rows of `newBatch` that share NO band with the indexed history —
    * identical to [[Dedup.incrementalNearDupFilter]] over the corpus the
    * index was built+appended from, but the history side is one read of the
    * stored band projection instead of a re-scan of the history text. */
  def gate(path: String, newBatch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val spark = newBatch.sparkSession
    val (nh, b, k) = params(spark, path)
    // deliberately NO crash recovery here: gate is a READ, and repairing
    // (a rename) from a reader would race a concurrent writer's compaction
    // swap and corrupt the very directory it tried to save. A torn index
    // makes this read fail loudly (missing bands/); the single WRITER
    // repairs it on its next append.
    Dedup.screenAgainstBands(newBatch, idCol,
      Dedup.minhashBands(newBatch, idCol, textCol, nh, b, k),
      spark.read.parquet(s"$path/bands"))
  }

  /** The production ingest step: gate the batch, index the survivors'
    * bands, return the survivors (computed once — the returned frame reads
    * back the materialized screen, not a second gate run). Single-writer
    * (see object doc). */
  def ingest(path: String, newBatch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // writer context: heal a torn compaction BEFORE the gate's read — the
    // gate itself must stay read-only (see its comment)
    recover(newBatch.sparkSession, path)
    val survivors = gate(path, newBatch, idCol, textCol)
      .localCheckpoint(eager = true) // one gate run feeds both uses below
    append(path, survivors, idCol, textCol)
    survivors
  }
}
