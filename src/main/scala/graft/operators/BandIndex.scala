package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

import graft.sources.SegmentedTable

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
  * MAINTENANCE is the [[graft.sources.SegmentedTable]] manifest protocol
  * (the same one [[LexIndex]] carries): each append stages its bands as an
  * invisible `bands/seg=<v>/` directory and publishes it with one atomic
  * manifest flip, so a crash anywhere leaves an inert orphan — never a
  * torn directory — and `gate` always reads a complete manifest-pinned
  * snapshot. `append` self-compacts (rewrite the live segments into one,
  * flip) once the live segment count exceeds `maxSegments`, bounding both
  * the per-gate listing cost and the small-file accumulation of a
  * long-lived streaming ingest; superseded segments are RETAINED for
  * in-flight readers until the writer [[vacuum]]s.
  *
  * CONCURRENCY CONTRACT — single writer. `ingest` is gate-then-append with
  * no cross-caller transaction: two concurrent ingests can BOTH gate the
  * same near-dup pair before either appends, and each admits the other's
  * duplicate. Run one ingest writer at a time (the streaming form — one
  * micro-batch at a time in [[graft.streaming.EventStreams]]-style
  * foreachBatch — satisfies this by construction); concurrent `gate`-only
  * readers are safe against appends/compactions (their manifest pins a
  * complete retained snapshot) until the writer vacuums, and never against
  * a concurrent rebuild.
  *
  * Screen semantics are [[Dedup.screenAgainstBands]] — the same single
  * definition the recompute path uses, so the two can't drift (spec-pinned
  * equal in BandIndexSpec).
  */
object BandIndex {

  /** Derive the history's band projection and persist it (plus the MinHash
    * parameters) under `path` (`bands/seg=0/` + manifest, `meta/` +
    * `commit/` one row each — see the torn-rebuild note above). */
  def build(history: DataFrame, idCol: Column, textCol: Column,
      numHashes: Int, bands: Int, shingleK: Int, path: String): Unit = {
    val spark = history.sparkSession
    import spark.implicits._
    val buildId = graft.sources.BuildStamp.newId()
    Seq((numHashes, bands, shingleK, buildId))
      .toDF("num_hashes", "bands", "shingle_k", "build_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    // version past any directory an earlier generation of this index left
    // behind: a rebuild's segment must never collide with a retained one
    val v =
      if (SegmentedTable.manifestExists(spark, path))
        SegmentedTable.readManifest(spark, path).version + 1
      else 0L
    Dedup.minhashBands(history, idCol, textCol, numHashes, bands, shingleK)
      .write.mode(SaveMode.Overwrite)
      .parquet(SegmentedTable.segDir(s"$path/bands", v))
    SegmentedTable.writeManifest(spark, path,
      SegmentedTable.Manifest(v, Seq(v)))
    graft.sources.BuildStamp.commit(spark, path, buildId)
  }

  private def params(spark: SparkSession, path: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$path/meta").head()
    graft.sources.BuildStamp.requireCommitted(spark, path, r, "band index")
    (r.getAs[Int]("num_hashes"), r.getAs[Int]("bands"), r.getAs[Int]("shingle_k"))
  }

  /** The live indexed band rows (doc_id, band, band_key) — one
    * manifest-pinned scan with the tombstone ledger applied
    * ([[IndexIngest.maskTombstones]]); orphan/superseded segments are
    * invisible. */
  def bands(spark: SparkSession, path: String): DataFrame = {
    val m = SegmentedTable.readManifest(spark, path)
    IndexIngest.maskTombstones(spark, path, m,
      SegmentedTable.readKeepSeg(spark, s"$path/bands", m), "doc_id")
  }

  /** Extend the index with an ACCEPTED batch's bands (call after its docs
    * actually enter the lake — indexing a rejected batch would poison the
    * gate against data that isn't there). Parameters come from `meta/`.
    * Stage-then-flip: a crash before the manifest publish leaves an orphan
    * the next append overwrites (same version allocation), so a retried
    * batch lands exactly once. Self-compacts once the live segment count
    * exceeds `maxSegments`. Single-writer (see object doc). */
  def append(path: String, accepted: DataFrame, idCol: Column, textCol: Column,
      maxSegments: Int = 16): Unit = {
    require(maxSegments >= 2, s"maxSegments must be >= 2, got $maxSegments")
    val spark = accepted.sparkSession
    val (nh, b, k) = params(spark, path)
    val m = SegmentedTable.readManifest(spark, path)
    val v = m.version + 1
    val segDir = SegmentedTable.segDir(s"$path/bands", v)
    Dedup.minhashBands(accepted, idCol, textCol, nh, b, k)
      .write.mode(SaveMode.Overwrite)
      .parquet(segDir)
    // a band-less batch (empty, or nothing shingleable — the streaming
    // sink's replay case) stages an empty segment; publishing it would
    // grow the live list per replay and tick the compaction threshold
    // toward a pointless whole-index rewrite. One footer probe of the
    // just-written (flat, single-digit-file) segment decides; the
    // unpublished dir is inert and the next append overwrites it.
    val published = !spark.read.parquet(segDir).isEmpty
    if (published)
      // extras carried verbatim: the tombstone ledger survives appends (a
      // re-indexed doc's new bands are visible anyway — their segment
      // version exceeds every tombstone's del_v)
      SegmentedTable.writeManifest(spark, path,
        SegmentedTable.Manifest(v, m.segments :+ v, m.extras))
    // the bound is enforced even on a skipped (empty) publish — a caller
    // tightening maxSegments must see the index compacted by its next
    // append, whatever that batch contains
    if (m.segments.length + (if (published) 1 else 0) > maxSegments)
      compact(spark, path)
  }

  /** Rewrite the live segments into ONE and publish it with a manifest
    * flip. Superseded segment dirs are RETAINED for in-flight readers;
    * reclaim with [[vacuum]]. The rewrite repartitions to a bounded file
    * count — the band projection is tiny relative to its corpus, so the
    * compacted segment stays few-files even for a large index. */
  def compact(spark: SparkSession, path: String, nFiles: Int = 32): Unit = {
    val m = SegmentedTable.readManifest(spark, path)
    val v = m.version + 1
    // the rewrite materializes the TOMBSTONE-FILTERED view and clears the
    // ledger — logically-deleted docs' bands are physically erased here
    IndexIngest.maskTombstones(spark, path, m,
        SegmentedTable.readKeepSeg(spark, s"$path/bands", m), "doc_id")
      .repartition(math.max(1, nFiles))
      .write.mode(SaveMode.Overwrite)
      .parquet(SegmentedTable.segDir(s"$path/bands", v))
    SegmentedTable.writeManifest(spark, path,
      SegmentedTable.Manifest(v, Seq(v),
        m.extras - IndexIngest.TombstoneKey))
  }

  /** Logical delete of documents by id — a deleted doc's bands stop
    * gating immediately (a later near-duplicate of it is ADMITTED: once
    * the corpus forgets a document, its fingerprint must not keep
    * rejecting lookalikes), and the bytes are physically erased at the
    * next [[compact]]. See [[IndexIngest.delete]] for the
    * versioned-tombstone semantics (a re-ingested doc's new bands stay
    * visible). WRITER-ONLY. */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    params(spark, path) // torn-rebuild check before mutating
    IndexIngest.delete(spark, path, "bands", ids, "doc_id")
  }

  /** Reclaim segment dirs the current manifest does not name (bands AND
    * superseded tombstone-ledger segments). WRITER-ONLY, serialized with
    * append/compact/delete; see [[IndexIngest.vacuum]]. */
  def vacuum(spark: SparkSession, path: String, retainSnapshots: Int = 1): Unit =
    IndexIngest.vacuum(spark, path, "bands", retainSnapshots)

  /** The rows of `newBatch` that share NO band with the indexed history —
    * identical to [[Dedup.incrementalNearDupFilter]] over the corpus the
    * index was built+appended from, but the history side is one read of the
    * stored band projection instead of a re-scan of the history text.
    * Read-only: the manifest pins a complete snapshot even mid-append, so
    * the gate needs no writer-side healing — there is nothing to heal. */
  def gate(path: String, newBatch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val spark = newBatch.sparkSession
    val (nh, b, k) = params(spark, path)
    Dedup.screenAgainstBands(newBatch, idCol,
      Dedup.minhashBands(newBatch, idCol, textCol, nh, b, k),
      bands(spark, path))
  }

  /** The production ingest step: gate the batch, index the survivors'
    * bands, return the survivors (computed once — the returned frame reads
    * back the materialized screen, not a second gate run). Single-writer
    * (see object doc). */
  def ingest(path: String, newBatch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val survivors = gate(path, newBatch, idCol, textCol)
      .localCheckpoint(eager = true) // one gate run feeds both uses below
    append(path, survivors, idCol, textCol)
    survivors
  }
}
