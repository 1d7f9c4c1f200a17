package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.EventOps

/** Structured Streaming surface over the `events` table shape. The
  * transforms are the SAME functions as the judged batch queries
  * ([[graft.operators.EventOps]]) — batch verifies the semantics against the
  * DuckDB oracle, and these entry points run them incrementally with
  * watermarked state.
  *
  * Scale posture: state is keyed by (window, event_type) or (user, session)
  * — bounded by the watermark horizon, so state size is O(active keys), not
  * O(stream length). Late data beyond the watermark is dropped
  * deterministically.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream over a directory of event parquet (new files are
    * discovered incrementally — the lake-tail pattern). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked tumbling-window counts/sums — identical output schema to
    * the batch `st_tumbling_window` judged query. */
  def tumblingCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    EventOps.tumbling(events.withWatermark("ts", watermark), width)

  /** Watermarked sliding-window counts. */
  def slidingCounts(events: DataFrame, width: String, slide: String,
      watermark: String): DataFrame =
    EventOps.sliding(events.withWatermark("ts", watermark), width, slide)

  /** Watermarked session windows per user (stateful gap sessions). */
  def sessions(events: DataFrame, gap: String, watermark: String): DataFrame =
    EventOps.sessionize(events.withWatermark("ts", watermark), gap)

  /** Stream-static enrichment: each micro-batch LEFT-joins the (small)
    * static dimension by broadcast — stateless (nothing watermarked,
    * nothing buffered). The static side is re-EXECUTED per batch, but a
    * plain file-backed DataFrame snapshots its file listing at creation —
    * picking up a dimension refresh between batches requires a source with
    * refresh semantics (a table format with snapshot reads, e.g. the
    * AtomicCommit manifest view, or re-resolving the frame per batch in
    * foreachBatch). The streaming counterpart of the batch j2 star join:
    * the fact stream never shuffles, the dimension ships to it. Unmatched
    * events keep null dimension columns (left join) rather than silently
    * dropping — an enrichment gap is a data-quality signal, not a filter. */
  def enrichedEvents(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream join: purchases matched to same-user views
    * within the preceding hour. The time bound plus both watermarks make
    * join state evictable — without them stream-stream state grows without
    * bound. Batch-equivalent: the `ij_interval_join` judged query. */
  def purchaseViewJoin(events: DataFrame, watermark: String): DataFrame = {
    val p = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "view_id", "user_id")
  }

  /** LEFT-OUTER stream-stream join: every purchase emits exactly once —
    * matched purchases as soon as the view arrives, UNMATCHED purchases
    * null-padded only once the watermark passes the last instant a
    * matching view could still arrive (join-state eviction). That delay is
    * the streaming-only semantic vs the inner [[purchaseViewJoin]]: outer
    * results lag the watermark by construction, so a drained-stream
    * comparison must push the watermark past the final purchase. Subtlety:
    * the event-type filters push DOWN below each branch's
    * EventTimeWatermark node, so each branch's watermark advances only on
    * events of its own type — and the global watermark is the MIN of the
    * two. Late events of BOTH types are needed to move it (see the spec's
    * paired pushers). State stays bounded exactly as in the inner form:
    * both sides watermarked plus the 1-hour time-bound condition. */
  def purchaseViewLeftJoin(events: DataFrame, watermark: String): DataFrame = {
    val p = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = events.withWatermark("ts", watermark)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select("purchase_id", "view_id", "user_id")
  }

  /** Streaming ingestion dedup: drop replayed events by id with state
    * bounded by the watermark horizon (`dropDuplicatesWithinWatermark` —
    * plain `dropDuplicates` on a stream keeps every id seen forever; the
    * within-watermark form evicts ids once they can no longer collide with
    * a late replay). The at-least-once → exactly-once repair every
    * replayed-source pipeline needs. */
  def dedupedEvents(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Idempotent micro-batch upsert into a parquet target: each batch is
    * anti-joined against the already-landed keys before appending (the K3
    * idempotency shape, per micro-batch). foreachBatch gives the batch
    * DataFrame API — including joins against the sink — inside a streaming
    * query; combined with [[dedupedEvents]] upstream this survives both
    * source replays and sink-side retries.
    *
    * The anti-join side reads only the key column and is left to the
    * planner (AQE broadcasts it while small, shuffles it once it isn't —
    * the landed key set grows monotonically, so a forced broadcast would
    * eventually exceed memory). At real scale, partition the target by an
    * event-time bucket and anti-join only the partitions a batch can
    * overlap, keeping the re-read bounded by the replay horizon. */
  def startIdempotentParquetSink(events: DataFrame, targetDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existingKeys =
          try spark.read.parquet(targetDir).select("event_id")
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.emptyDataFrame.withColumn("event_id", lit(0L)).limit(0)
          }
        batch.join(existingKeys, Seq("event_id"), "left_anti")
          .write.mode("append").parquet(targetDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Incremental decay-score LEDGER sink — the streaming counterpart of
    * the judged `ev_decay_score` query. Each micro-batch collapses to its
    * per-(user, day) event counts and (re)writes them under the batch's
    * OWN partition (`batch_id=N`); serving
    * ([[graft.operators.EventOps.decayScoresFromLedger]]) merges the
    * partials and applies the exact power-of-two decay weights as of the
    * ledger's latest day.
    *
    * Exactly-once: the write is idempotent BY ADDRESSING — a retried or
    * replayed batch N overwrites `batch_id=N` with identical bytes
    * instead of appending a second copy, the standard foreachBatch
    * (batchId + idempotent write) recipe, so the sink needs no anti-join
    * against its own history and per-batch cost is O(batch), independent
    * of ledger size. This REQUIRES the stable batch ids a checkpoint
    * provides, hence the mandatory `checkpointDir` (a fresh checkpoint
    * renumbers batches — the spec pins the crash-replay semantics by
    * rolling the checkpoint back). Decay granularity is day-bucketed, so
    * per-day counts are sufficient statistics for ANY as-of date: scores
    * re-derive from the compact ledger without ever rescanning events,
    * and a periodic compaction folding old `batch_id` partitions into one
    * keeps partition counts bounded (the index-compaction story). */
  def startDecayLedgerSink(events: DataFrame, ledgerDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(col("user_id"), to_date(col("ts")).as("day"))
          .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
          .write.mode("overwrite")
          .parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming CUSUM drift ledger — the change-detection counterpart of
    * [[startDecayLedgerSink]]'s count ledger: each micro-batch folds its
    * events ONCE into exact (event_type, day, cnt) partial counts in the
    * batch's OWN `batch_id=N` partition (exactly-once by addressing — a
    * replayed batch overwrites itself with identical bytes). The CUSUM
    * statistic itself is computed at SERVE time over the summed ledger
    * ([[graft.operators.EventOps.cusumFromLedger]]): counts torn across
    * any batch boundary sum back exactly, so the streaming path is
    * hash-verified against ev_cusum's own batch oracle (the judged
    * st_cusum_ledger entry). The production drift monitor at 100 TB:
    * each batch aggregates once into a ≤|types|·|days| partial and
    * history is never re-scanned. */
  def startCusumLedgerSink(events: DataFrame, ledgerDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(col("event_type"), to_date(col("ts")).as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
          .write.mode("overwrite")
          .parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming HLL register ledger — the cardinality-sketch counterpart of
    * [[startDecayLedgerSink]]'s count ledger and the streaming face of the
    * judged dq_hll_distinct contract ([[graft.operators.HllSketch]] is the
    * single shared definition): each micro-batch folds its documents to
    * ≤256 (register, max-rank) rows and writes them to the batch's OWN
    * `batch_id=N` partition. Exactly-once TWICE over: by ADDRESSING
    * (a replayed batch overwrites its own partition with identical bytes —
    * the decay-ledger recipe) and by ALGEBRA (register max-merge is
    * idempotent, so even a duplicated partition could not move the
    * estimate). Serving ([[graft.operators.HllSketch.estimateFromLedger]])
    * folds the ≤256·batches ledger rows — the raw stream is never
    * re-scanned, and per-batch ledger growth is O(256) regardless of
    * batch size. */
  def startHllLedgerSink(docs: DataFrame, ledgerDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.HllSketch.registers(batch, col("text"))
          .write.mode("overwrite")
          .parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming count-min counter ledger — the point-frequency counterpart
    * of [[startHllLedgerSink]]'s cardinality ledger
    * ([[graft.operators.CmsSketch]] is the single shared definition): each
    * micro-batch collapses its token stream to the ≤12,288-row counter
    * matrix and writes it to the batch's OWN `batch_id=N` partition.
    * Counter merge is ADDITION (a linear sketch) — associative and
    * commutative, so serving is batching-invariant however the stream was
    * split, but NOT idempotent: a double-landed batch would double-count.
    * Exactly-once therefore rests entirely on ADDRESSING (a replayed
    * batch N overwrites `batch_id=N` with identical bytes), which is why
    * the checkpoint — the source of stable batch ids — is mandatory.
    * Serving ([[graft.operators.CmsSketch.estimatesFromLedger]]) sums the
    * ledger partitions; the raw stream is never re-scanned. */
  def startCmsLedgerSink(docs: DataFrame, ledgerDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.CmsSketch.counters(batch, col("text"))
          .write.mode("overwrite")
          .parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming document-length quantile ledger — the ORDER-STATISTICS
    * member of the sketch-ledger family ([[startHllLedgerSink]]
    * cardinality, [[startCmsLedgerSink]] point frequency):
    * [[graft.operators.LogHistogram]] is the single shared definition.
    * Each micro-batch collapses its `length(text)` stream (null text
    * excluded, the population contract) to the ≤~2k-row log₂-bucket
    * histogram and writes it to the batch's OWN `batch_id=N` partition.
    * Histogram merge is ADDITION — batching-invariant but not
    * idempotent, so exactly-once rests on ADDRESSING (the CmsSketch
    * ledger rule; a replayed batch N overwrites `batch_id=N`). Serving
    * ([[graft.operators.LogHistogram.quantilesFromLedger]]) sums the
    * ledger partitions and answers any quantile with a rank-bracketing
    * bucket; the raw stream is never re-scanned. */
  def startQuantileLedgerSink(docs: DataFrame, ledgerDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.LogHistogram.buckets(
            batch.filter(col("text").isNotNull), length(col("text")))
          .write.mode("overwrite")
          .parquet(s"$ledgerDir/batch_id=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** File-based stream over a directory of document parquet. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentSchema).parquet(dir)

  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** File-based stream over a directory of embedding parquet. */
  def readVectors(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(vectorSchema).parquet(dir)

  /** Streaming near-dup-gated document ingest — the production shape of the
    * [[graft.operators.BandIndex]] pipeline, composing the persisted index
    * with the idempotent parquet sink. Every micro-batch is
    * (1) GATED against the band index (near-dups of anything already
    * ingested drop), (2) anti-joined against landed doc ids (sink-side
    * replay idempotency, the K3 shape), (3) appended to the document lake,
    * then (4) its gate-survivors' bands are appended to the index.
    *
    * The step ORDER closes the crash windows: docs land BEFORE their bands
    * index, so a replay of a batch that crashed between (3) and (4) heals
    * itself — the gate still passes those docs (their bands are absent
    * from the index), the anti-join lands zero duplicate rows, and step
    * (4) finally indexes their bands. Bands re-appended by such a replay
    * are harmless duplicates to the gate's semi-join screen. The reverse
    * order would be a poison pill: indexed-but-unlanded docs would be
    * gated forever on replay and never reach the lake.
    *
    * Single WRITER per (index, lake) pair, per the BandIndex contract —
    * AvailableNow micro-batches satisfy that by construction. */
  def startGatedDocumentSink(docs: DataFrame, indexPath: String,
      targetDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // writer context (this foreachBatch IS the single writer): reclaim
        // segments superseded by earlier batches' compactions — the only
        // safe place for a vacuum is serialized with the appends, and
        // running it at batch START gives concurrent gate-only readers a
        // retention window of the batch cadence (the LexIndex sink's
        // posture). Nothing needs HEALING: the manifest protocol has no
        // torn-directory window.
        graft.operators.BandIndex.vacuum(spark, indexPath)
        val fresh = graft.operators.BandIndex.gate(
            indexPath, batch, col("doc_id"), col("text"))
          .localCheckpoint(eager = true) // one gate run feeds land + index
        val landed =
          try spark.read.parquet(targetDir).select("doc_id")
          catch { case _: org.apache.spark.sql.AnalysisException =>
            fresh.select("doc_id").limit(0)
          }
        fresh.join(landed, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(targetDir)
        // no indexed-ids screen is needed before this append: a replay
        // cannot grow the index, because any replayed doc whose bands ARE
        // already indexed matches its own band rows in the gate's semi-join
        // and never reaches `fresh` (gate and append derive band parameters
        // from the same meta/ authority, so the bands it emits are the
        // bands it screens on), and a zero-band doc re-passing the gate
        // appends zero band rows. The one replay case that does reach here
        // — landing committed, band append crashed — is exactly the heal
        // the docs-before-bands ordering exists for. CONTRACT: doc_id is
        // payload-immutable (an at-least-once source redelivers identical
        // bytes — the same premise every K3 anti-join landing here rests
        // on, which silently ignores a changed-text redelivery too). An
        // upstream that MUTATES text under a reused id would index the new
        // text's bands while the lake keeps the old text; screening that
        // would require comparing text against the whole lake per batch —
        // an update-capable lake (MERGE, see warehouse/Merge) is the right
        // tool for mutable ids, not this append-only sink.
        graft.operators.BandIndex.append(indexPath, fresh,
          col("doc_id"), col("text"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The shared landing protocol of the model-gated document sinks
    * ([[startDsirFilteredSink]], [[startQualityFilteredSink]]): in-batch
    * dedup FIRST (an at-least-once upstream can fold a redelivery into
    * the SAME micro-batch, where the landed anti-join alone wouldn't see
    * it — min(text) is the deterministic survivor pick, the LexIndex
    * ledger-screen discipline), then the model gate, then the K3
    * anti-join append against landed ids. One body so a landing-protocol
    * fix can never drift between the sinks. */
  private def landModelGated(batch: DataFrame, targetDir: String)(
      gate: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    val once = batch.groupBy("doc_id").agg(min("text").as("text"))
    val kept = gate(once)
    val landed =
      try spark.read.parquet(targetDir).select("doc_id")
      catch { case _: org.apache.spark.sql.AnalysisException =>
        kept.select("doc_id").limit(0)
      }
    kept.join(landed, Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(targetDir)
  }

  /** Streaming DSIR-selected document ingest — the SELECTION sibling of
    * [[startGatedDocumentSink]]: every micro-batch is scored against the
    * persisted [[graft.operators.DsirModel]] (the STORED bucket log-ratio
    * authority — the pool the model was trained on is never re-read), docs
    * at or above `minScore` land through [[landModelGated]] (in-batch
    * dedup + the K3 anti-join append). The gate is a pure function of the
    * stored model and the doc's text, so a replayed batch gates
    * identically and the anti-join lands zero rows — no sink-side state
    * beyond the landed table itself. The model is read-only here (no
    * vacuum/maintenance step: nothing is ever appended to a DSIR model;
    * retraining is a rebuild). Single writer per targetDir; AvailableNow
    * micro-batches satisfy that by construction. */
  def startDsirFilteredSink(docs: DataFrame, modelPath: String,
      targetDir: String, minScore: Double): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        landModelGated(batch, targetDir)(b => graft.operators.DsirModel.gate(
          modelPath, b, col("doc_id"), col("text"), minScore))
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming learned-quality-filtered document ingest — the
    * MODEL-QUALITY sibling of [[startDsirFilteredSink]]: every
    * micro-batch is scored against the persisted
    * [[graft.operators.QualityModel]] (the STORED logistic weights — the
    * labeled training snapshot is never re-read), docs the model keeps at
    * `threshold` land through [[landModelGated]] (in-batch dedup + the
    * K3 anti-join append). The gate is a pure row-local function of the
    * stored weights and the doc's text (one broadcast of a one-row frame
    * — nothing shuffles at any batch size), so a replayed batch gates
    * identically and the anti-join lands zero rows. The model is
    * read-only here (retraining is a rebuild). Single writer per
    * targetDir; AvailableNow micro-batches satisfy that by construction. */
  def startQualityFilteredSink(docs: DataFrame, modelPath: String,
      targetDir: String, threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        landModelGated(batch, targetDir)(b => graft.operators.QualityModel
          .gate(modelPath, b, col("text"), threshold))
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming tokenization under a PERSISTED tokenizer
    * ([[graft.operators.BpeModel]]) — the third model-bound sink
    * (selection, quality, now tokenize): each micro-batch lands with its
    * `tokens`/`n_tokens` columns derived under the STORED merge table, so
    * every landed row is comparable within one tokenizer generation (the
    * invariant packing budgets and fertility audits rest on). Exactly-once
    * by the same doc_id anti-join as the gated sinks; tokenization is a
    * pure function of stored rules + text, so a replayed batch derives
    * identical columns and lands zero rows. */
  def startTokenizedSink(docs: DataFrame, modelPath: String,
      targetDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        landModelGated(batch, targetDir)(b => graft.operators.BpeModel
          .tokenize(modelPath, b, col("text")))
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming ANN-index ingest — the vector-side sibling of
    * [[startGatedDocumentSink]]: every micro-batch of (vec_id, embedding)
    * rows appends into a persisted [[graft.operators.IvfAdc]] index
    * (assignment against the STORED coarse centroids, residual encoding
    * under the STORED codebooks). Replay safety comes from `append`'s own
    * id screen — an anti-join against the persisted ids plus an in-batch
    * vec_id dedup (an at-least-once upstream can fold a redelivery into the
    * SAME micro-batch, where the anti-join alone wouldn't see it): a
    * micro-batch retried after a crash or delivered twice lands exactly
    * once, so no sink-side landing table is needed — the index IS the
    * idempotent sink. `append` also self-compacts once the live segment
    * count exceeds `maxSegments`, so a long-lived stream keeps bounded
    * segment and file counts; `maxSegments` is the rewrite-amortization
    * knob — each compaction rewrites the whole code table, admitting
    * ~maxSegments batches between rewrites (see
    * [[graft.operators.IndexIngest]]). Superseded segments are vacuumed at
    * the START of each batch callback (the single writer's context, the
    * only safe place — see the LexIndex sink below), giving concurrent
    * serves a retention window of the batch cadence. Single writer per
    * index, per the IvfAdc contract; AvailableNow micro-batches satisfy
    * that by construction. */
  def startVectorIndexSink(vectors: DataFrame, indexPath: String,
      maxSegments: Int = 16): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.IvfAdc.vacuum(batch.sparkSession, indexPath)
        graft.operators.IvfAdc.append(batch.sparkSession, indexPath, batch,
          maxSegments)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming lexical-index ingest — the third persisted-index sink
    * (documents → [[graft.operators.LexIndex]]), completing the set with
    * [[startGatedDocumentSink]] (near-dup gate) and
    * [[startVectorIndexSink]] (ANN codes): every micro-batch of
    * (doc_id, text) rows appends into the posting lists under the stored
    * bucket authority. Exactly-once comes from `append`'s ledger screen
    * (in-batch dedup + anti-join), atomicity from its manifest publish
    * (postings and corpus stats flip together), and bounded segment counts
    * from its self-compaction. Superseded segments are vacuumed at the
    * START of each batch callback — the sink is the single writer, so the
    * vacuum is serialized with appends by construction (the only safe
    * place for it), a long-lived stream keeps bounded DISK (at most one
    * stale generation), and segments superseded by a batch's compaction
    * survive at least until the NEXT batch starts, giving concurrent
    * serves a retention window of the batch cadence (serve from a
    * quiesced index if that is too small; see the LexIndex concurrency
    * note). Null doc_ids are FILTERED (logged count) rather than refused:
    * `append`'s loud null contract at the operator is right, but at the
    * sink boundary one bad record would otherwise poison-pill the stream —
    * every restart replays the same file and dies again. (The null count
    * is one tiny aggregate job per batch — threading the sink's liveness
    * policy into the operator's exactly-once API to save it would couple
    * the two contracts.) The index IS the idempotent sink, no landing
    * table. Single writer per index; AvailableNow micro-batches satisfy
    * that by construction. */
  def startLexIndexSink(docs: DataFrame, indexPath: String,
      maxSegments: Int = 16): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.LexIndex.vacuum(batch.sparkSession, indexPath)
        val r = batch.agg(count(lit(1)), count(col("doc_id"))).head()
        val dropped = r.getLong(0) - r.getLong(1)
        if (dropped > 0)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"lex-index sink: dropping $dropped null-doc_id row(s) " +
              s"this micro-batch — a null id cannot be screened exactly-once")
        graft.operators.LexIndex.append(batch.sparkSession, indexPath,
          batch.filter(col("doc_id").isNotNull), maxSegments)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming graph-index ingest — the fourth persisted-index sink
    * (vectors → [[graft.operators.GraphIndex]]): every micro-batch of
    * (vec_id, embedding) rows attaches into the persisted k-NN graph —
    * bucket assignment under the STORED planes, candidate edges from
    * bucket mates (index ∪ batch) plus one stored hop, both artifact
    * families published under ONE manifest flip. Exactly-once comes from
    * `append`'s id screen (in-batch dedup + anti-join), bounded segment
    * counts from its self-compaction; superseded segments are vacuumed at
    * the START of each batch callback (the single writer's context — the
    * LexIndex sink's posture), giving concurrent serves a retention
    * window of the batch cadence. Single writer per index; AvailableNow
    * micro-batches satisfy that by construction. */
  def startGraphIndexSink(vectors: DataFrame, indexPath: String,
      maxSegments: Int = 16): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.GraphIndex.vacuum(batch.sparkSession, indexPath)
        graft.operators.GraphIndex.append(batch.sparkSession, indexPath,
          batch, maxSegments)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming right-to-be-forgotten queue — the deletion complement of
    * the three index-ingest sinks: each micro-batch of deletion requests
    * (rows carrying `idCol`) is applied to every configured persisted
    * index via its tombstone `delete` ([[graft.operators.LexIndex.delete]]
    * additionally adjusts the exact BM25 corpus stats). Idempotency needs
    * NO landing table or screen of its own: every `delete` is a no-op for
    * absent and already-deleted ids (the IndexIngest/LexIndex liveness
    * screen), so a replayed or redelivered batch publishes nothing — the
    * ledger cannot grow per replay. Erasure (physical byte removal)
    * remains the compaction's job, on the deployment's deadline cadence.
    * Null ids are filtered (a null can never match a live row, but the
    * scan predicate cost is not worth carrying). Single writer per index;
    * AvailableNow micro-batches satisfy that by construction. */
  def startDeletionSink(requests: DataFrame, idCol: String,
      lexIndexPath: Option[String] = None,
      bandIndexPath: Option[String] = None,
      ivfIndexPath: Option[String] = None,
      ivfAdcPath: Option[String] = None,
      graphIndexPath: Option[String] = None): StreamingQuery =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val ids = batch.select(col(idCol)).filter(col(idCol).isNotNull)
        lexIndexPath.foreach(p => graft.operators.LexIndex.delete(
          spark, p, ids.select(col(idCol).as("doc_id"))))
        bandIndexPath.foreach(p => graft.operators.BandIndex.delete(
          spark, p, ids.select(col(idCol).as("doc_id"))))
        ivfIndexPath.foreach(p => graft.operators.IvfIndex.delete(
          spark, p, ids.select(col(idCol).as("vec_id"))))
        ivfAdcPath.foreach(p => graft.operators.IvfAdc.delete(
          spark, p, ids.select(col(idCol).as("vec_id"))))
        graphIndexPath.foreach(p => graft.operators.GraphIndex.delete(
          spark, p, ids.select(col(idCol).as("vec_id"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Multi-table transactional streaming sink: each micro-batch commits the
    * event rows AND their per-type batch statistics through ONE
    * [[graft.warehouse.AtomicCommit]] manifest publish — a reader sees both
    * tables advance together or not at all (the streaming analogue of the
    * reference's per-channel multi-table commit; the plain
    * [[startIdempotentParquetSink]] gives only single-table atomicity).
    * Idempotency is inherited from the commit's primary-key anti-join: a
    * replayed micro-batch (fresh checkpoint, sink-side retry) commits zero
    * fresh rows to BOTH tables. */
  def startAtomicEventSink(events: DataFrame, warehouseRoot: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stats = batch.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value"))
          .withColumn("batch_id", lit(batchId))
        graft.warehouse.AtomicCommit.commitTables(batch.sparkSession, warehouseRoot, Map(
          "events" -> (batch, Seq("event_id")),
          "event_stats" -> (stats, Seq("batch_id", "event_type"))))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming type-2 SCD maintenance: each micro-batch of timestamped
    * attribute updates merges into the versioned dimension through
    * [[graft.warehouse.Scd2.merge]] and publishes the merged snapshot with
    * ONE [[graft.warehouse.AtomicCommit.replaceTable]] manifest flip —
    * readers see each batch's whole version transition or none of it.
    *
    * Idempotency is CONTENT-level and free by the merge semantics: a
    * replayed micro-batch re-presents updates whose attribute states
    * already equal the dimension's (run-collapse drops them) and whose
    * timestamps don't advance any open version (the stale rule drops the
    * rest), so the merge is a fixpoint — the replay publishes a new
    * version with byte-identical rows (spec'd in EventStreamsSpec).
    * Batch boundaries don't change the result for time-ordered streams:
    * merging b1 then b2 equals merging b1 ∪ b2 at once whenever b2's
    * updates are not older than b1's open versions — late stragglers
    * behind an already-advanced open version are dropped by the declared
    * stale rule (the watermark-discipline analogue for merges).
    *
    * Scale shape: the [[graft.warehouse.Scd2]] merge cost envelope per
    * batch (windows over the small batch, one keyed join against the open
    * slice) plus one full write of the dimension snapshot — dimensions are
    * the SMALL side of a warehouse by construction; fact streams take the
    * append-only sinks. */
  def startScd2DimensionSink(updates: DataFrame, warehouseRoot: String,
      table: String, keys: Seq[String], attrs: Seq[String],
      ts: String, checkpointDir: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val tsType = batch.schema(ts).dataType
        // first-batch seed: an empty dimension with the merged schema
        val seed = batch
          .select((keys ++ attrs).map(col) :+
            col(ts).as("valid_from") :+
            org.apache.spark.sql.functions.lit(null).cast(tsType)
              .as("valid_to"): _*)
          .limit(0)
        val current = graft.warehouse.AtomicCommit
          .snapshot(spark, warehouseRoot, table).getOrElse(seed)
        val merged = graft.warehouse.Scd2
          .merge(current, batch, keys, attrs, ts)
        graft.warehouse.AtomicCommit
          .replaceTable(spark, warehouseRoot, table, merged)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Attach input-row accounting to a (streaming or batch) event frame:
    * `Dataset.observe` counts rows per micro-batch at this point in the
    * plan — BEFORE any watermark drop — and surfaces them through
    * `StreamingQueryProgress.observedMetrics`. Combined with the state
    * operators' dropped-row counters (see [[LateDataListener]]) this gives
    * the ingest-vs-dropped ledger a replayed source needs. Zero extra
    * shuffle: observe piggybacks accumulators on the existing pass. */
  def withIngestMetrics(events: DataFrame): DataFrame =
    events.observe("graft_ingest", count(lit(1)).as("rows_ingested"))

  /** Accumulates per-query late-data metrics from progress events:
    * `lateRowsDropped` sums every state operator's
    * `numRowsDroppedByWatermark` (rows that arrived behind the watermark
    * and were discarded before reaching state), `rowsObserved` sums the
    * [[withIngestMetrics]] counter. Register via
    * `spark.streams.addListener`; progress events are delivered
    * asynchronously, so poll briefly after `processAllAvailable`. */
  final class LateDataListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val dropped =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    private val observed =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()

    def lateRowsDropped(q: StreamingQuery): Long =
      dropped.getOrDefault(q.id, 0L)
    def rowsObserved(q: StreamingQuery): Long =
      observed.getOrDefault(q.id, 0L)

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      val d = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      if (d != 0)
        dropped.merge(p.id, Long.box(d), (a, b) => Long.box(a + b))
      val m = p.observedMetrics
      if (m != null && m.containsKey("graft_ingest"))
        observed.merge(p.id, Long.box(m.get("graft_ingest").getAs[Long]("rows_ingested")),
          (a, b) => Long.box(a + b))
    }
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  }

  /** Start a query writing window aggregates to an in-memory sink `table`
    * (test/demo harness; production would target a parquet/Kafka sink).
    * Complete mode by default: under AvailableNow, append-mode windowed
    * aggregates whose window end hasn't crossed the watermark stay in state
    * and never reach the sink before the query stops. */
  def startMemorySink(df: DataFrame, table: String,
      mode: OutputMode = OutputMode.Complete): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(table)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
}
