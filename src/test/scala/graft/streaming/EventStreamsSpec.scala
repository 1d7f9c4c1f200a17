package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.EventOps

/** Streaming semantics = batch semantics: the same EventOps transforms run
  * under readStream + watermark and must produce the batch answer once the
  * stream drains (AvailableNow). Late-data handling is exercised by feeding
  * a second file older than the watermark horizon.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    (id, Timestamp.valueOf(t), user, typ, v, """{"k": 1}""")

  private val batch1 = Seq(
    ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
    ev(2, "2024-01-01 10:15:00", 1, "click", 2.0),
    ev(3, "2024-01-01 11:05:00", 2, "view", 3.0),
    ev(4, "2024-01-01 12:30:00", 2, "click", 4.0))

  test("late-data metrics: listener reports observed rows and watermark drops") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val events = EventStreams.withIngestMetrics(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val listener = new EventStreams.LateDataListener
    spark.streams.addListener(listener)
    val q = EventStreams.tumblingCounts(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("late_metrics_out")
      .outputMode("append").start()
    try {
      // batch 1 advances the watermark to 11:50 (max ts 12:00 - 10 min)
      input.addData(ev(1, "2024-01-01 12:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: two events behind the watermark (windows long closed) and
      // one fresh — exactly the late two must be dropped before state.
      // numRowsDroppedByWatermark counts rows REACHING the state store,
      // i.e. after map-side partial aggregation, so the late events sit in
      // different windows to stay two distinct state rows
      input.addData(
        ev(2, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(3, "2024-01-01 10:06:00", 1, "view", 1.0),
        ev(4, "2024-01-01 12:05:00", 1, "click", 1.0))
      q.processAllAvailable()
      // progress events are delivered on a listener bus thread — poll
      val deadline = System.nanoTime() + 10_000_000_000L
      while ((listener.lateRowsDropped(q) < 2 || listener.rowsObserved(q) < 4)
          && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.lateRowsDropped(q) == 2,
        s"expected exactly 2 late rows dropped, got ${listener.lateRowsDropped(q)}")
      assert(listener.rowsObserved(q) == 4,
        s"expected 4 rows observed pre-drop, got ${listener.rowsObserved(q)}")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("tumbling window on a drained stream equals the batch result") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val df = batch1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.parquet(s"$dir/in")

    val streamed = EventStreams.tumblingCounts(
      EventStreams.readEvents(spark, s"$dir/in"), "1 hour", "2 hours")
    val q = EventStreams.startMemorySink(streamed, "tumbling_out")
    q.awaitTermination(60000)

    val got = rowSet(spark.table("tumbling_out"))
    val want = rowSet(EventOps.tumbling(df, "1 hour"))
    assert(got == want && got.nonEmpty)
  }

  test("stream-static enrichment: dimension broadcast-joins each batch, unmatched rows null-pad") {
    val dir = Files.createTempDirectory("graft-enrich").toString
    batch1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    val dim = Seq((1L, "gold")).toDF("user_id", "tier") // user 2 has no tier
    val streamed = EventStreams.enrichedEvents(
      EventStreams.readEvents(spark, s"$dir/in"), dim, "user_id")
      .select("event_id", "user_id", "tier")
    val q = EventStreams.startMemorySink(streamed, "enriched_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    q.awaitTermination(60000)
    val got = rowSet(spark.table("enriched_out"))
    assert(got === Seq("[1,1,gold]", "[2,1,gold]", "[3,2,null]", "[4,2,null]"))
  }

  test("stream-stream join equals the batch interval join on a drained stream") {
    val dir = Files.createTempDirectory("graft-ssj").toString
    val data = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
      ev(2, "2024-01-01 10:30:00", 1, "purchase", 5.0),
      ev(3, "2024-01-01 12:00:00", 1, "purchase", 5.0), // no view within 1h
      ev(4, "2024-01-01 09:00:00", 2, "view", 1.0),
      ev(5, "2024-01-01 09:40:00", 2, "purchase", 2.0))
    val df = data.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.parquet(s"$dir/in")
    val joined = EventStreams.purchaseViewJoin(
      EventStreams.readEvents(spark, s"$dir/in"), "2 hours")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(rowSet(spark.table("ssj_out")) == Seq("[2,1,1]", "[5,4,2]"))
  }

  test("left-outer stream-stream join: unmatched purchases null-pad once the watermark evicts them") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val data = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
      ev(2, "2024-01-01 10:30:00", 1, "purchase", 5.0),
      ev(3, "2024-01-01 12:00:00", 1, "purchase", 5.0), // no view within 1h
      ev(4, "2024-01-01 09:00:00", 2, "view", 1.0),
      ev(5, "2024-01-01 09:40:00", 2, "purchase", 2.0))
    val q = EventStreams.purchaseViewLeftJoin(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "2 hours")
      .writeStream.format("memory").queryName("ssj_lo_out")
      .outputMode("append").start()
    // watermark pushers: each branch filters to ONE event type below its
    // EventTimeWatermark node (the filter pushes down), so the global (min)
    // watermark only advances when BOTH types see late events — the
    // pushers are matched view+purchase pairs for an unrelated user, which
    // also emit deterministically (matched, never held in state as
    // unmatched). Outer results lag the watermark by construction: the
    // first pair advances it past every core purchase's eviction point,
    // the second runs a batch under that watermark so the null-padded row
    // actually emits.
    val pushers = Seq(
      ev(60, "2024-01-03 00:00:00", 99, "view", 0.0),
      ev(61, "2024-01-03 00:00:00", 99, "purchase", 0.0),
      ev(70, "2024-01-05 00:00:00", 99, "view", 0.0),
      ev(71, "2024-01-05 00:00:00", 99, "purchase", 0.0))
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData(pushers(0), pushers(1))
      q.processAllAvailable()
      input.addData(pushers(2), pushers(3))
      q.processAllAvailable()
      // purchase 3 survives with a null view — the inner join drops it —
      // and the drained result equals the batch left join on the same rows
      assert(rowSet(spark.table("ssj_lo_out")) ==
        Seq("[2,1,1]", "[3,null,1]", "[5,4,2]", "[61,60,99]", "[71,70,99]"))
      assert(rowSet(spark.table("ssj_lo_out")) ==
        rowSet(EventStreams.purchaseViewLeftJoin(
          (data ++ pushers).toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
          "2 hours")))
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids within the watermark horizon") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0), // exact replay
      ev(2, "2024-01-01 10:30:00", 1, "view", 2.0),
      ev(2, "2024-01-01 10:31:00", 1, "view", 2.0), // near-duplicate replay
      ev(3, "2024-01-01 11:00:00", 2, "click", 3.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.parquet(s"$dir/in")
    val q = EventStreams.dedupedEvents(
      EventStreams.readEvents(spark, s"$dir/in"), "2 hours")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("foreachBatch parquet sink is idempotent across replayed input") {
    val dir = Files.createTempDirectory("graft-fb").toString
    val df = batch1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.parquet(s"$dir/in")

    val q1 = EventStreams.startIdempotentParquetSink(
      EventStreams.readEvents(spark, s"$dir/in"), s"$dir/out")
    q1.awaitTermination(60000)
    // a fresh query (new checkpoint) replays the whole input: the sink-side
    // anti-join must keep the target duplicate-free
    val q2 = EventStreams.startIdempotentParquetSink(
      EventStreams.readEvents(spark, s"$dir/in"), s"$dir/out")
    q2.awaitTermination(60000)

    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == batch1.length)
    assert(out.select("event_id").distinct().count() == batch1.length)
  }

  test("DSIR-filtered sink: batches are gated by the STORED model; replay lands exactly once") {
    import graft.operators.DsirModel
    val dir = Files.createTempDirectory("graft-dsirsink").toString
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "text")
    // model trained on the src1/src2 slice vs the full pool, BEFORE any
    // streaming — the sink scores against this stored authority only
    DsirModel.build(docs.filter(col("source").isin("src1", "src2")),
      col("text"), docs, col("text"), s"$dir/model")
    val batch = docs.filter(col("doc_id") < 200).select("doc_id", "text")
    // threshold at the batch's median-ish score so both sides are exercised
    val scores = DsirModel.score(s"$dir/model", batch, col("doc_id"), col("text"))
    val cut = scores.orderBy(org.apache.spark.sql.functions.desc("score"), col("doc_id"))
      .limit(100).orderBy(col("score")).limit(1).collect().head.getDouble(1)
    batch.write.parquet(s"$dir/in1")
    def sink() = EventStreams.startDsirFilteredSink(
      EventStreams.readDocuments(spark, s"$dir/in1"),
      s"$dir/model", s"$dir/lake", cut).awaitTermination(60000)
    sink()
    val lake = spark.read.parquet(s"$dir/lake")
    val expect = batch.join(scores.filter(col("score") >= cut).select("doc_id"),
      Seq("doc_id"), "left_semi")
    assert(rowSet(lake.select("doc_id", "text")) === rowSet(expect),
      "the sink must land exactly the at-or-above-threshold docs")
    assert(lake.count() > 0 && lake.count() < batch.count(),
      "fixture must land some docs and gate others")
    // fresh-checkpoint replay: the gate is a pure function of the stored
    // model, so the anti-join sees every survivor already landed
    sink()
    assert(spark.read.parquet(s"$dir/lake").count() === lake.count(),
      "replay must land nothing")
  }

  test("quality-filtered sink: batches are gated by the STORED weights; replay lands exactly once") {
    import graft.operators.QualityModel
    val dir = Files.createTempDirectory("graft-qualsink").toString
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // weights trained on the full fixture BEFORE any streaming — the sink
    // scores against this stored authority only
    QualityModel.build(docs, col("text"), s"$dir/model")
    val batch = docs.filter(col("doc_id") < 200)
    // every doc delivered TWICE in the same input: an at-least-once
    // upstream can fold a redelivery into one micro-batch, where the
    // landed anti-join alone can't see it — the sink's in-batch dedup must
    batch.union(batch).write.parquet(s"$dir/in1")
    def sink() = EventStreams.startQualityFilteredSink(
      EventStreams.readDocuments(spark, s"$dir/in1"),
      s"$dir/model", s"$dir/lake").awaitTermination(60000)
    sink()
    val lake = spark.read.parquet(s"$dir/lake")
    val expect = QualityModel.gate(s"$dir/model", batch, col("text"))
    assert(rowSet(lake.select("doc_id", "text")) === rowSet(expect),
      "the sink must land exactly the model-kept docs")
    assert(lake.count() > 0 && lake.count() < batch.count(),
      "fixture must land some docs and gate others")
    // fresh-checkpoint replay: the gate is a pure function of the stored
    // weights, so the anti-join sees every survivor already landed
    sink()
    assert(spark.read.parquet(s"$dir/lake").count() === lake.count(),
      "replay must land nothing")
  }

  test("tokenized sink: batches land with columns derived under the STORED " +
      "merge table; redelivery + replay land exactly once") {
    import graft.operators.BpeModel
    val dir = Files.createTempDirectory("graft-bpesink").toString
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    BpeModel.build(docs, col("text"), s"$dir/model", nMerges = 4)
    val batch = docs.filter(col("doc_id") < 150)
    batch.union(batch).write.parquet(s"$dir/in1") // in-batch redelivery
    def sink() = EventStreams.startTokenizedSink(
      EventStreams.readDocuments(spark, s"$dir/in1"),
      s"$dir/model", s"$dir/lake").awaitTermination(60000)
    sink()
    val lake = spark.read.parquet(s"$dir/lake")
    val expect = BpeModel.tokenize(s"$dir/model", batch, col("text"))
    assert(rowSet(lake.select("doc_id", "n_tokens")) ===
      rowSet(expect.select("doc_id", "n_tokens")),
      "landed token counts must match the stored-model derivation")
    assert(lake.count() === batch.count())
    sink() // fresh-checkpoint replay: identical derivation, anti-join lands 0
    assert(spark.read.parquet(s"$dir/lake").count() === lake.count())
  }

  test("gated document sink: near-dups vs prior batches are gated; replay ingests exactly-once") {
    import graft.operators.{BandIndex, Dedup}
    val dir = Files.createTempDirectory("graft-gated").toString
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val (nh, bands, k) = (16, 4, 2)
    val history = docs.filter(col("doc_id") % 2 === 0)
    BandIndex.build(history, col("doc_id"), col("text"), nh, bands, k, s"$dir/idx")

    // batch 1: odd ids < 100 — gate vs the built history index, then land
    val b1 = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 100)
    b1.write.parquet(s"$dir/in1")
    EventStreams.startGatedDocumentSink(
      EventStreams.readDocuments(spark, s"$dir/in1"), s"$dir/idx", s"$dir/lake")
      .awaitTermination(60000)
    val landed1 = spark.read.parquet(s"$dir/lake").localCheckpoint()
    assert(rowSet(landed1) === rowSet(Dedup.incrementalNearDupFilter(
      b1, history, col("doc_id"), col("text"), nh, bands, k)))
    assert(landed1.count() > 0 && landed1.count() < b1.count(),
      "fixture must land some docs and gate others")

    // batch 2: fresh odd ids 100-200 PLUS re-texted copies of batch 1 under
    // new ids — identical text means identical bands, so every copy whose
    // original produced bands must be gated as a near-dup of a PRIOR batch
    val fresh2 = docs.filter(col("doc_id") % 2 === 1 &&
      col("doc_id") >= 100 && col("doc_id") < 200)
    val b2 = fresh2.unionByName(
      b1.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    b2.write.parquet(s"$dir/in2")
    EventStreams.startGatedDocumentSink(
      EventStreams.readDocuments(spark, s"$dir/in2"), s"$dir/idx", s"$dir/lake")
      .awaitTermination(60000)
    // the index after batch 1 holds history ∪ landed1 bands, so batch 2's
    // expected survivors are exactly the recompute over that corpus
    val expect2 = Dedup.incrementalNearDupFilter(
      b2, history.unionByName(landed1), col("doc_id"), col("text"), nh, bands, k)
    val lake2 = spark.read.parquet(s"$dir/lake")
    assert(rowSet(lake2) === rowSet(landed1.unionByName(expect2)))
    // every copied doc that landed must be bandless (nothing to gate on)
    val bandlessCopies = b2.filter(col("doc_id") >= 100000).join(
      Dedup.minhashBands(b2, col("doc_id"), col("text"), nh, bands, k)
        .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val landedCopies = lake2.filter(col("doc_id") >= 100000)
    assert(rowSet(landedCopies) === rowSet(bandlessCopies),
      "copies with bands must be gated as near-dups of prior batches")

    // replay batch 2 under a fresh checkpoint: exactly-once end to end —
    // for BOTH tables. The index must not grow either: replayed docs with
    // indexed bands self-screen at the gate (they match their own band
    // rows), and bandless replays append zero band rows — no per-batch
    // indexed-ids read is needed for this invariant
    val bands2 = BandIndex.bands(spark, s"$dir/idx").count()
    EventStreams.startGatedDocumentSink(
      EventStreams.readDocuments(spark, s"$dir/in2"), s"$dir/idx", s"$dir/lake")
      .awaitTermination(60000)
    val lake3 = spark.read.parquet(s"$dir/lake")
    assert(lake3.count() === lake2.count(), "replay must ingest nothing new")
    assert(lake3.select("doc_id").distinct().count() === lake3.count())
    assert(BandIndex.bands(spark, s"$dir/idx").count() === bands2,
      "replay must append nothing to the band index")
  }

  test("vector index sink: micro-batches append under stored parameters; " +
      "replay lands exactly once") {
    import graft.operators.IvfAdc
    val dir = Files.createTempDirectory("graft-vecsink").toString
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    IvfAdc.build(emb.filter(col("vec_id") < 300), kCoarse = 8, coarseIters = 2,
      m = 4, kSub = 8, pqIters = 1, dim = 64, path = s"$dir/idx")
    val n0 = IvfAdc.codes(spark, s"$dir/idx").count()
    val b1 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    b1.write.parquet(s"$dir/in1")
    EventStreams.startVectorIndexSink(
      EventStreams.readVectors(spark, s"$dir/in1"), s"$dir/idx")
      .awaitTermination(60000)
    assert(IvfAdc.codes(spark, s"$dir/idx").count() === n0 + b1.count(),
      "the micro-batch must append exactly its rows")
    // replay under a fresh checkpoint (at-least-once upstream): the
    // append's id anti-join makes the index itself the idempotent sink
    EventStreams.startVectorIndexSink(
      EventStreams.readVectors(spark, s"$dir/in1"), s"$dir/idx")
      .awaitTermination(60000)
    assert(IvfAdc.codes(spark, s"$dir/idx").count() === n0 + b1.count(),
      "replay must append nothing")
    // appended vectors are served by the same search path
    val res = IvfAdc.searchTopK(spark, s"$dir/idx",
      emb.filter(col("vec_id") < 2), m = 4, dim = 64, k = 5, probes = 8)
    assert(res.count() === 2 * 5)

    // an at-least-once upstream can fold a redelivery into ONE micro-batch
    // (two files, same rows, both available before the sink runs): the
    // persisted-id anti-join can't screen those — append's in-batch dedup
    // must, or duplicate code rows land permanently
    val b2 = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    b2.write.parquet(s"$dir/in2")
    b2.write.mode("append").parquet(s"$dir/in2")
    EventStreams.startVectorIndexSink(
      EventStreams.readVectors(spark, s"$dir/in2"), s"$dir/idx")
      .awaitTermination(60000)
    val codes2 = IvfAdc.codes(spark, s"$dir/idx")
    assert(codes2.count() === n0 + b1.count() + b2.count(),
      "duplicate vec_ids within one micro-batch must land exactly once")
    assert(codes2.groupBy("vec_id").count().filter(col("count") > 1).count() === 0)
  }

  test("graph index sink: micro-batches attach under stored parameters; " +
      "replay + in-batch redelivery land exactly once; new nodes serve") {
    import graft.operators.GraphIndex
    val dir = Files.createTempDirectory("graft-gidxsink").toString
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    GraphIndex.build(emb.filter(col("vec_id") < 300), s"$dir/idx",
      k = 8, iters = 2, revCap = 8)
    val n0 = GraphIndex.vectors(spark, s"$dir/idx").count()
    val b1 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    b1.write.parquet(s"$dir/in1")
    b1.write.mode("append").parquet(s"$dir/in1") // in-batch redelivery
    EventStreams.startGraphIndexSink(
      EventStreams.readVectors(spark, s"$dir/in1"), s"$dir/idx")
      .awaitTermination(60000)
    val v1 = GraphIndex.vectors(spark, s"$dir/idx")
    assert(v1.count() === n0 + b1.count(),
      "duplicate vec_ids within one micro-batch must land exactly once")
    assert(v1.groupBy("vec_id").count().filter(col("count") > 1).count() === 0)
    // replay under a fresh checkpoint: the index IS the idempotent sink
    EventStreams.startGraphIndexSink(
      EventStreams.readVectors(spark, s"$dir/in1"), s"$dir/idx")
      .awaitTermination(60000)
    assert(GraphIndex.vectors(spark, s"$dir/idx").count() === n0 + b1.count(),
      "replay must append nothing")
    // an attached vector serves through the same graph-expand search path
    val res = GraphIndex.searchTopK(spark, s"$dir/idx",
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 302), k = 3, hops = 1)
    assert(res.count() > 0)
  }

  test("lexical index sink: micro-batches append postings; serve equals " +
      "one-shot build; replay lands exactly once; compaction + start-of-batch " +
      "vacuum bound disk; null ids dropped not fatal") {
    import graft.operators.LexIndex
    val dir = Files.createTempDirectory("graft-lexsink").toString
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val terms = Seq("dup", "vector", "window")
    def sink(in: String) = assert(
      EventStreams.startLexIndexSink(
        EventStreams.readDocuments(spark, in), s"$dir/idx", maxSegments = 2)
        .awaitTermination(60000),
      "sink timed out — a still-running query would be a second writer")
    def top(p: String) = LexIndex.searchTopK(spark, p, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def build(upTo: Long) = {
      val p = Files.createTempDirectory("graft-lexsink-full").toString
      LexIndex.build(docs.filter(col("doc_id") < upTo), p, buckets = 8)
      p
    }
    def segDirCount() = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(s"$dir/idx"), spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/idx/postings"))
        .map(_.getPath.getName).count(_.startsWith("seg="))
    }
    LexIndex.build(docs.filter(col("doc_id") < 300), s"$dir/idx", buckets = 8)
    // two files, same rows: an at-least-once upstream folding a redelivery
    // into ONE micro-batch — the ledger screen's in-batch dedup must hold
    val b1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    b1.write.parquet(s"$dir/in1")
    b1.write.mode("append").parquet(s"$dir/in1")
    sink(s"$dir/in1") // -> segments [v0, v1], at the maxSegments=2 bound
    val top400 = top(build(400))
    assert(top(s"$dir/idx") === top400,
      "streamed index must serve bit-equal to the one-shot build")
    // fresh-checkpoint replay of the same input: nothing new lands
    sink(s"$dir/in1")
    assert(top(s"$dir/idx") === top400, "replay must append nothing")
    // third segment crosses maxSegments=2: the sink's append compacts, and
    // the superseded dirs SURVIVE this batch (retention for in-flight
    // readers — vacuum only runs at the START of the next batch)
    docs.filter(col("doc_id") >= 400).write.parquet(s"$dir/in3")
    sink(s"$dir/in3")
    val fullAll = build(Long.MaxValue)
    assert(top(s"$dir/idx") === top(fullAll),
      "compacted streamed index must serve bit-equal to the one-shot build")
    assert(segDirCount() > 1,
      "segments superseded by this batch's compaction must be retained")
    // a null doc_id must NOT poison-pill the stream: the sink filters it
    // (logged) and the batch's START-of-callback vacuum reclaims the
    // segments superseded by the PREVIOUS batch's compaction
    import spark.implicits._
    Seq((null.asInstanceOf[java.lang.Long], "null id row"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in2")
    sink(s"$dir/in2")
    assert(top(s"$dir/idx") === top(fullAll),
      "a null-id-only batch must be dropped, not kill the stream")
    assert(segDirCount() === 1,
      "the next batch's vacuum must reclaim superseded segments")
  }

  test("scd2 dimension sink: time-ordered batches merge to the one-shot " +
      "result; a full replay is a content fixpoint") {
    import graft.warehouse.{AtomicCommit, Scd2}
    val dir = Files.createTempDirectory("graft-scd2sink").toString
    val u1 = Seq(
      (1L, "gold", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "free", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "seg", "ts")
    val u2 = Seq(
      (1L, "plat", Timestamp.valueOf("2024-01-05 00:00:00")),
      (3L, "free", Timestamp.valueOf("2024-01-04 00:00:00")), // new key
      (2L, "free", Timestamp.valueOf("2024-01-06 00:00:00"))) // equal state: no-op
      .toDF("k", "seg", "ts")
    u1.write.parquet(s"$dir/in")
    def run(cp: String): Unit =
      EventStreams.startScd2DimensionSink(
        spark.readStream.schema(u1.schema).parquet(s"$dir/in"),
        s"$dir/wh", "dim", Seq("k"), Seq("seg"), "ts", s"$dir/$cp")
        .awaitTermination(60000)
    run("cp1")
    u2.write.mode("append").parquet(s"$dir/in")
    run("cp1") // the checkpoint resumes: only u2 is a fresh batch
    val cols = Seq("k", "seg", "valid_from", "valid_to")
    val got = AtomicCommit.snapshot(spark, s"$dir/wh", "dim").get.select(cols.map(col): _*)
    // batch-by-batch merging of a time-ordered stream equals one shot
    val seed = u1.select(col("k"), col("seg"), col("ts").as("valid_from"),
      lit(null).cast("timestamp").as("valid_to")).limit(0)
    val want = Scd2.merge(seed, u1.unionByName(u2), Seq("k"), Seq("seg"), "ts")
      .select(cols.map(col): _*)
    assert(rowSet(got) == rowSet(want))
    assert(got.filter(col("valid_to").isNull)
      .groupBy("k").count().filter(col("count") =!= 1).isEmpty,
      "exactly one open version per key")
    // a FRESH checkpoint replays the whole input against the merged
    // dimension: every update is equal-state or stale, so the merge is a
    // fixpoint — a new version publishes, with byte-identical content
    val v0 = AtomicCommit.readManifest(spark, s"$dir/wh")._1
    run("cp2")
    val replayed = AtomicCommit.snapshot(spark, s"$dir/wh", "dim").get
      .select(cols.map(col): _*)
    assert(rowSet(replayed) == rowSet(got))
    assert(AtomicCommit.readManifest(spark, s"$dir/wh")._1 == v0 + 1)
    // the pre-replay snapshot stays time-travelable after the replace
    val atV0 = AtomicCommit.snapshotAt(spark, s"$dir/wh", "dim", v0).get
      .select(cols.map(col): _*)
    assert(rowSet(atV0) == rowSet(got))
  }

  test("atomic two-table sink: events and stats commit together; replay commits nothing") {
    import graft.warehouse.AtomicCommit
    val dir = Files.createTempDirectory("graft-ac-stream").toString
    val df = batch1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.parquet(s"$dir/in")

    val q1 = EventStreams.startAtomicEventSink(
      EventStreams.readEvents(spark, s"$dir/in"), s"$dir/wh")
    q1.awaitTermination(60000)
    val events = AtomicCommit.snapshot(spark, s"$dir/wh", "events").get
    val stats = AtomicCommit.snapshot(spark, s"$dir/wh", "event_stats").get
    assert(events.count() == batch1.length)
    // cross-table consistency: the stats table accounts for exactly the
    // committed event rows — they were published by the same manifest swap
    assert(stats.agg(sum("n_rows")).first().getLong(0) == batch1.length)

    // fresh checkpoint replays the entire input: both tables must stay
    // unchanged (anti-join idempotency inside the atomic commit)
    val q2 = EventStreams.startAtomicEventSink(
      EventStreams.readEvents(spark, s"$dir/in"), s"$dir/wh")
    q2.awaitTermination(60000)
    assert(AtomicCommit.snapshot(spark, s"$dir/wh", "events").get.count() == batch1.length)
    assert(AtomicCommit.snapshot(spark, s"$dir/wh", "event_stats").get
      .agg(sum("n_rows")).first().getLong(0) == batch1.length)
  }

  test("atomic sink crash window: dying between prepare and publish exposes nothing; restart lands exactly-once") {
    import graft.warehouse.AtomicCommit
    val dir = Files.createTempDirectory("graft-ac-crash").toString
    batch1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    val wh = s"$dir/wh"

    // a sink that dies INSIDE the micro-batch, after staging every segment
    // but before the manifest publish — the two-phase commit's crash window
    val crashing = EventStreams.readEvents(spark, s"$dir/in").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val stats = batch.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value"))
          .withColumn("batch_id", lit(batchId))
        AtomicCommit.prepare(batch.sparkSession, wh, Map(
          "events" -> (batch, Seq("event_id")),
          "event_stats" -> (stats, Seq("batch_id", "event_type"))))
        throw new RuntimeException("injected crash between prepare and publish")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashing.awaitTermination(60000)
      throw crashing.exception.get // AvailableNow may report failure here
    }
    // staged segment directories exist on disk, but readers resolve through
    // the manifest only: NO partial snapshot of either table is visible
    assert(AtomicCommit.snapshot(spark, wh, "events").isEmpty)
    assert(AtomicCommit.snapshot(spark, wh, "event_stats").isEmpty)

    // restart with the real sink (fresh checkpoint = full source replay):
    // the retry overwrites the orphaned staged segments and publishes both
    // tables once — no duplicates, counts consistent across tables
    val q = EventStreams.startAtomicEventSink(
      EventStreams.readEvents(spark, s"$dir/in"), wh)
    q.awaitTermination(60000)
    val events = AtomicCommit.snapshot(spark, wh, "events").get
    assert(events.count() == batch1.length)
    assert(events.select("event_id").distinct().count() == batch1.length)
    assert(AtomicCommit.snapshot(spark, wh, "event_stats").get
      .agg(sum("n_rows")).first().getLong(0) == batch1.length)
  }

  test("sessions: gap-separated user activity becomes distinct sessions") {
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "click", 1.0),
      ev(3, "2024-01-01 15:00:00", 1, "click", 1.0) // > 1h gap: new session
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.sessionize(df, "1 hour")
      .orderBy("session_start")
      .select("n_events").as[Long].collect().toSeq
    assert(got == Seq(2L, 1L))
  }

  test("deletion sink: a streamed forget-request batch deletes from the " +
      "lexical and band indexes; replay is a no-op and the ledgers do " +
      "not grow") {
    import graft.operators.{BandIndex, GraphIndex, LexIndex}
    val dir = Files.createTempDirectory("graft-delsink").toString
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val terms = Seq("dup", "vector", "window")
    LexIndex.build(docs, s"$dir/lex", buckets = 8)
    BandIndex.build(docs, col("doc_id"), col("text"),
      numHashes = 16, bands = 4, shingleK = 2, path = s"$dir/band")
    GraphIndex.build(emb, s"$dir/graph", k = 8, iters = 2, revCap = 8)
    // the forget queue: ids >= 300 (text column just satisfies the reader
    // schema; the sink only consumes idCol)
    docs.filter(col("doc_id") >= 300).write.parquet(s"$dir/requests")
    def sink() = assert(
      EventStreams.startDeletionSink(
        EventStreams.readDocuments(spark, s"$dir/requests"), "doc_id",
        lexIndexPath = Some(s"$dir/lex"),
        bandIndexPath = Some(s"$dir/band"),
        graphIndexPath = Some(s"$dir/graph"))
        .awaitTermination(60000),
      "deletion sink timed out")
    def top(p: String) = LexIndex.searchTopK(spark, p, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def ledgerSegs(idx: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$idx/deletes")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.listStatus(p).length else 0
    }
    sink()
    // lexical serve forgets exactly like an index never containing them
    val onlyA = Files.createTempDirectory("graft-delsink-a").toString
    LexIndex.build(docs.filter(col("doc_id") < 300), onlyA, buckets = 8)
    assert(top(s"$dir/lex") === top(onlyA),
      "streamed deletion must serve bit-equal to a never-had-them index")
    // band gate forgets: no bands remain for the deleted ids
    assert(BandIndex.bands(spark, s"$dir/band")
      .filter(col("doc_id") >= 300).isEmpty)
    // graph index forgets: the vector and every edge touching it
    assert(GraphIndex.vectors(spark, s"$dir/graph")
      .filter(col("vec_id") >= 300).isEmpty)
    assert(GraphIndex.edges(spark, s"$dir/graph")
      .filter(col("src") >= 300 || col("dst") >= 300).isEmpty)
    val (lexSegs, bandSegs, graphSegs) =
      (ledgerSegs("lex"), ledgerSegs("band"), ledgerSegs("graph"))
    assert(lexSegs > 0 && bandSegs > 0 && graphSegs > 0)
    // fresh-checkpoint replay of the same requests: every id is already
    // tombstoned, so the deletes are no-ops and no ledger segment lands
    sink()
    assert(top(s"$dir/lex") === top(onlyA), "replayed deletion changes nothing")
    assert(ledgerSegs("lex") === lexSegs && ledgerSegs("band") === bandSegs
        && ledgerSegs("graph") === graphSegs,
      "a replayed forget batch must not grow the tombstone ledgers")
  }

  test("decay-ledger sink: incremental batches, crash replay lands once, serving is exact") {
    val dir = Files.createTempDirectory("graft-decay").toString
    val cp = s"$dir/cp"
    val f1 = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
      ev(2, "2024-01-03 10:00:00", 1, "view", 1.0),
      ev(3, "2024-01-02 10:00:00", 2, "click", 1.0))
    val f2 = Seq(
      ev(4, "2024-01-15 10:00:00", 1, "view", 1.0),
      ev(5, "2024-01-16 10:00:00", 3, "view", 1.0))

    // the spec's own exact mirror of the ev_decay_score weight contract
    def expected(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) = {
      val days = rows.map(r => r._3 -> r._2.toLocalDateTime.toLocalDate)
      val maxDay = days.map(_._2).max
      days.groupBy(_._1).map { case (u, ds) =>
        val s = ds.map { case (_, day) =>
          1L << (30 - java.time.temporal.ChronoUnit.DAYS.between(day, maxDay).toInt / 7)
        }.sum
        u -> (ds.size.toLong, s.toDouble / (1L << 30).toDouble)
      }
    }
    def served(): Map[Long, (Long, Double)] =
      EventOps.decayScoresFromLedger(spark, s"$dir/ledger").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def run(): Unit = EventStreams.startDecayLedgerSink(
      EventStreams.readEvents(spark, s"$dir/in"), s"$dir/ledger", cp)
      .awaitTermination(60000)
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      val d = java.nio.file.Paths.get(dst)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def rmDir(path: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.delete(_))
    }

    f1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    run()
    assert(served() == expected(f1))

    // snapshot the checkpoint BEFORE batch 2 commits (= the crash window)
    copyDir(cp, s"$dir/cp_bak")

    f2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val afterTwo = served()
    assert(afterTwo == expected(f1 ++ f2),
      "serving must equal the batch decay contract over all landed events")
    val partitions = new java.io.File(s"$dir/ledger").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(partitions.size >= 2, s"expected per-batch partitions, got $partitions")

    // crash replay: roll the checkpoint back so batch 2 re-executes under
    // its ORIGINAL id — the overwrite-by-addressing must land it once
    rmDir(cp); copyDir(s"$dir/cp_bak", cp)
    run()
    assert(served() == afterTwo, "replayed batch must overwrite, not double-count")
    val partitionsAfter = new java.io.File(s"$dir/ledger").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(partitionsAfter == partitions,
      "a replayed batch must not mint new ledger partitions")
  }

  test("cusum drift ledger: serving equals the independent batch mirror; crash replay lands once") {
    val dir = Files.createTempDirectory("graft-cusum").toString
    val cp = s"$dir/cp"
    // day gaps inside the range are REAL zeros the statistic must see;
    // the (view, Jan 3) day is torn across the two batches
    val f1 = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
      ev(2, "2024-01-01 11:00:00", 2, "view", 1.0),
      ev(3, "2024-01-03 10:00:00", 1, "click", 1.0))
    val f2 = Seq(
      ev(4, "2024-01-03 10:30:00", 2, "view", 1.0),
      ev(5, "2024-01-05 10:00:00", 3, "view", 1.0))

    // independent Scala mirror of the ev_cusum integer chain
    def expected(rows: Seq[(Long, Timestamp, Long, String, Double, String)])
        : Set[(String, String, Long, Double, Boolean)] = {
      val byDay = rows.groupBy(r =>
        (r._4, r._2.toLocalDateTime.toLocalDate)).view.mapValues(_.size.toLong)
      val d0 = rows.map(_._2.toLocalDateTime.toLocalDate).min(
        Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      val d1 = rows.map(_._2.toLocalDateTime.toLocalDate).max(
        Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      val days = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1)).toSeq
      rows.map(_._4).distinct.flatMap { et =>
        val ns = days.map(d => d -> byDay.getOrElse((et, d), 0L))
        val tt = ns.map(_._2).sum
        val nd = days.size.toLong
        var p = 0L
        var minP = 0L
        ns.map { case (day, n) =>
          p += nd * n - tt
          minP = math.min(minP, p)
          val s = p - math.min(0L, minP)
          (et, day.toString, n, s.toDouble / nd.toDouble, s > tt)
        }
      }.toSet
    }
    def served(): Set[(String, String, Long, Double, Boolean)] =
      EventOps.cusumFromLedger(spark, s"$dir/ledger").collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
    def run(): Unit = EventStreams.startCusumLedgerSink(
      EventStreams.readEvents(spark, s"$dir/in"), s"$dir/ledger", cp)
      .awaitTermination(60000)
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      val d = java.nio.file.Paths.get(dst)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def rmDir(path: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.delete(_))
    }

    f1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    run()
    assert(served() == expected(f1))

    copyDir(cp, s"$dir/cp_bak")
    f2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$dir/in")
    run()
    val afterTwo = served()
    assert(afterTwo == expected(f1 ++ f2),
      "serving must equal the batch cusum contract over all landed events")

    // crash replay: batch 2 re-executes under its original id — the
    // overwrite-by-addressing must land it once, not double the torn day
    rmDir(cp); copyDir(s"$dir/cp_bak", cp)
    run()
    assert(served() == afterTwo, "replayed batch must overwrite, not double-count")
  }

  test("hll register ledger: serving equals the batch sketch over all " +
      "landed docs; checkpoint-rollback replay cannot move the estimate") {
    import graft.operators.HllSketch
    val dir = Files.createTempDirectory("graft-hll").toString
    val cp = s"$dir/cp"
    def docsDF(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def run(): Unit = EventStreams.startHllLedgerSink(
      EventStreams.readDocuments(spark, s"$dir/in"), s"$dir/ledger", cp)
      .awaitTermination(60000)
    def served() =
      HllSketch.estimateFromLedger(spark, s"$dir/ledger").collect().head
    def batchExpected(rows: Seq[(Long, String)]) = HllSketch.estimate(
      HllSketch.registers(docsDF(rows), col("text"))).collect().head
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      val d = java.nio.file.Paths.get(dst)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def rmDir(path: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.delete(_))
    }

    // batch 1, then snapshot the checkpoint (the pre-batch-2 crash window)
    val f1 = (1L to 300L).map(i => (i, s"hll doc text $i"))
    val f2 = (200L to 500L).map(i => (i, s"hll doc text $i")) // overlaps f1
    docsDF(f1).write.parquet(s"$dir/in")
    run()
    assert(served() == batchExpected(f1),
      "ledger serving must equal the batch sketch after one batch")
    copyDir(cp, s"$dir/cp_bak")

    // batch 2 overlaps batch 1: max-merge must absorb re-seen texts
    docsDF(f2).write.mode("append").parquet(s"$dir/in")
    run()
    val afterTwo = served()
    assert(afterTwo == batchExpected(f1 ++ f2),
      "serving must equal the batch sketch over the union of all batches")

    // crash replay: batch 2 re-executes under its ORIGINAL id — idempotent
    // by addressing AND by max-merge algebra
    rmDir(cp); copyDir(s"$dir/cp_bak", cp)
    run()
    assert(served() == afterTwo,
      "a replayed batch must not move the estimate")
    val parts = new java.io.File(s"$dir/ledger").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(parts.size == 2, s"expected two per-batch partitions, got $parts")
  }

  test("cms counter ledger: serving equals the batch sketch over all " +
      "landed docs; checkpoint-rollback replay cannot double-count") {
    import graft.operators.CmsSketch
    val dir = Files.createTempDirectory("graft-cms").toString
    val cp = s"$dir/cp"
    def docsDF(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def run(): Unit = EventStreams.startCmsLedgerSink(
      EventStreams.readDocuments(spark, s"$dir/in"), s"$dir/ledger", cp)
      .awaitTermination(60000)
    val queries = Seq("alpha", "beta", "gamma").toDF("token")
    def served() = CmsSketch
      .estimatesFromLedger(spark, s"$dir/ledger", queries)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def batchExpected(rows: Seq[(Long, String)]) = CmsSketch.estimates(
      CmsSketch.counters(docsDF(rows), col("text")), queries)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      val d = java.nio.file.Paths.get(dst)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def rmDir(path: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.delete(_))
    }

    // every query token's occurrences are torn across the two batches —
    // the additive-merge parity this ledger exists to prove
    val f1 = (1L to 60L).map(i => (i, s"alpha beta filler$i"))
    val f2 = (61L to 100L).map(i => (i, s"alpha gamma filler$i"))
    docsDF(f1).write.parquet(s"$dir/in")
    run()
    assert(served() == batchExpected(f1),
      "ledger serving must equal the batch sketch after one batch")
    copyDir(cp, s"$dir/cp_bak")

    docsDF(f2).write.mode("append").parquet(s"$dir/in")
    run()
    val afterTwo = served()
    assert(afterTwo == batchExpected(f1 ++ f2),
      "serving must equal the batch sketch over the union of all batches")
    // one-sided sanity on a known count: alpha appears exactly 100 times
    assert(afterTwo("alpha") >= 100L, "count-min must never undercount")

    // crash replay: batch 2 re-executes under its ORIGINAL id — counter
    // addition is NOT idempotent, so this passes ONLY by addressing
    // (overwrite of batch_id=N); an append-mode sink would double-count
    rmDir(cp); copyDir(s"$dir/cp_bak", cp)
    run()
    assert(served() == afterTwo,
      "a replayed batch must overwrite its partition, not double-count")
    val parts2 = new java.io.File(s"$dir/ledger").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(parts2.size == 2, s"expected two per-batch partitions, got $parts2")
  }

  test("quantile ledger: served quantiles equal the one-shot batch " +
      "histogram over all landed docs; checkpoint-rollback replay " +
      "cannot double-count") {
    import graft.operators.LogHistogram
    val dir = Files.createTempDirectory("graft-qled").toString
    val cp = s"$dir/cp"
    val qs = Seq(0.5, 0.9)
    def docsDF(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def run(): Unit = EventStreams.startQuantileLedgerSink(
      EventStreams.readDocuments(spark, s"$dir/in"), s"$dir/ledger", cp)
      .awaitTermination(60000)
    def served() = LogHistogram
      .quantilesFromLedger(spark, s"$dir/ledger", qs)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def batchExpected(rows: Seq[(Long, String)]) = LogHistogram.quantiles(
      LogHistogram.buckets(docsDF(rows).filter(col("text").isNotNull),
        length(col("text"))), qs)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      val d = java.nio.file.Paths.get(dst)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def rmDir(path: String): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.delete(_))
    }
    // lengths span several octaves so the second batch lands in buckets
    // the first also populated (the torn-count additive-merge contract);
    // a null-text doc must drop from the population on the sink side
    val f1 = (1L to 40L).map(i => (i, "x" * (10 + i.toInt * 7)))
    val f2 = (41L to 70L).map(i => (i, "y" * (5 + i.toInt * 11))) :+
      ((71L, null.asInstanceOf[String]))
    docsDF(f1).write.parquet(s"$dir/in")
    run()
    assert(served() == batchExpected(f1),
      "ledger serving must equal the batch histogram after one batch")
    copyDir(cp, s"$dir/cp_bak")

    docsDF(f2).write.mode("append").parquet(s"$dir/in")
    run()
    val afterTwo = served()
    assert(afterTwo == batchExpected(f1 ++ f2),
      "serving must equal the batch histogram over the union of batches")
    // the rank guarantee: the true median of the 70 non-null lengths
    // lies inside the served [lo, hi] bracket
    val lens = (f1 ++ f2).flatMap(r => Option(r._2)).map(_.length.toLong)
      .sorted
    val median = lens((math.ceil(0.5 * lens.size) - 1).toInt)
    val (_, _, lo, hi) = afterTwo(0.5)
    assert(lo <= median && median <= hi,
      s"true median $median must fall in the served bracket [$lo, $hi]")

    // crash replay: batch 2 re-executes under its ORIGINAL id — histogram
    // addition is NOT idempotent, so this passes ONLY by addressing
    rmDir(cp); copyDir(s"$dir/cp_bak", cp)
    run()
    assert(served() == afterTwo,
      "a replayed batch must overwrite its partition, not double-count")
  }
}
