package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q
import graft.operators.{EventOps, Graph, SaltedJoin}
import graft.sources.Tables

/** Extension query surface: the operator categories the reference lacks
  * (SURVEY §2.9) but the north star requires — window functions, grouping
  * sets, set ops, range/as-of joins, pivot, JSON map extraction, and the
  * batch-mode equivalents of the streaming windows (the streaming variants of
  * the same transforms live in [[graft.streaming.EventStreams]]).
  */
object ExtQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Temp workspace for the judged streaming-ledger harnesses: created per
    * run and DELETED after the collect-based capture (every harness copies
    * its result into a local frame precisely so it does not depend on the
    * ledger files outliving the call) — repeated judged runs in one JVM
    * must not accumulate disk under java.io.tmpdir. */
  private def withTempDir[A](prefix: String)(body: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    try body(tmp.toString)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }

  // ev_late_sessions is the one entry whose BUILD is an execution: late
  // stragglers exist only ACROSS micro-batches, so the query must actually
  // run a MemoryStream pipeline to have anything to report. Memoized per
  // (session, events-table content) with the fingerprint inside the value
  // (same replace-on-rewrite contract as [[graft.sources.Tables]]): plan-only
  // harnesses (static fingerprints, Bench plan_sec, registry scans) pay the
  // stream once per session instead of two micro-batches + collects per
  // call, and the memory-sink temp view is dropped as soon as its rows are
  // captured — repeated builds leak nothing into the session catalog.
  private val lateSessionsMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  private def lateSessions(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/events.parquet")
    lateSessionsMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runLateSessions(s, d)
        lateSessionsMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Memoized degree-ordered ORIENTATION of the ≥5-shared-viewer
    * co-visitation graph (the knn16 discipline, round-14 directive):
    * [[Graph.orient]] is build-shaped — its lineage-cut checkpoint runs
    * the degree joins on first use — and ev_triangles previously re-ran
    * that build on EVERY construction (86% of its tier-2 bench time was
    * construction). One orientation per (session, events fingerprint,
    * shuffle conf) makes repeated triangle queries what they are at
    * 100 TB: wedge-join reads of a stored oriented graph.
    *
    * Lifetime (round-15 ADVICE): sessions are held WEAKLY (the
    * LazyCheckpoint planners pattern — a dropped session must not be
    * pinned, with its checkpoint RDD blocks, for the JVM lifetime) and
    * the per-session map is keyed by DIR with the (fingerprint, conf)
    * epoch inside the VALUE, so a rewritten fixture or a changed shuffle
    * width REPLACES its entry instead of accreting a new one — bounded
    * by the number of distinct fixture dirs a live session touches. */
  private val orientedCovisMemo = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, (String, DataFrame)]]()

  private def orientedCovisitation(s: SparkSession, d: String): DataFrame = {
    val inner = orientedCovisMemo.synchronized {
      var m = orientedCovisMemo.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        orientedCovisMemo.put(s, m)
      }
      m
    }
    val fp = graft.sources.FileFingerprint.of(s, s"$d/events.parquet") +
      "|shuffle=" + s.conf.get("spark.sql.shuffle.partitions")
    inner.get(d) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = Graph.orient(
          EventOps.covisitationEdges(
            t(s, d, "events").filter(col("event_type") === "view"),
            get_json_object(col("props"), "$.k").cast("long"), minUsers = 5L)
            .select("u", "v"))
        inner.put(d, (fp, df))
        df
    }
  }

  private def runLateSessions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    val labeled = t(s, d, "events")
      .withColumn("brk",
        when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("last_id",
        max(col("session_id")).over(Window.partitionBy("user_id")))
    def evs(df: DataFrame) =
      df.select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.StatefulSessions.Event].collect().toSeq
    val lastSession = evs(labeled.filter(col("session_id") === col("last_id")))
    val earlier = evs(labeled.filter(col("session_id") < col("last_id")))
    implicit val sqlCtx = s.sqlContext
    val stream = MemoryStream[graft.streaming.StatefulSessions.Event]
    val sessions = graft.streaming.StatefulSessions.sessionsFlatMap(
      stream.toDF().withWatermark("ts", "3650 days"), gapMs = 30 * 60 * 1000L)
    val sink = "ev_late_sessions_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sessions.toDF().writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val captured = try {
      stream.addData(lastSession)
      q.processAllAvailable()
      stream.addData(earlier)
      q.processAllAvailable()
      s.table(sink).select("user_id", "session_start", "session_end", "n_events")
        .collect()
    } finally {
      q.stop()
      // in the finally: a failed run must not leak its sink view either
      s.catalog.dropTempView(sink)
    }
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq( // nullability mirrors the
        // ClosedSession encoder schema the memory sink carried
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("session_start",
          org.apache.spark.sql.types.TimestampType, nullable = true),
        org.apache.spark.sql.types.StructField("session_end",
          org.apache.spark.sql.types.TimestampType, nullable = true),
        org.apache.spark.sql.types.StructField("n_events",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** DuckDB oracle for ev_pagerank: the same sessionized edge frame as the
    * ev_markov oracle, then the ten damped fixed-point power iterations
    * UNROLLED as chained CTEs pr0..pr10 (recursive-CTE terms restrict
    * aggregates; unrolling sidesteps the whole question). Every rank is
    * CAST back to BIGINT per iteration so DuckDB's HUGEINT SUM widening
    * cannot diverge from the engine's long arithmetic.
    */
  /** DuckDB oracle for ev_kcore: the SAME 6 peel rounds as
    * [[graft.operators.Graph.kcore]], unrolled — each round recomputes
    * degrees from the surviving edge set and keeps nodes with ≥ 12. */
  private val KcoreOracle: String = {
    // every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and e_i
    // references e_{i-1} three times, so un-materialized unrolling
    // re-plans the base scan 3^6 times (the emb_top_eigen lesson)
    val base = """WITH vi AS MATERIALIZED (
      |  SELECT DISTINCT user_id,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      |  FROM events WHERE event_type = 'view'),
      |e0 AS MATERIALIZED (
      |  SELECT a.item AS u, b.item AS v
      |  FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 4)""".stripMargin
    val rounds = (1 to 6).map { i =>
      s"""n$i AS MATERIALIZED (SELECT node FROM (SELECT u AS node FROM e${i - 1}
         |    UNION ALL SELECT v FROM e${i - 1}) GROUP BY 1
         |  HAVING COUNT(*) >= 12),
         |e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT node FROM n$i)
         |    AND v IN (SELECT node FROM n$i))""".stripMargin
    }.mkString(",\n", ",\n", "")
    base + rounds + """
      |SELECT node AS item, CAST(COUNT(*) AS BIGINT) AS deg
      |FROM (SELECT u AS node FROM e6 UNION ALL SELECT v FROM e6)
      |GROUP BY 1""".stripMargin
  }

  private val PagerankSql: String = {
    val prs = (1 to 10).map { i =>
      s"""pr$i AS (
         |  SELECT nd.node, CAST((150000000000 // nn.n_nodes)
         |    + COALESCE(SUM((((p.r * e.n) // e.out_n) * 17) // 20), 0)
         |    AS BIGINT) AS r
         |  FROM nodes nd CROSS JOIN nn
         |  LEFT JOIN (edges e JOIN pr${i - 1} p ON p.node = e.src)
         |    ON e.dst = nd.node
         |  GROUP BY nd.node, nn.n_nodes)""".stripMargin
    }.mkString(",\n")
    s"""WITH lab AS (
       |  SELECT user_id, event_id, event_type, ts,
       |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
       |      THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM (SELECT user_id, event_id, event_type, ts,
       |          epoch_us(CAST(ts AS TIMESTAMP))
       |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
       |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
       |        FROM events)),
       |tr AS (
       |  SELECT event_type AS src, session_id,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS dst,
       |    lead(session_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS next_sess
       |  FROM lab),
       |e0 AS (SELECT src, dst, COUNT(*) AS n FROM tr
       |       WHERE dst IS NOT NULL AND next_sess = session_id GROUP BY 1, 2),
       |edges AS (
       |  SELECT src, dst, n, CAST(ot.out_n AS BIGINT) AS out_n
       |  FROM e0 JOIN (SELECT src, SUM(n) AS out_n FROM e0 GROUP BY 1) ot
       |    USING (src)),
       |nodes AS (SELECT src AS node FROM edges
       |          UNION SELECT dst AS node FROM edges),
       |nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
       |pr0 AS (SELECT node, CAST(1000000000000 // n_nodes AS BIGINT) AS r
       |        FROM nodes CROSS JOIN nn),
       |$prs
       |SELECT node, r AS rank_scaled,
       |  round(CAST(r AS DOUBLE) / 1000000000000.0, 6) AS rank
       |FROM pr10""".stripMargin
  }

  private val hllLedgerMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Memoized [[runHllLedger]] (the ev_late_sessions harness idiom: judged
    * queries may be invoked repeatedly in one JVM — plan gates, Verify —
    * and the streaming run is deterministic given the fixture, keyed by
    * its file fingerprint). */
  private def hllLedger(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/documents.parquet")
    hllLedgerMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runHllLedger(s, d)
        hllLedgerMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Drive the streaming HLL register ledger end-to-end over the fixture
    * documents — TWO AvailableNow micro-batch runs (even doc_ids, then odd)
    * through [[graft.streaming.EventStreams.startHllLedgerSink]] — and
    * serve the estimate from the ledger. The oracle re-derives the SAME
    * sketch from the parquet in one shot: serving from per-batch register
    * partitions must be batching-invariant (max-merge associativity), so
    * the judged contract is the streaming path's equality with the batch
    * formula, bit for bit. */
  private def runHllLedger(s: SparkSession, d: String): DataFrame =
      withTempDir("graft-hll-led") { tmp =>
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    def run(): Unit = {
      graft.streaming.EventStreams.startHllLedgerSink(
        graft.streaming.EventStreams.readDocuments(s, s"$tmp/in"),
        s"$tmp/ledger", s"$tmp/cp").awaitTermination(120000)
      ()
    }
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    run()
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(s"$tmp/in")
    run()
    // capture to a local frame (the lateSessions idiom) so the judged
    // result does not depend on the temp ledger outliving this call
    val captured = graft.operators.HllSketch
      .estimateFromLedger(s, s"$tmp/ledger").collect()
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_regs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("z53",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("estimate",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  private val cmsLedgerMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Memoized [[runCmsLedger]] (the judged-streaming-harness idiom shared
    * with [[hllLedger]]/[[decayLedger]]/[[lateSessions]]). */
  private def cmsLedger(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/documents.parquet")
    cmsLedgerMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runCmsLedger(s, d)
        cmsLedgerMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Drive the streaming count-min counter ledger end-to-end over the
    * fixture documents — TWO AvailableNow micro-batch runs (even doc_ids,
    * then odd) through
    * [[graft.streaming.EventStreams.startCmsLedgerSink]] — and serve the
    * point-frequency estimates from the ledger for the tx_cms_freq query
    * set (tokens with exact corpus count ≥ 20). The oracle re-derives the
    * SAME sketch from the parquet in one shot: per-batch counter
    * partitions summed at serve time must be batching-invariant (counter
    * addition is associative — every token's occurrences are torn across
    * the two batches here), so the judged contract is the streaming
    * path's bit-equality with the one-shot batch formula. */
  private def runCmsLedger(s: SparkSession, d: String): DataFrame =
      withTempDir("graft-cms-led") { tmp =>
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    def run(): Unit = {
      graft.streaming.EventStreams.startCmsLedgerSink(
        graft.streaming.EventStreams.readDocuments(s, s"$tmp/in"),
        s"$tmp/ledger", s"$tmp/cp").awaitTermination(120000)
      ()
    }
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    run()
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(s"$tmp/in")
    run()
    val tf = t(s, d, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") >= 20)
    val served = graft.operators.CmsSketch
      .estimatesFromLedger(s, s"$tmp/ledger", tf.select("token"))
    // capture to a local frame (the hllLedger idiom) so the judged result
    // does not depend on the temp ledger outliving this call
    val captured = tf.join(served, "token")
      .select(col("token"), col("n_exact"), col("est")).collect()
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("n_exact",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("est",
          org.apache.spark.sql.types.LongType, nullable = true))))
  }

  private val streamJoinMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Memoized [[runStreamJoin]] (the judged-streaming-harness idiom). */
  private def streamJoin(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/events.parquet")
    streamJoinMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runStreamJoin(s, d)
        streamJoinMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Drive the watermarked stream-stream join end-to-end: the fixture
    * events arrive as TWO micro-batches split at the 2024-01-15 midpoint
    * and fed LATE HALF FIRST (out-of-order arrival — matches whose
    * purchase and view land in different batches, in either order, must
    * come from buffered join state, not batch locality), through
    * [[graft.streaming.EventStreams.purchaseViewJoin]] into a memory
    * sink. The far watermark keeps every row eligible (no late-drop), so
    * the drained stream must emit EXACTLY the batch interval join — the
    * ij_interval_join semantics — which is what the DuckDB oracle
    * re-derives. The judged contract is batching/ordering invariance of
    * the stream-stream join itself (the inner-join face of the
    * EventStreamsSpec left-outer/eviction coverage). */
  private def runStreamJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    val ev = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    def rows(df: DataFrame) =
      df.as[(Long, Long, String, java.sql.Timestamp)].collect().toSeq
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val early = rows(ev.filter(col("ts") < split))
    val late = rows(ev.filter(col("ts") >= split))
    implicit val sqlCtx = s.sqlContext
    val stream = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val src = stream.toDF().toDF("event_id", "user_id", "event_type", "ts")
    val joined = graft.streaming.EventStreams.purchaseViewJoin(src, "3650 days")
    val sink = "st_stream_join_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val captured = try {
      stream.addData(late)
      q.processAllAvailable()
      stream.addData(early)
      q.processAllAvailable()
      s.table(sink).select("purchase_id", "view_id", "user_id").collect()
    } finally {
      q.stop()
      s.catalog.dropTempView(sink)
    }
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("purchase_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("view_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  private val streamLeftJoinMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Memoized [[runStreamLeftJoin]] (the judged-streaming-harness idiom). */
  private def streamLeftJoin(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/events.parquet")
    streamLeftJoinMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runStreamLeftJoin(s, d)
        streamLeftJoinMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Drive the LEFT-OUTER stream-stream join to a drained comparison —
    * the judged face of the eviction semantic [[runStreamJoin]] cannot
    * see: an UNMATCHED purchase null-pads only once the watermark passes
    * the last instant a matching view could still arrive, so with a real
    * 1-hour watermark the fixture events alone would never flush. The
    * harness appends two far-future WATERMARK-PUSHER batches (a
    * purchase/view pair each at 2035/2036 under sentinel user −1 — both
    * types, because each branch's watermark advances only on events of
    * its own type and the global watermark is their MIN; two batches,
    * because a watermark moves at batch BOUNDARIES and outer results
    * flush one batch after it moves). Sentinel rows are dropped from the
    * judged frame; what remains must bit-equal the batch LEFT interval
    * join the oracle runs — matched multiplicity identical to
    * st_stream_join, plus exactly one null-padded row per unmatched
    * purchase, emitted exactly once. */
  private def runStreamLeftJoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    val ev = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val all = ev.as[(Long, Long, String, java.sql.Timestamp)].collect().toSeq
    def pusher(year: Int) = Seq(
      (-1L, -1L, "purchase", java.sql.Timestamp.valueOf(s"$year-01-01 00:00:00")),
      (-2L, -1L, "view", java.sql.Timestamp.valueOf(s"$year-01-01 00:00:00")))
    implicit val sqlCtx = s.sqlContext
    val stream = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val src = stream.toDF().toDF("event_id", "user_id", "event_type", "ts")
    val joined = graft.streaming.EventStreams.purchaseViewLeftJoin(src, "1 hour")
    val sink = "st_stream_left_join_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val captured = try {
      stream.addData(all)
      q.processAllAvailable()
      stream.addData(pusher(2035))
      q.processAllAvailable()
      stream.addData(pusher(2036))
      q.processAllAvailable()
      s.table(sink).select("purchase_id", "view_id", "user_id")
        .filter(col("user_id") >= 0).collect()
    } finally {
      q.stop()
      s.catalog.dropTempView(sink)
    }
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("purchase_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("view_id",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  private val decayLedgerMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Memoized [[runDecayLedger]] (the judged-streaming-harness idiom shared
    * with [[hllLedger]]/[[lateSessions]]: judged queries are invoked
    * repeatedly in one JVM and the streaming run is deterministic given the
    * fixture, keyed by its file fingerprint). */
  private def decayLedger(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/events.parquet")
    decayLedgerMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runDecayLedger(s, d)
        decayLedgerMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Drive the streaming decay-score ledger end-to-end over the fixture
    * events — TWO AvailableNow micro-batch runs (even event_ids, then odd)
    * through [[graft.streaming.EventStreams.startDecayLedgerSink]] — and
    * serve the per-user scores from the ledger
    * ([[graft.operators.EventOps.decayScoresFromLedger]]). The oracle is
    * ev_decay_score's one-shot batch derivation over the same parquet:
    * because the ledger holds exact per-batch (user, day) partial counts
    * and the 2^(30−weeks) weighting is applied at SERVE time against the
    * ledger-wide max day, the split — including day-level counts torn
    * across the two batches and the max-day anchor arriving in either
    * half — must not move a single score. */
  private def runDecayLedger(s: SparkSession, d: String): DataFrame =
      withTempDir("graft-decay-led") { tmp =>
    val ev = t(s, d, "events")
    def run(): Unit = {
      graft.streaming.EventStreams.startDecayLedgerSink(
        graft.streaming.EventStreams.readEvents(s, s"$tmp/in"),
        s"$tmp/ledger", s"$tmp/cp").awaitTermination(120000)
      ()
    }
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$tmp/in")
    run()
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(s"$tmp/in")
    run()
    // capture to a local frame (the lateSessions idiom) so the judged
    // result does not depend on the temp ledger outliving this call
    val served = graft.operators.EventOps.decayScoresFromLedger(s, s"$tmp/ledger")
    val captured = served.collect()
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava, served.schema)
  }

  private val cusumLedgerMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Memoized [[runCusumLedger]] (the judged-streaming-harness idiom). */
  private def cusumLedger(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/events.parquet")
    cusumLedgerMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runCusumLedger(s, d)
        cusumLedgerMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Drive the streaming CUSUM drift ledger end-to-end over the fixture
    * events — TWO AvailableNow micro-batch runs (even event_ids, then odd)
    * through [[graft.streaming.EventStreams.startCusumLedgerSink]] — and
    * serve the per-(type, day) drift table from the summed ledger
    * ([[graft.operators.EventOps.cusumFromLedger]]). The oracle is
    * ev_cusum's one-shot batch derivation over the same parquet: the
    * ledger holds exact per-batch (type, day) partial counts and the
    * whole CUSUM chain runs at serve time over their sum, so day-level
    * counts torn across the two batches — and the scaffold's min/max day
    * anchors arriving in either half — must not move a single row. */
  private def runCusumLedger(s: SparkSession, d: String): DataFrame =
      withTempDir("graft-cusum-led") { tmp =>
    val ev = t(s, d, "events")
    def run(): Unit = {
      graft.streaming.EventStreams.startCusumLedgerSink(
        graft.streaming.EventStreams.readEvents(s, s"$tmp/in"),
        s"$tmp/ledger", s"$tmp/cp").awaitTermination(120000)
      ()
    }
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$tmp/in")
    run()
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(s"$tmp/in")
    run()
    // capture to a local frame (the hllLedger idiom) so the judged result
    // does not depend on the temp ledger outliving this call
    val served = graft.operators.EventOps.cusumFromLedger(s, s"$tmp/ledger")
    val captured = served.collect()
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava, served.schema)
  }

  private val quantileLedgerMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, DataFrame)]

  /** Memoized [[runQuantileLedger]] (the judged-streaming-harness idiom
    * shared with [[hllLedger]]/[[cmsLedger]]/[[decayLedger]]). */
  private def quantileLedger(s: SparkSession, d: String): DataFrame = {
    val fp = graft.sources.FileFingerprint.of(s, s"$d/documents.parquet")
    quantileLedgerMemo.get((s, d)) match {
      case Some((`fp`, df)) => df
      case _ =>
        val df = runQuantileLedger(s, d)
        quantileLedgerMemo.put((s, d), (fp, df))
        df
    }
  }

  /** Drive the streaming log-bucket quantile ledger end-to-end over the
    * fixture documents — TWO AvailableNow micro-batch runs (even doc_ids,
    * then odd) through
    * [[graft.streaming.EventStreams.startQuantileLedgerSink]] — and serve
    * five length quantiles from the summed ledger
    * ([[graft.operators.LogHistogram.quantilesFromLedger]]). The oracle
    * re-derives the SAME histogram from the parquet in one shot: bucket
    * counts torn across the two batches must sum back to the batch
    * histogram (addition is associative), so the judged contract is the
    * streaming path's bit-equality with the one-shot batch formula —
    * bucket assignment included, because both engines compute the shift
    * by pure integer bit ops (no log()). */
  private def runQuantileLedger(s: SparkSession, d: String): DataFrame =
      withTempDir("graft-q-led") { tmp =>
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    def run(): Unit = {
      graft.streaming.EventStreams.startQuantileLedgerSink(
        graft.streaming.EventStreams.readDocuments(s, s"$tmp/in"),
        s"$tmp/ledger", s"$tmp/cp").awaitTermination(120000)
      ()
    }
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/in")
    run()
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(s"$tmp/in")
    run()
    // capture to a local frame (the hllLedger idiom) so the judged result
    // does not depend on the temp ledger outliving this call
    val served = graft.operators.LogHistogram.quantilesFromLedger(
      s, s"$tmp/ledger", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    val captured = served.collect()
    import scala.jdk.CollectionConverters._
    s.createDataFrame(captured.toSeq.asJava, served.schema)
  }

  /** DuckDB oracle for ev_hits: the same bipartite user→item view edges,
    * then the 5 HITS half-step pairs (authority pull, hub pull, each
    * L1-normalized to 1e6 by trunc division) UNROLLED as MATERIALIZED
    * CTEs — the ev_pagerank integer power-iteration discipline verbatim,
    * with every score CAST back to BIGINT per step so HUGEINT SUM
    * widening cannot diverge from the engine's longs. */
  private val HitsSql: String = {
    val rounds = (1 to 5).map { i =>
      s"""ar$i AS MATERIALIZED (
         |  SELECT e.auth, CAST(SUM(h.s) AS BIGINT) AS raw
         |  FROM e JOIN h${i - 1} h ON h.hub = e.hub GROUP BY 1),
         |asum$i AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM ar$i),
         |a$i AS MATERIALIZED (
         |  SELECT auth, CAST((raw * 1000000) // t AS BIGINT) AS s
         |  FROM ar$i CROSS JOIN asum$i),
         |hr$i AS MATERIALIZED (
         |  SELECT e.hub, CAST(SUM(a.s) AS BIGINT) AS raw
         |  FROM e JOIN a$i a ON a.auth = e.auth GROUP BY 1),
         |hsum$i AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM hr$i),
         |h$i AS MATERIALIZED (
         |  SELECT hub, CAST((raw * 1000000) // t AS BIGINT) AS s
         |  FROM hr$i CROSS JOIN hsum$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT user_id AS hub,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS auth
       |  FROM events WHERE event_type = 'view'),
       |h0 AS MATERIALIZED (
       |  SELECT DISTINCT hub, CAST(1000000 AS BIGINT) AS s FROM e),
       |$rounds
       |SELECT side, id, score6, rn FROM (
       |  SELECT side, id, score6, CAST(row_number() OVER (
       |    PARTITION BY side ORDER BY score6 DESC, id) AS BIGINT) AS rn
       |  FROM (SELECT 'auth' AS side, auth AS id, s AS score6 FROM a5
       |        UNION ALL SELECT 'hub', hub, s FROM h5))
       |WHERE rn <= 10""".stripMargin
  }

  /** DuckDB oracle for ev_label_prop: the kcore edge frame at the sparser
    * ≥6-shared-user threshold (the ≥4 graph is one dense component — no
    * community structure to detect), then the SAME 4 synchronous
    * label-propagation rounds unrolled as MATERIALIZED CTEs
    * — per round each node adopts the most frequent neighbor label
    * (count desc, then MIN label: the engine's max(struct(c, −lab))
    * winner, expressed as a row_number). */
  private val LpaSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT node, nlab AS lab FROM (
         |    SELECT node, nlab, row_number() OVER (
         |      PARTITION BY node ORDER BY c DESC, nlab) AS rn
         |    FROM (SELECT n.node, l.lab AS nlab, COUNT(*) AS c
         |          FROM nbr n JOIN l${i - 1} l ON l.node = n.nbr
         |          GROUP BY 1, 2))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH vi AS MATERIALIZED (
       |  SELECT DISTINCT user_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
       |  FROM events WHERE event_type = 'view'),
       |e0 AS MATERIALIZED (
       |  SELECT a.item AS u, b.item AS v
       |  FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 6),
       |nbr AS MATERIALIZED (
       |  SELECT u AS node, v AS nbr FROM e0 UNION ALL SELECT v, u FROM e0),
       |l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab FROM nbr),
       |$rounds
       |SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS size
       |FROM l4 GROUP BY 1""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Window: rank per group (top-3 orders per customer)
    Q("w1_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= 3)
      },
      Some("""SELECT * FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
                FROM orders) WHERE rk <= 3""".stripMargin),
      headline = true),

    // Custom physical top-k-per-group operator (graft.plans.TopKPerGroup):
    // k-bounded heaps after one group exchange, no per-partition sort.
    // Same answer as the row_number window formulation (the oracle).
    Q("w4_topk_per_group",
      (s, d) => graft.plans.TopKPerGroup(
        t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        group = Seq("o_custkey"),
        order = Seq("o_totalprice", "o_orderkey"),
        k = 3),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
                FROM orders) WHERE rn <= 3""".stripMargin),
      headline = true),

    // Window: running sum over a total order (exact decimal → double)
    Q("w2_running_sum",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(20,4)")).over(w)
            .cast("double").as("running_total"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
              FROM orders""".stripMargin)),

    // Window: lag
    Q("w3_window_lag",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      },
      Some("""SELECT o_custkey, o_orderkey,
                lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
              FROM orders""".stripMargin)),

    // Window-function breadth: first/last value with explicit frames,
    // dense_rank, ntile — all over a total (tiebroken) ordering.
    Q("w5_window_misc",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val framed = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(framed).as("best_order"),
          last(col("o_orderkey")).over(framed).as("worst_order"),
          dense_rank().over(w).cast("long").as("drk"),
          ntile(4).over(w).cast("long").as("quartile"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w2 AS best_order,
        |  last_value(o_orderkey) OVER w2 AS worst_order,
        |  CAST(dense_rank() OVER w1 AS BIGINT) AS drk,
        |  CAST(ntile(4) OVER w1 AS BIGINT) AS quartile
        |FROM orders
        |WINDOW
        |  w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
        |  w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)),

    // Rollup (subtotals + grand total; null markers match SQL ROLLUP)
    Q("a5_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
                CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    // Cube
    Q("a6_cube",
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_rows")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_rows
              FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // COUNT(DISTINCT)
    Q("a7_count_distinct",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust")),
      Some("SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust FROM orders GROUP BY o_orderstatus")),

    // approx_count_distinct — HLL sketch. The raw sketch value is
    // implementation-specific (no engine-neutral oracle exists for it), so
    // the judged output is the sketch's ERROR-BOUND verdict instead: the
    // exact count plus a boolean asserting the sketch landed within 5%
    // relative error. The oracle emits the exact count and a literal TRUE —
    // a sketch drifting past the bound hash-mismatches and turns this red.
    Q("a8_approx_count_distinct",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust_exact"),
          // rsd 1%: the judged 5% bound is then ~5 standard deviations —
          // the default 5% rsd drifts past a 5% bound routinely
          approx_count_distinct(col("o_custkey"), 0.01).as("__approx"))
        .select(col("o_orderstatus"), col("n_cust_exact"),
          (abs(col("__approx") - col("n_cust_exact")).cast("double") /
            col("n_cust_exact").cast("double") < 0.05).as("within_bound")),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust_exact,
              TRUE AS within_bound FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Statistical moments from exact decimal sums (mean/variance/stddev):
    // double-only parallel aggregation is accumulation-order-dependent, so
    // the engine sums decimals exactly and applies the closed-form moment
    // formulas as final single double ops — deterministic on any cluster
    // layout, bit-identical to the oracle.
    Q("a9_moments",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(20,4)")).as("s1"),
          sum((col("l_quantity").cast("decimal(20,4)") *
               col("l_quantity").cast("decimal(20,4)")).cast("decimal(38,8)")).as("s2"))
        .select(
          col("l_returnflag"),
          col("n"),
          (col("s1").cast("double") / col("n")).as("mean"),
          round((col("s2").cast("double") - col("s1").cast("double") *
            col("s1").cast("double") / col("n")) / (col("n") - 1), 6).as("variance")),
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS mean,
        |  round((CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(20,4)) AS DECIMAL(38,8))) AS DOUBLE)
        |    - CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1), 6) AS variance
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Pearson correlation from exact decimal sums (same determinism story
    // as a9_moments: double-only parallel corr is accumulation-order
    // dependent; closed form over exact sums is not).
    Q("a11_corr",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sx"),
          sum(col("l_extendedprice").cast("decimal(20,4)")).cast("double").as("sy"),
          sum((col("l_quantity").cast("decimal(20,4)") *
               col("l_extendedprice").cast("decimal(20,4)")).cast("decimal(38,8)"))
            .cast("double").as("sxy"),
          sum((col("l_quantity").cast("decimal(20,4)") *
               col("l_quantity").cast("decimal(20,4)")).cast("decimal(38,8)"))
            .cast("double").as("sx2"),
          sum((col("l_extendedprice").cast("decimal(20,4)") *
               col("l_extendedprice").cast("decimal(20,4)")).cast("decimal(38,8)"))
            .cast("double").as("sy2"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
             sqrt(col("n") * col("sy2") - col("sy") * col("sy"))), 6).as("corr_qty_price")),
      Some("""WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(20,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(20,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(20,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sy2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6) AS corr_qty_price
        |FROM s""".stripMargin)),

    // Simple OLS regression per group (slope / intercept / R²) — the
    // closed-form least squares every metrics stack ships next to corr.
    // Same determinism story as a9_moments/a11_corr: the five sufficient
    // statistics are exact decimal sums (accumulation-order independent),
    // the regression coefficients are then a fixed sequence of double ops,
    // rounded once at the end — bit-identical on any cluster layout. The
    // oracle applies the identical closed form to the identical exact sums
    // (DuckDB's regr_slope would re-derive from double accumulation).
    Q("a20_ols_regression",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("l_quantity").cast("decimal(20,4)")).cast("double").as("sx"),
          sum(col("l_extendedprice").cast("decimal(20,4)")).cast("double").as("sy"),
          sum((col("l_quantity").cast("decimal(20,4)") *
               col("l_extendedprice").cast("decimal(20,4)")).cast("decimal(38,8)"))
            .cast("double").as("sxy"),
          sum((col("l_quantity").cast("decimal(20,4)") *
               col("l_quantity").cast("decimal(20,4)")).cast("decimal(38,8)"))
            .cast("double").as("sx2"),
          sum((col("l_extendedprice").cast("decimal(20,4)") *
               col("l_extendedprice").cast("decimal(20,4)")).cast("decimal(38,8)"))
            .cast("double").as("sy2"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sx2") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sx2") - col("sx") * col("sx")) * col("sx")) / col("n"), 6)
            .as("intercept"),
          round(((col("n") * col("sxy") - col("sx") * col("sy")) *
                 (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sx2") - col("sx") * col("sx")) *
             (col("n") * col("sy2") - col("sy") * col("sy"))), 6).as("r2")),
      Some("""WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(20,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(20,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(l_extendedprice AS DECIMAL(20,4)) AS DECIMAL(38,8))) AS DOUBLE) AS sy2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx) / n, 6) AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |    ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6) AS r2
        |FROM s""".stripMargin)),

    // Skewness / kurtosis per group — the 3rd/4th standardized central
    // moments completing the a9_moments family (asymmetry + tail weight of
    // a metric distribution). Determinism: l_quantity is 2dp-exact, so
    // rows project to the scaled-100 long q; q²,q³,q⁴ stay inside long
    // per row, and the four power sums are EXACT decimal(38,0) aggregates
    // (HUGEINT on the DuckDB side — also exact). Both standardized ratios
    // are SCALE-INVARIANT (numerator p³ resp. p⁴ units over denominator
    // (p²)^{3/2} resp. (p²)²), so the closed forms run directly on the
    // scaled raw moments — a fixed mirrored double chain, rounded once.
    // Kurtosis is reported RAW (normal = 3), not excess. Scale shape: one
    // keyed map-combined aggregate.
    Q("a21_skew_kurtosis",
      (s, d) => {
        val q = round(col("l_quantity") * 100, 0).cast("long")
        val d38 = "decimal(38,0)"
        t(s, d, "lineitem")
          .select(col("l_returnflag"), q.as("q"))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("q").cast(d38)).cast("double").as("s1"),
            sum((col("q") * col("q")).cast(d38)).cast("double").as("s2"),
            sum((col("q") * col("q") * col("q")).cast(d38)).cast("double")
              .as("s3"),
            sum((col("q") * col("q") * col("q") * col("q")).cast(d38))
              .cast("double").as("s4"))
          .select(col("l_returnflag"), col("n").cast("long").as("n"),
            round(col("s1") / col("n") / lit(100.0), 6).as("mean"),
            round((col("s3") / col("n")
              - lit(3.0) * (col("s1") / col("n")) * (col("s2") / col("n"))
              + lit(2.0) * (col("s1") / col("n")) * (col("s1") / col("n"))
                * (col("s1") / col("n")))
              / ((col("s2") / col("n")
                - (col("s1") / col("n")) * (col("s1") / col("n")))
                * sqrt(col("s2") / col("n")
                  - (col("s1") / col("n")) * (col("s1") / col("n")))), 6)
              .as("skewness"),
            round((col("s4") / col("n")
              - lit(4.0) * (col("s1") / col("n")) * (col("s3") / col("n"))
              + lit(6.0) * (col("s1") / col("n")) * (col("s1") / col("n"))
                * (col("s2") / col("n"))
              - lit(3.0) * (col("s1") / col("n")) * (col("s1") / col("n"))
                * (col("s1") / col("n")) * (col("s1") / col("n")))
              / ((col("s2") / col("n")
                - (col("s1") / col("n")) * (col("s1") / col("n")))
                * (col("s2") / col("n")
                  - (col("s1") / col("n")) * (col("s1") / col("n")))), 6)
              .as("kurtosis"))
      },
      Some("""WITH qs AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100, 0) AS BIGINT) AS q
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(q) AS DOUBLE) AS s1,
        |    CAST(SUM(q * q) AS DOUBLE) AS s2,
        |    CAST(SUM(q * q * q) AS DOUBLE) AS s3,
        |    CAST(SUM(q * q * q * q) AS DOUBLE) AS s4
        |  FROM qs GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(s1 / n / 100.0, 6) AS mean,
        |  round((s3 / n - 3.0 * (s1 / n) * (s2 / n)
        |      + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n))
        |      * sqrt(s2 / n - (s1 / n) * (s1 / n))), 6) AS skewness,
        |  round((s4 / n - 4.0 * (s1 / n) * (s3 / n)
        |      + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n))
        |      * (s2 / n - (s1 / n) * (s1 / n))), 6) AS kurtosis
        |FROM s""".stripMargin)),

    // GROUPING SETS (beyond rollup/cube): disjoint per-dimension subtotals.
    Q("a12_grouping_sets",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_rows
                 FROM orders_gs
                 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_rows
              FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)),

    // Exact interpolated percentiles (median / p90). VERIFICATION-SCALE
    // CONSTRUCT: Spark's exact percentile buffers every value per group
    // (ObjectHashAggregate), which does not survive fact-table groups at
    // 100 TB — this row exists to prove the exact contract that a19's
    // mergeable approx_percentile sketch is judged against. Do not lift
    // exact percentile into a production pipeline; use the sketch.
    // RegistrySpec fails any NEW judged query that plans one.
    Q("a10_percentiles",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90")),
      Some("""SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // INTERSECT / EXCEPT
    Q("set_intersect",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier")),

    Q("set_except",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier")),

    // Salted skew-safe join: identical result to the plain equi-join (the
    // oracle runs the plain join), with the hot-key spreading happening
    // inside the operator.
    Q("sj_salted_join",
      (s, d) => SaltedJoin.inner(
        t(s, d, "orders").select("o_custkey", "o_totalprice"),
        t(s, d, "customer").select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders")),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment""".stripMargin)),

    // Range join: band bucketing against a small inline ranges table —
    // broadcast nested-loop on the tiny side, never a shuffle of `part`.
    Q("rj_range_join",
      (s, d) => {
        val buckets = s.createDataFrame(Seq(
          (0, 900.0, 925.0), (1, 925.0, 950.0), (2, 950.0, 975.0), (3, 975.0, 1000.0)
        )).toDF("bucket", "lo", "hi")
        t(s, d, "part")
          .join(broadcast(buckets),
            col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_parts"),
            sum(col("p_retailprice").cast("decimal(20,4)")).cast("double").as("sum_price"))
      },
      Some("""SELECT bucket, COUNT(*) AS n_parts,
                CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
              FROM part
              JOIN (VALUES (0, 900.0, 925.0), (1, 925.0, 950.0), (2, 950.0, 975.0), (3, 975.0, 1000.0)) b(bucket, lo, hi)
                ON p_retailprice >= lo AND p_retailprice < hi
              GROUP BY bucket""".stripMargin)),

    // As-of join: latest 'view' at-or-before each 'purchase', per user.
    // Spark has no native as-of join — EventOps.asofJoin is the
    // union+window formulation (single shuffle). DuckDB validates with its
    // native ASOF JOIN.
    Q("aj_asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
        EventOps.asofJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"))
      },
      Some("""SELECT a.event_id, a.user_id, a.ts, b.ts AS view_ts
              FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') a
              ASOF JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'view') b
                ON a.user_id = b.user_id AND a.ts >= b.ts""".stripMargin),
      headline = true),

    // LEFT as-of join with max-staleness tolerance (the point-in-time join
    // feature stores need): every purchase survives, and a preceding view
    // older than one hour is NULLED rather than silently served stale —
    // training on a feature computed long before the label's timestamp is
    // leakage's quieter sibling, and plain as-of joins commit it by
    // default. Same single user-keyed window as aj_asof_join; the
    // staleness check is row-local.
    Q("aj_asof_tolerance",
      (s, d) => {
        val ev = t(s, d, "events")
        EventOps.asofJoinTolerance(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          toleranceUs = 3600L * 1000000)
      },
      Some("""SELECT a.event_id, a.user_id, a.ts,
        |  CASE WHEN b.ts IS NOT NULL
        |    AND epoch_us(a.ts) - epoch_us(b.ts) <= CAST(3600 AS BIGINT) * 1000000
        |    THEN b.ts END AS view_ts
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts""".stripMargin)),

    // Interval (bounded-range) join: purchases matched to same-user views
    // within the preceding hour — equi key (user) carries the shuffle, the
    // time band is a post-join filter, so no candidate blow-up beyond the
    // per-user window.
    Q("ij_interval_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
        val v = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
        p.join(v, Seq("user_id"))
          .filter(col("v_ts") <= col("p_ts") &&
            col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
          .select("purchase_id", "view_id", "user_id")
      },
      Some("""SELECT a.event_id AS purchase_id, b.event_id AS view_id, a.user_id
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') a
        |JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id
        | AND b.ts <= a.ts AND b.ts >= a.ts - INTERVAL 1 HOUR""".stripMargin)),

    // 2-D skyline (Pareto frontier): the parts no other part beats on BOTH
    // price (lower better) and size (higher better) — the multi-objective
    // shortlist behind any price/feature trade-off screen. The naive
    // semantics is a quadratic NOT EXISTS over dominance (exactly what the
    // oracle runs); the engine plans the published banded prefix-max
    // shape instead: collapse to per-price max size (map-combined),
    // band prices into fixed-width buckets, take per-band maxima
    // (bounded by the VALUE RANGE, not the data — the rj literal-band
    // argument), prefix-max across the tiny band frame, and resolve
    // within-band dominance with a band-KEYED running-max window. No
    // self-join, no global window over data-sized frames; the fact table
    // is touched twice (collapse + final frontier semi-join against the
    // broadcast frontier-price frame).
    Q("sk_skyline",
      (s, d) => {
        val p = t(s, d, "part")
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
            col("p_size"))
        val g = p.groupBy("p_retailprice")
          .agg(max(col("p_size")).as("gmax"))
          .withColumn("band", floor(col("p_retailprice") / 10).cast("long"))
        val wb = Window.orderBy("band")
        val pre = g.groupBy("band").agg(max(col("gmax")).as("bmax"))
          .withColumn("brun", max(col("bmax")).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("prefix", lag(col("brun"), 1).over(wb))
        val wq = Window.partitionBy("band").orderBy("p_retailprice")
        val frontier = g
          .withColumn("run", max(col("gmax")).over(
            wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("inprev", lag(col("run"), 1).over(wq))
          .join(broadcast(pre.select(col("band"), col("prefix"))), "band")
          .filter(col("gmax") > greatest(coalesce(col("inprev"), lit(-1)),
            coalesce(col("prefix"), lit(-1))))
          .select(col("p_retailprice"), col("gmax"))
        p.join(broadcast(frontier), "p_retailprice")
          .filter(col("p_size") === col("gmax"))
          .select("p_partkey", "p_name", "p_retailprice", "p_size")
      },
      Some("""SELECT p_partkey, p_name, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
        |     OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))""".stripMargin)),

    // Pivot over a fixed type list
    Q("pv_pivot",
      (s, d) => EventOps.pivotCounts(t(s, d, "events"), EventTypes),
      Some("""SELECT user_id,
                COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
              FROM events GROUP BY user_id""".stripMargin)),

    // Array-function surface: per-group sorted collect, containment, size,
    // slicing — deterministic because every collected array is sorted.
    // Arrays are emitted as joined strings: the judged output contract is
    // scalar-only columns (the driver's compare cannot hash list cells).
    Q("ar_array_funcs",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
        .select(
          col("l_orderkey"),
          array_join(col("lines"), ",").as("lines_csv"),
          size(col("lines")).as("n_lines"),
          array_contains(col("lines"), 1).as("has_first"),
          array_join(slice(col("lines"), 1, 2), ",").as("first_two")),
      Some("""SELECT l_orderkey,
        |  array_to_string(lines, ',') AS lines_csv,
        |  CAST(len(lines) AS INT) AS n_lines,
        |  list_contains(lines, 1) AS has_first,
        |  array_to_string(lines[1:2], ',') AS first_two
        |FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
        |      FROM lineitem GROUP BY l_orderkey)""".stripMargin)),

    // Conditional-expression surface: CASE/greatest/least/nullif/coalesce.
    Q("p12_conditionals",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "large")
          .when(col("o_totalprice") > 100000, "medium")
          .otherwise("small").as("size_class"),
        greatest(col("o_totalprice"), lit(150000.0)).as("floor_price"),
        least(col("o_totalprice"), lit(150000.0)).as("cap_price"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("NOT_OPEN")).as("status_or_default")),
      Some("""SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'large'
        |       WHEN o_totalprice > 100000 THEN 'medium'
        |       ELSE 'small' END AS size_class,
        |  greatest(o_totalprice, 150000.0) AS floor_price,
        |  least(o_totalprice, 150000.0) AS cap_price,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'NOT_OPEN') AS status_or_default
        |FROM orders""".stripMargin)),

    // max_by / min_by (argmax aggregates), tie-broken through a composite
    // ordering key so both engines agree deterministically.
    Q("a13_argminmax",
      (s, d) => {
        // composite (price, orderkey) ordering encoded as one zero-padded
        // sortable string: deterministic under price ties, and the same
        // lexicographic order in both engines
        val ord = concat(
          lpad(col("o_totalprice").cast("decimal(18,2)").cast("string"), 20, "0"),
          lit("-"),
          lpad(col("o_orderkey").cast("string"), 12, "0"))
        t(s, d, "orders")
          .groupBy("o_orderstatus")
          .agg(
            max_by(col("o_orderkey"), ord).as("max_order"),
            min_by(col("o_orderkey"), ord).as("min_order"))
      },
      Some("""SELECT o_orderstatus,
        |  arg_max(o_orderkey, lpad(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 20, '0')
        |                      || '-' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS max_order,
        |  arg_min(o_orderkey, lpad(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 20, '0')
        |                      || '-' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS min_order
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // JSON map extraction (schema-on-read over `props`)
    Q("js_json_extract",
      (s, d) => EventOps.propsKey(t(s, d, "events"), "k"),
      Some("SELECT event_id, CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k FROM events")),

    // Map-function surface over the parsed props map; keys/values emitted
    // as joined strings (scalar-only judged-output contract).
    Q("js_map_funcs",
      (s, d) => t(s, d, "events").select(
        col("event_id"),
        array_join(map_keys(from_json(col("props"), lit("map<string,bigint>"))), ",").as("keys_csv"),
        array_join(map_values(from_json(col("props"), lit("map<string,bigint>"))), ",").as("vals_csv")),
      Some("""SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS keys_csv,
        |  CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) || '' AS vals_csv
        |FROM events""".stripMargin)),

    // Funnel conversion (view → purchase within 7 days, per user): the
    // order-constrained conditional-min aggregation every product-analytics
    // pipeline runs — one keyed aggregate, no self-join.
    Q("ev_funnel",
      (s, d) => t(s, d, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
        .select(col("user_id"),
          (col("first_view").isNotNull && col("first_purchase").isNotNull &&
            col("first_view") <= col("first_purchase") &&
            col("first_purchase") <= col("first_view") + expr("INTERVAL 7 DAYS"))
            .as("converted")),
      Some("""SELECT user_id,
        |  COALESCE(first_view IS NOT NULL AND first_purchase IS NOT NULL
        |    AND first_view <= first_purchase
        |    AND first_purchase <= first_view + INTERVAL 7 DAY, FALSE) AS converted
        |FROM (SELECT user_id,
        |        MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS first_view,
        |        MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
        |      FROM events GROUP BY user_id)""".stripMargin)),

    // Strict ORDERED 3-step funnel (view → click after that view →
    // purchase after that click): the order constraint ev_funnel's
    // two-step conditional-min cannot express — each step's anchor is the
    // previous step's resolved timestamp. Planned as THREE chained
    // unbounded windows over the SAME user partitioning (fv feeds fc's
    // predicate, fc feeds fp's): one hash exchange, no sort (unbounded
    // frames), no self-join, then a distinct collapse to one row per
    // user. The oracle states the identical window chain.
    Q("ev_funnel_steps",
      (s, d) => {
        val w = Window.partitionBy("user_id")
        val st = t(s, d, "events")
          .withColumn("fv",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("fc",
            min(when(col("event_type") === "click" && col("ts") >= col("fv"),
              col("ts"))).over(w))
          .withColumn("fp",
            min(when(col("event_type") === "purchase" && col("ts") >= col("fc"),
              col("ts"))).over(w))
        st.select(col("user_id"), col("fv").as("first_view"),
            col("fc").as("first_click"), col("fp").as("first_purchase"),
            (when(col("fv").isNotNull, 1).otherwise(0)
              + when(col("fc").isNotNull, 1).otherwise(0)
              + when(col("fp").isNotNull, 1).otherwise(0)).cast("int")
              .as("steps"))
          .distinct()
      },
      Some("""WITH st1 AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
        |      OVER (PARTITION BY user_id) AS fv
        |  FROM events),
        |st2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= fv THEN ts END)
        |    OVER (PARTITION BY user_id) AS fc
        |  FROM st1),
        |st3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= fc THEN ts END)
        |    OVER (PARTITION BY user_id) AS fp
        |  FROM st2)
        |SELECT DISTINCT user_id, fv AS first_view, fc AS first_click,
        |  fp AS first_purchase,
        |  CAST(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN fc IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS steps
        |FROM st3""".stripMargin)),

    // Gap-based sessionization: a session break is >30 idle minutes; the
    // session id is the running count of breaks per user — lag + windowed
    // sum over (user_id, ts, event_id). Scale shape: the window partitions
    // on user_id (high cardinality — the one partition key that is always
    // safe for event streams), so one hash exchange and bounded per-task
    // state; contrast st_session_window, which aggregates INTO sessions —
    // this labels every event with its session, the feature-engineering
    // form.
    Q("ev_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // exact integer micros on both engines (ts has sub-second parts;
        // whole-second truncation would disagree at 30-minute boundaries)
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .select(col("user_id"), col("event_id"),
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("session_id"))
      },
      Some("""SELECT user_id, event_id,
        |  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM (SELECT user_id, event_id, ts,
        |        epoch_us(CAST(ts AS TIMESTAMP))
        |          - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |      FROM events)""".stripMargin)),

    // DAU / trailing-7-day WAU / stickiness per day. Scale shape: events
    // reduce ONCE to the distinct (day, user) pair table — tiny relative
    // to the event stream — and the rolling distinct-user count stays an
    // EQUI shape: each active (day, user) explodes to the 7 target days it
    // counts toward, then one keyed distinct aggregate. No range join, no
    // distinct-over-window on raw events; the inner join back to dau drops
    // the phantom tail days past the data range. Stickiness is a double
    // division of exact counts.
    Q("ev_dau_wau",
      (s, d) => {
        val du = t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val dau = du.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
        val wau = du
          .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
            col("user_id"))
          .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
      },
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
        |wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
        |  FROM dau d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT dau.day, dau, wau,
        |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin)),

    // Within-session co-occurrence with lift — the market-basket analysis
    // of the event stream (which event types happen together more than
    // chance): sessions from the engine's gap sessionizer, distinct
    // (user, session, type) triples, type pairs per session (type
    // cardinality is tiny, so the per-session pair fan-out is bounded),
    // lift = P(ab)/(P(a)·P(b)) over exact session counts, rounded 6dp.
    // Scale shape: one user-keyed sessionize window, then every aggregate
    // runs on the collapsed (session, type) projection — the raw stream
    // never re-shuffles.
    Q("ev_market_basket",
      (s, d) => {
        val ev = t(s, d, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val sess = ev
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .select(col("user_id"), col("event_type"),
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("session_id"))
          .distinct()
        val nSessions = sess.select("user_id", "session_id").distinct()
          .agg(count(lit(1)).as("n_total"))
        val typeCounts = sess.groupBy("event_type")
          .agg(count(lit(1)).as("n_type"))
        val pairs = sess.as("a")
          .join(sess.as("b"), Seq("user_id", "session_id"))
          .filter(col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_both"))
        pairs
          .join(broadcast(typeCounts.select(col("event_type").as("type_a"),
            col("n_type").as("n_a"))), "type_a")
          .join(broadcast(typeCounts.select(col("event_type").as("type_b"),
            col("n_type").as("n_b"))), "type_b")
          .crossJoin(broadcast(nSessions))
          .select(col("type_a"), col("type_b"), col("n_both"),
            round((col("n_both").cast("double") * col("n_total").cast("double"))
              / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
              .as("lift"))
      },
      Some("""WITH sess AS (
        |  SELECT DISTINCT user_id, session_id, event_type FROM (
        |    SELECT user_id, event_type,
        |      CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |        THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |    FROM (SELECT user_id, event_id, event_type, ts,
        |            epoch_us(CAST(ts AS TIMESTAMP))
        |              - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |          FROM events))),
        |tot AS (SELECT COUNT(*) AS n_total
        |  FROM (SELECT DISTINCT user_id, session_id FROM sess)),
        |tc AS (SELECT event_type, COUNT(*) AS n_type FROM sess GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    COUNT(*) AS n_both
        |  FROM sess a JOIN sess b
        |    ON a.user_id = b.user_id AND a.session_id = b.session_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both,
        |  round((CAST(n_both AS DOUBLE) * CAST(n_total AS DOUBLE))
        |    / (CAST(n_a.n_type AS DOUBLE) * CAST(n_b.n_type AS DOUBLE)), 6) AS lift
        |FROM pairs
        |JOIN tc n_a ON n_a.event_type = type_a
        |JOIN tc n_b ON n_b.event_type = type_b
        |CROSS JOIN tot""".stripMargin)),

    // Gaps-and-islands: longest consecutive-day activity streak per user
    // (the engagement metric behind every "N-day streak" feature) via the
    // classic day-minus-rank island key — consecutive days share
    // date_sub(day, rank), so islands fall out of ONE user-keyed window +
    // two keyed aggregates; no self-join, no iteration. The event stream
    // first collapses to the distinct (user, day) pair table (tiny), so
    // the window never sees raw events.
    Q("ev_streaks",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("day")
        t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .withColumn("grp", date_sub(col("day"), row_number().over(w)))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max(col("len")).as("longest_streak"),
            count(lit(1)).as("n_streaks"))
      },
      Some("""WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INTEGER) AS grp
        |  FROM du),
        |runs AS (SELECT user_id, grp, COUNT(*) AS len
        |  FROM isl GROUP BY user_id, grp)
        |SELECT user_id, MAX(len) AS longest_streak,
        |  COUNT(*) AS n_streaks
        |FROM runs GROUP BY user_id""".stripMargin)),

    // First-order Markov transition matrix over within-session event
    // sequences (the model behind next-action prediction and funnel-drop
    // attribution): P(next | prev) over consecutive event pairs that share
    // a session, p = n / n_prev rounded 6dp over exact counts. Scale
    // shape: sessionize, lead(type), and lead(session) are THREE window
    // functions over the SAME (user)-keyed (ts, event_id)-ordered frame —
    // one exchange, one sort, no self-join — and every aggregate runs on
    // the collapsed (prev, next) pair frame (|types|² rows at most).
    Q("ev_markov",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val trans = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_sess", lead(col("session_id"), 1).over(w))
          .filter(col("next_type").isNotNull &&
            col("next_sess") === col("session_id"))
          .groupBy(col("event_type").as("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        val totals = trans.groupBy("prev_type")
          .agg(sum(col("n")).as("n_prev"))
        trans.join(broadcast(totals), "prev_type")
          .select(col("prev_type"), col("next_type"), col("n"),
            round(col("n").cast("double") / col("n_prev").cast("double"), 6)
              .as("p"))
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |tr AS (
        |  SELECT event_type AS prev_type, session_id,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type,
        |    lead(session_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_sess
        |  FROM lab),
        |cnt AS (SELECT prev_type, next_type, COUNT(*) AS n FROM tr
        |        WHERE next_type IS NOT NULL AND next_sess = session_id
        |        GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_prev
        |        FROM cnt GROUP BY 1)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(n_prev AS DOUBLE), 6) AS p
        |FROM cnt JOIN tot USING (prev_type)""".stripMargin)),

    // Linear multi-touch attribution: each purchase splits one unit of
    // conversion credit equally across the events that preceded it in the
    // SAME session, aggregated per event type — the marketing-analytics
    // answer to "which touchpoints actually drive purchases" that
    // last-touch counting gets wrong. Credit stays EXACT: micro-credits
    // are 1e6 div n_preceding integer longs (engine-identical), summed as
    // longs; the readable double is derived at the end. Scale shape: the
    // ev_market_basket precedent — one user-keyed sessionize window, a
    // (user, session)-keyed self-join whose fan-out is bounded by
    // session length × purchases-per-session, then everything collapses
    // through (purchase, type)-keyed map-combined counts.
    Q("ev_attribution",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val sess = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("user_id", "session_id", "event_id", "ts", "event_type")
        val purch = sess.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("session_id"),
            col("event_id").as("p_id"), col("ts").as("p_ts"))
        val perType = sess.join(purch, Seq("user_id", "session_id"))
          .filter(col("ts") < col("p_ts") ||
            (col("ts") === col("p_ts") && col("event_id") < col("p_id")))
          .groupBy("p_id", "event_type").agg(count(lit(1)).as("n_t"))
        val perPurch = perType.groupBy("p_id")
          .agg(sum(col("n_t")).as("n_prec"))
        perType.join(perPurch, "p_id")
          .select(col("event_type"),
            (col("n_t") * expr("1000000 div n_prec")).as("c"), col("n_t"))
          .groupBy("event_type")
          .agg(sum(col("c")).as("credit_micro"),
            sum(col("n_t")).as("n_touches"))
          .select(col("event_type"), col("credit_micro"), col("n_touches"),
            round(col("credit_micro").cast("double") / 1000000.0, 6)
              .as("credit"))
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |purch AS (SELECT user_id, session_id, event_id AS p_id, ts AS p_ts
        |          FROM lab WHERE event_type = 'purchase'),
        |pt AS (
        |  SELECT p.p_id, l.event_type, COUNT(*) AS n_t
        |  FROM lab l JOIN purch p USING (user_id, session_id)
        |  WHERE l.ts < p.p_ts OR (l.ts = p.p_ts AND l.event_id < p.p_id)
        |  GROUP BY 1, 2),
        |pp AS (SELECT p_id, CAST(SUM(n_t) AS BIGINT) AS n_prec
        |       FROM pt GROUP BY 1)
        |SELECT event_type,
        |  CAST(SUM(n_t * (1000000 // n_prec)) AS BIGINT) AS credit_micro,
        |  CAST(SUM(n_t) AS BIGINT) AS n_touches,
        |  round(CAST(SUM(n_t * (1000000 // n_prec)) AS DOUBLE) / 1000000.0, 6)
        |    AS credit
        |FROM pt JOIN pp USING (p_id)
        |GROUP BY event_type""".stripMargin)),

    // Second-order behavioral patterns: within-session event-type TRIGRAMS
    // (what ev_markov's first-order matrix cannot see — "view→click→error"
    // vs "view→click→purchase" share every bigram yet tell opposite
    // stories). Both leads and the sessionizer ride the SAME user-keyed
    // (ts, event_id)-ordered frame — still one exchange, one sort — and
    // the rollup runs on the |types|³-bounded trigram frame.
    Q("ev_type_trigrams",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .withColumn("s3", lead(col("session_id"), 2).over(w))
          .filter(col("t3").isNotNull && col("s3") === col("session_id"))
          .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |tri AS (
        |  SELECT event_type AS t1, session_id,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3,
        |    lead(session_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s3
        |  FROM lab)
        |SELECT t1, t2, t3, COUNT(*) AS n
        |FROM tri WHERE t3 IS NOT NULL AND s3 = session_id
        |GROUP BY 1, 2, 3""".stripMargin)),

    // Top-20 session-opening paths (the first 5 event types of every
    // session joined '>'-separated) — the product-analytics view of HOW
    // users move, complementing ev_markov's one-step transition matrix and
    // ev_type_trigrams' fixed-width windows with whole-path counts.
    // Determinism: the path string is assembled from the within-session
    // row_number over the total (ts, event_id) order — Spark sorts the
    // collected (rn, type) structs before joining (collect_list order is
    // not a contract; the sort makes it one), the oracle's string_agg
    // orders by the same rn. Ties at the top-20 boundary break on the path
    // string itself. Scale shape: one session-keyed window pass, then a
    // map-combined count on the ≤|distinct paths| frame, then the
    // k-bounded TakeOrderedAndProject — no global sort of the path table.
    Q("ev_top_paths",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val sw = Window.partitionBy("user_id", "session_id")
          .orderBy("ts", "event_id")
        val paths = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(sw))
          .filter(col("rn") <= 5)
          .groupBy("user_id", "session_id")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), ">").as("path"))
        paths.groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(20)
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |rn AS (
        |  SELECT user_id, session_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM lab),
        |p AS (
        |  SELECT string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM rn WHERE rn <= 5 GROUP BY user_id, session_id)
        |SELECT path, COUNT(*) AS n FROM p GROUP BY 1
        |ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    // PageRank over the within-session transition graph (which event types
    // the traffic actually flows THROUGH, not just how often each fires —
    // the difference between a hub step and a terminal step). Ten damped
    // (0.85) power iterations in EXACT fixed-point arithmetic: ranks are
    // scaled longs (1e12), every per-edge contribution is the explicitly
    // ordered integer chain (((r·n) div out) · 17) div 20, so both engines
    // walk bit-identical integers — no cross-engine float accumulation at
    // all. Scale shape: the event stream collapses through the ev_markov
    // single-exchange window into a |types|²-bounded edge frame; all ten
    // iterations run on that tiny frame (auto-broadcast joins), the fact
    // table is scanned once. The oracle unrolls the same ten iterations as
    // chained CTEs — no recursive-CTE aggregate restrictions to dodge.
    //
    // The edge and node frames are materialized ONCE via
    // plans/LazyCheckpoint (the dd_lsh_pairs discipline): without the
    // cut, every iteration re-derives the sessionize window per branch
    // and the static plan balloons to 100+ parquet scans of the SAME
    // events table; with it, ten iterations reference two tiny
    // checkpointed frames and the stream is scanned once. A bare
    // eager=false here EXECUTED the window at plan construction
    // (measured: 5 jobs per plan-only build — a corpus scan per .explain
    // at scale); the scoped-AQE-off checkpoint plus a merge hint on the
    // fragment's own join (a broadcast subtree would submit its collect
    // job at RDD-construction time) makes construction run NOTHING.
    Q("ev_pagerank",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val edges = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_sess", lead(col("session_id"), 1).over(w))
          .filter(col("next_type").isNotNull &&
            col("next_sess") === col("session_id"))
          .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
          .agg(count(lit(1)).as("n"))
        val out = edges.groupBy("src").agg(sum(col("n")).as("out_n"))
        val e = graft.plans.LazyCheckpoint.of(
          edges.hint("merge").join(out, "src"))
        val nodes = graft.plans.LazyCheckpoint.of(
          e.select(col("src").as("node"))
            .union(e.select(col("dst").as("node"))).distinct())
        val nn = nodes.agg(count(lit(1)).as("n_nodes"))
        var pr = nodes.crossJoin(broadcast(nn))
          .select(col("node"), expr("1000000000000 div n_nodes").as("r"))
        for (_ <- 1 to 10) {
          val inflow = pr
            .join(e.withColumnRenamed("src", "node"), "node")
            .select(col("dst"),
              expr("(((r * n) div out_n) * 17) div 20").as("c"))
            .groupBy("dst").agg(sum(col("c")).as("inflow"))
          pr = nodes.crossJoin(broadcast(nn))
            .join(broadcast(inflow.withColumnRenamed("dst", "node")),
              Seq("node"), "left")
            .select(col("node"),
              (expr("150000000000 div n_nodes")
                + coalesce(col("inflow"), lit(0L))).as("r"))
        }
        pr.select(col("node"), col("r").as("rank_scaled"),
          round(col("r").cast("double") / 1000000000000.0, 6).as("rank"))
      },
      Some(PagerankSql)),

    // Multi-source BFS hop distance over the same within-session
    // transition graph: how many steps from any session-OPENING event type
    // (the row_number()=1 types — the graph's sources) to each reachable
    // type, the "how deep in a journey does this action live" readout.
    // The Pregel shape: a distance frame relaxed through the edge list,
    // min-merged each round — 16 fixed rounds (hop distances are bounded
    // by |types|−1, and the oracle's recursion carries the IDENTICAL d<16
    // cap, so the two engines explore exactly the same path lengths).
    // Exact integer hops; no floats anywhere. Scale shape: the event
    // stream collapses once through the sessionize window into the
    // |types|²-bounded edge frame (via plans/LazyCheckpoint — plan-only
    // callers run NOTHING, measured 37 → 0 construction jobs vs the bare
    // eager=false form); all rounds run on that tiny frame with the
    // previous round lazily checkpointed so the plan stays bounded
    // instead of doubling per round.
    Q("ev_shortest_hops",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sw = Window.partitionBy("user_id", "session_id")
          .orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val base = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(sw))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_sess", lead(col("session_id"), 1).over(w))
        // LazyCheckpoint, not bare eager=false: the bare form EXECUTES
        // each fragment's exchanges at construction under AQE (measured:
        // 37 jobs per plan-only construction of this query) — plan-only
        // callers must run nothing; the fragments are |types|-bounded, so
        // losing AQE inside them costs nothing (joins pinned below)
        val baseC = graft.plans.LazyCheckpoint.of(base)
        val e = graft.plans.LazyCheckpoint.of(baseC
          .filter(col("next_type").isNotNull &&
            col("next_sess") === col("session_id"))
          .select(col("event_type").as("src"), col("next_type").as("dst"))
          .distinct())
        val seeds = graft.plans.LazyCheckpoint.of(
          baseC.filter(col("rn") === 1)
            .select(col("event_type").as("node")).distinct())
        val nodes = graft.plans.LazyCheckpoint.of(
          e.select(col("src").as("node"))
            .union(e.select(col("dst").as("node")))
            .union(seeds.select(col("node"))).distinct())
        val unreached = 999999L
        // MERGE hints, never broadcasts, inside the checkpointed rounds: a
        // broadcast subtree submits its collect job at RDD-construction
        // (prepare) time — the first one would force the corpus window at
        // PLAN time (measured: 17 construction jobs with hints/estimated
        // broadcasts, 0 with merge joins); the frames are |types|-bounded,
        // so the per-round sort-merge is trivially cheap
        var dist = graft.plans.LazyCheckpoint.of(nodes
          .hint("merge")
          .join(seeds.withColumn("h0", lit(0L)), Seq("node"), "left")
          .select(col("node"), coalesce(col("h0"), lit(unreached)).as("hops")))
        for (_ <- 1 to 16) {
          val relaxed = dist
            .hint("merge")
            .join(e.withColumnRenamed("src", "node"), "node")
            .select(col("dst").as("node"), (col("hops") + 1L).as("hops"))
          dist = graft.plans.LazyCheckpoint.of(dist.union(relaxed)
            .groupBy("node").agg(min(col("hops")).as("hops")))
        }
        dist.filter(col("hops") < unreached)
          .select(col("node").as("event_type"), col("hops"))
      },
      Some("""WITH RECURSIVE lab AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |seq AS (
        |  SELECT event_type, session_id,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts, event_id) AS rn,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type,
        |    lead(session_id) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_sess
        |  FROM lab),
        |edges AS (
        |  SELECT DISTINCT event_type AS src, next_type AS dst FROM seq
        |  WHERE next_type IS NOT NULL AND next_sess = session_id),
        |seeds AS (SELECT DISTINCT event_type AS node FROM seq WHERE rn = 1),
        |reach(node, d) AS (
        |  SELECT node, CAST(0 AS BIGINT) FROM seeds
        |  UNION
        |  SELECT e.dst, r.d + 1 FROM reach r
        |  JOIN edges e ON e.src = r.node WHERE r.d < 16)
        |SELECT node AS event_type, MIN(d) AS hops FROM reach GROUP BY 1""".stripMargin)),

    // Trending items per day (the windowed top-k every analytics dashboard
    // serves): top-3 event types by count within each calendar day, ties
    // to the lexicographically last type (the TopKPerGroup descending
    // contract, mirrored in the oracle's ORDER BY ... DESC). Scale shape:
    // one (day, type)-keyed map-combined count — the partial agg collapses
    // the event stream to the tiny day×type frame — then the custom
    // k-bounded-heap operator keyed by day; no window, no per-day sort
    // buffer however hot a day is.
    Q("ev_trending",
      (s, d) => graft.plans.TopKPerGroup(
        t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("event_type"))
          .groupBy("day", "event_type").agg(count(lit(1)).as("n")),
        group = Seq("day"), order = Seq("n", "event_type"), k = 3),
      Some("""SELECT day, event_type, n FROM (
        |  SELECT day, event_type, n, row_number() OVER (
        |    PARTITION BY day ORDER BY n DESC, event_type DESC) AS rn
        |  FROM (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        |        FROM events GROUP BY 1, 2))
        |WHERE rn <= 3""".stripMargin)),

    // The sketch-ledger counterpart of ev_dau_wau: per-day mergeable HLL
    // user sketches rolled into trailing-7-day distinct estimates —
    // history is never re-scanned (EventOps.dailyUserSketches scaladoc).
    // Sketch ESTIMATES have no DuckDB analogue, but the 5% accuracy bound
    // does: the judged entry computes BOTH the sketch estimate and the
    // exact trailing-7-day WAU, keeps only days where the estimate sits
    // within 5% of exact, and emits (day, wau_exact) — which DuckDB
    // recomputes in full. A sketch drifting past its bound drops that
    // day's row and fails the row compare; the exact values are
    // hash-checked as usual. Merge-order invariance of the BOUND (not the
    // bits) is additionally spec'd in OperatorsSpec.
    Q("ev_wau_sketch",
      (s, d) => {
        val ledger = graft.operators.EventOps.dailyUserSketches(t(s, d, "events"))
        val est = graft.operators.EventOps.rollingDistinctUsers(ledger, days = 7)
          .join(ledger.select("day"), "day") // drop tail windows past the data
        val du = t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val exact = du
          .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
            col("user_id"))
          .groupBy("day").agg(countDistinct(col("user_id")).as("wau_exact"))
        est.join(exact, "day")
          .filter(abs(col("approx_users") - col("wau_exact").cast("double"))
            <= col("wau_exact").cast("double") * 0.05)
          .select(col("day"), col("wau_exact"))
      },
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau_exact
        |  FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT day, wau_exact FROM wau""".stripMargin)),

    // Recency-weighted engagement: per-user activity score under
    // exponential time decay with a one-week half-life. The decay weight
    // is EXACT: 0.5^(weeks_ago) is scaled to the integer 2^(30 − weeks),
    // summed as longs (order/partitioning-independent), and divided by
    // 2^30 once at the end — transcendental-free, so the score is
    // bit-identical across engines and cluster layouts, unlike a
    // pow(0.5, x)-per-row formulation whose sum order would matter.
    // Scale shape: the corpus max-day is a SINGLE-ROW aggregate broadcast
    // back (the p13 scalar-subquery shape), then one user-keyed
    // map-combined aggregate. Incrementality note: a stored score ages by
    // one halving per elapsed week (multiply by 2⁻¹), so the ledger
    // updates without rescanning history — the ev_wau_sketch contract.
    Q("ev_decay_score",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val mx = ev.agg(max(col("day")).as("max_day"))
        ev.crossJoin(broadcast(mx))
          .withColumn("wt",
            expr("shiftleft(cast(1 as bigint), 30 - cast(datediff(max_day, day) div 7 as int))"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum(col("wt")).as("s"))
          .select(col("user_id"), col("n_events"),
            (col("s").cast("double") / lit(1073741824.0)).as("decay_score"))
      },
      Some("""WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
        |e AS (SELECT user_id,
        |        (1::BIGINT << (30 - CAST((max_day - CAST(ts AS DATE)) // 7 AS INT))) AS wt
        |      FROM events CROSS JOIN mx)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(wt) AS DOUBLE) / 1073741824.0 AS decay_score
        |FROM e GROUP BY 1""".stripMargin)),

    // Item-item co-visitation with cosine normalization — the "users who
    // viewed X also viewed Y" primitive behind item-based collaborative
    // filtering (Linden et al., IEEE Internet Computing 2003). The stream
    // collapses to distinct (user, item) once; per-user pair emission goes
    // through the capped bucketPairs splitter (power-user defense), and
    // the normalization joins the tiny per-item user counts back in.
    // cosine = n_both / √(n_a·n_b), rounded 6dp on identical integer
    // inputs both engines.
    Q("ev_covisitation",
      (s, d) => {
        val views = t(s, d, "events").filter(col("event_type") === "view")
        val item = get_json_object(col("props"), "$.k").cast("long")
        val ic = views.select(col("user_id"), item.as("item")).distinct()
          .groupBy("item").agg(count(lit(1)).as("n"))
        EventOps.covisitationEdges(views, item, minUsers = 1L)
          .join(ic.select(col("item").as("u"), col("n").as("n_u")), "u")
          .join(ic.select(col("item").as("v"), col("n").as("n_v")), "v")
          .select(col("u").as("item_a"), col("v").as("item_b"), col("n_both"),
            round(col("n_both").cast("double") /
              sqrt(col("n_u").cast("double") * col("n_v").cast("double")), 6)
              .as("cosine"))
      },
      Some("""WITH vi AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE event_type = 'view'),
        |ic AS (SELECT item, COUNT(*) AS n FROM vi GROUP BY 1),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
        |  FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, n_both,
        |  round(n_both / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)), 6)
        |    AS cosine
        |FROM pairs
        |JOIN ic na ON na.item = item_a
        |JOIN ic nb ON nb.item = item_b""".stripMargin)),

    // Shifted positive PMI over the co-visitation graph — the
    // word2vec-as-implicit-matrix-factorization weighting (Levy &
    // Goldberg, NeurIPS 2014): PMI(a,b) = ln(n_both·U / (n_a·n_b)) with
    // U = distinct (user, item) observations, SPPMI = max(0, PMI − ln 5).
    // The ln is ROW-LOCAL on the pair frame (never summed), so 6dp
    // rounding on identical integer ratios is the only cross-engine
    // contract (the tx_tfidf treatment — boundary-audited). Scale shape:
    // the same capped pair pipeline as ev_covisitation plus a one-row
    // broadcast total; PMI itself adds zero shuffles.
    Q("ev_pmi",
      (s, d) => {
        val views = t(s, d, "events").filter(col("event_type") === "view")
        val item = get_json_object(col("props"), "$.k").cast("long")
        val vi = views.select(col("user_id"), item.as("item")).distinct()
        val total = vi.agg(count(lit(1)).as("u_total"))
        val ic = vi.groupBy("item").agg(count(lit(1)).as("n"))
        val pmi = log(col("n_both").cast("double") * col("u_total").cast("double") /
          (col("n_u").cast("double") * col("n_v").cast("double")))
        EventOps.covisitationEdges(views, item, minUsers = 2L)
          .join(ic.select(col("item").as("u"), col("n").as("n_u")), "u")
          .join(ic.select(col("item").as("v"), col("n").as("n_v")), "v")
          .crossJoin(broadcast(total))
          .select(col("u").as("item_a"), col("v").as("item_b"), col("n_both"),
            round(pmi, 6).as("pmi"),
            greatest(lit(0.0), round(pmi - log(lit(5.0)), 6)).as("sppmi"))
      },
      Some("""WITH vi AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE event_type = 'view'),
        |tot AS (SELECT COUNT(*) AS u_total FROM vi),
        |ic AS (SELECT item, COUNT(*) AS n FROM vi GROUP BY 1),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_both
        |  FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT item_a, item_b, n_both,
        |  round(ln(CAST(n_both AS DOUBLE) * CAST(u_total AS DOUBLE)
        |    / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))), 6) AS pmi,
        |  greatest(0.0, round(ln(CAST(n_both AS DOUBLE) * CAST(u_total AS DOUBLE)
        |    / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))) - ln(5.0), 6)) AS sppmi
        |FROM pairs
        |JOIN ic na ON na.item = item_a
        |JOIN ic nb ON nb.item = item_b
        |CROSS JOIN tot""".stripMargin)),

    // Triangle participation counts on the thresholded co-visitation graph
    // (≥5 shared viewers per edge): the clustering-structure audit of the
    // item graph, via degree-ordered orientation (Suri & Vassilvitskii,
    // WWW 2011) — out-degrees cap at O(√m) on ANY graph, so the wedge
    // join never explodes on a hub. The oracle counts the same triangles
    // by the naive three-way id-ordered join: orientation changes the
    // work, provably not the triangle set.
    Q("ev_triangles",
      (s, d) => Graph.triangleCountsFromOriented(orientedCovisitation(s, d))
        .withColumnRenamed("node", "item"),
      Some("""WITH vi AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE event_type = 'view'),
        |e AS (
        |  SELECT a.item AS ia, b.item AS ib
        |  FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |tri AS (
        |  SELECT e1.ia AS a, e1.ib AS b, e2.ib AS c
        |  FROM e e1 JOIN e e2 ON e1.ib = e2.ia
        |  JOIN e e3 ON e3.ia = e1.ia AND e3.ib = e2.ib),
        |m AS (SELECT a AS item FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri)
        |SELECT item, COUNT(*) AS n_triangles FROM m GROUP BY 1""".stripMargin)),

    // k-core extraction on the co-visitation graph (the "dense engaged
    // core" behind community mining and spam-farm detection): 6-round
    // degree peel at k=12 over the ≥4-shared-viewer edges. The round
    // count is the explicit iterative-loop contract (the BPE/k-means
    // discipline): the oracle unrolls the SAME 6 peels, so the judged
    // result is well-defined even independent of convergence (the
    // fixture converges in 3). Each round: two map-combined degree
    // aggregates + two survivor semi-joins, lineage cut per round.
    Q("ev_kcore",
      (s, d) => Graph.kcore(
        EventOps.covisitationEdges(
          t(s, d, "events").filter(col("event_type") === "view"),
          get_json_object(col("props"), "$.k").cast("long"), minUsers = 4L)
          .select("u", "v"),
        k = 12, rounds = 6)
        .withColumnRenamed("node", "item"),
      Some(KcoreOracle)),

    // One-row structural audit of the co-visitation graph: size, density,
    // and degree assortativity (Newman 2002) — disassortative item graphs
    // (hubs attach to leaves) and assortative ones (hub cliques) need
    // different serving strategies, and a sudden assortativity shift is a
    // bot-ring signature. Exactness: degrees are integers; the Pearson
    // correlation over the symmetrized edge list reduces to
    // (2m·Σxy − (Σx)²) / (2m·Σx² − (Σx)²) in EXACT longs (symmetry makes
    // the x and y marginals identical), with one IEEE division at the
    // end — no rounding contract needed. Scale shape: degree frame joins
    // the edge list equi-keyed twice; one-row aggregates cross-join (the
    // p13 scalar shape). Long arithmetic holds to ~3e9-degree-sum
    // corpora; the decimal(38) variant is the drop-in beyond.
    Q("ev_graph_stats",
      (s, d) => {
        val e = EventOps.covisitationEdges(
          t(s, d, "events").filter(col("event_type") === "view"),
          get_json_object(col("props"), "$.k").cast("long"), minUsers = 4L)
          .select("u", "v")
        val deg = e.select(col("u").as("node"))
          .unionAll(e.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
          max(col("deg")).as("max_degree"))
        val dir = e.select(col("u").as("x"), col("v").as("y"))
          .unionAll(e.select(col("v").as("x"), col("u").as("y")))
        val edgeStats = dir
          .join(deg.select(col("node").as("x"), col("deg").as("dx")), "x")
          .join(deg.select(col("node").as("y"), col("deg").as("dy")), "y")
          .agg(count(lit(1)).as("n2"), sum(col("dx") * col("dy")).as("sxy"),
            sum(col("dx")).as("sx"), sum(col("dx") * col("dx")).as("sxx"))
        // try_divide: an EMPTY graph (n_nodes = 0, tiny fixtures) or a
        // degree-regular one (zero assortativity denominator) must yield
        // NULL stats, not an ANSI DIVIDE_BY_ZERO — identical values
        // whenever the denominator is nonzero (the judged scale)
        edgeStats.crossJoin(broadcast(nodeStats))
          .select(col("n_nodes"), expr("n2 div 2").as("n_edges"),
            try_divide(col("n2").cast("double"),
              col("n_nodes").cast("double")).as("avg_degree"),
            col("max_degree"),
            try_divide(
              (col("n2") * col("sxy") - col("sx") * col("sx")).cast("double"),
              (col("n2") * col("sxx") - col("sx") * col("sx")).cast("double"))
              .as("assortativity"))
      },
      Some("""WITH vi AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE event_type = 'view'),
        |e AS (
        |  SELECT a.item AS u, b.item AS v
        |  FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 4),
        |deg AS (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |         CAST(MAX(deg) AS BIGINT) AS max_degree FROM deg),
        |dir AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
        |es AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2,
        |         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
        |         CAST(SUM(dx.deg) AS BIGINT) AS sx,
        |         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx
        |       FROM dir JOIN deg dx ON dx.node = dir.x
        |                JOIN deg dy ON dy.node = dir.y)
        |SELECT n_nodes, n2 // 2 AS n_edges,
        |  CAST(n2 AS DOUBLE) / CAST(n_nodes AS DOUBLE) AS avg_degree,
        |  max_degree,
        |  CAST(n2 * sxy - sx * sx AS DOUBLE)
        |    / CAST(n2 * sxx - sx * sx AS DOUBLE) AS assortativity
        |FROM es CROSS JOIN ns""".stripMargin)),

    // Leave-last-out next-item recommendation evaluation — the composite
    // that makes the co-visitation family earn its keep: hold out each
    // user's LAST viewed item, recommend by summed item-item cosine from
    // the history-only co-visitation model (held-out observations never
    // enter the model — no train/test leakage), and report hit-rate@10
    // and MRR@10. Determinism: per-edge cosines round to scaled longs at
    // 1e6 BEFORE the per-candidate sum (order-independent), ranking is
    // pure integer (score desc, item asc), and MRR pre-rounds 1e6/rank
    // per hit (an exact 10-value table) before its long sum. Scale
    // shape: one user-keyed window for the held-out item, the capped
    // covisitation pair path, item-keyed score joins, a user-keyed rank
    // window, and two one-row aggregates cross-joined at the very end.
    Q("ev_rec_hitrate",
      (s, d) => {
        val item = get_json_object(col("props"), "$.k").cast("long")
        val v = t(s, d, "events").filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"), col("ts"), item.as("item"))
        val wLast = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        // checkpoint: the holdout frame feeds both the history build and
        // the final hit join — cut the lineage so the user-keyed window
        // runs once, not once per consumer
        // LazyCheckpoint + merge hint (the ev_pagerank discipline): bare
        // eager=false ran the user-keyed window + distinct at plan
        // construction (measured 3 jobs), and inside the non-adaptive
        // hist fragment a statically-broadcast `last` side would submit
        // its collect at construction
        val last = graft.plans.LazyCheckpoint.of(
          v.withColumn("rn", row_number().over(wLast))
            .filter(col("rn") === 1)
            .select(col("user_id"), col("item").as("held")))
        val hist = graft.plans.LazyCheckpoint.of(
          v.hint("merge").join(last, "user_id")
            .filter(col("item") =!= col("held"))
            .select("user_id", "item").distinct())
        val ic = hist.groupBy("item").agg(count(lit(1)).as("n"))
        val cos = EventOps.covisitationEdges(
            hist.select(col("user_id"), col("item")), col("item"), minUsers = 1L)
          .join(ic.select(col("item").as("u"), col("n").as("n_u")), "u")
          .join(ic.select(col("item").as("v"), col("n").as("n_v")), "v")
          .select(col("u"), col("v"),
            round(col("n_both").cast("double") /
              sqrt(col("n_u").cast("double") * col("n_v").cast("double"))
              * lit(1e6), 0).cast("long").as("c6"))
        val bi = cos.select(col("u").as("i"), col("v").as("c"), col("c6"))
          .unionAll(cos.select(col("v").as("i"), col("u").as("c"), col("c6")))
        val scores = hist.as("h").join(bi.as("b"), col("h.item") === col("b.i"))
          .groupBy(col("h.user_id").as("user_id"), col("b.c").as("c"))
          .agg(sum(col("c6")).as("sc"))
          .join(hist.select(col("user_id"), col("item").as("c")),
            Seq("user_id", "c"), "left_anti")
        val wRank = Window.partitionBy("user_id")
          .orderBy(col("sc").desc, col("c"))
        val hits = scores.withColumn("rn", row_number().over(wRank))
          .filter(col("rn") <= 10)
          .join(last, "user_id").filter(col("c") === col("held"))
          .select(col("user_id"), col("rn"))
        val nu = hist.select("user_id").distinct()
          .agg(count(lit(1)).as("n_users"))
        val hm = hits.agg(count(lit(1)).as("n_hits"),
          coalesce(sum(round(lit(1e6) / col("rn"), 0).cast("long")), lit(0L))
            .as("mrr6"))
        nu.crossJoin(broadcast(hm))
          .select(col("n_users"), col("n_hits"),
            (col("n_hits").cast("double") / col("n_users").cast("double"))
              .as("hit_rate"),
            (col("mrr6").cast("double") / lit(1e6) / col("n_users").cast("double"))
              .as("mrr"))
      },
      Some("""WITH v AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE event_type = 'view'),
        |lst AS (SELECT user_id, item AS held FROM (
        |  SELECT user_id, item, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM v) WHERE rn = 1),
        |hist AS (SELECT DISTINCT v.user_id, v.item
        |  FROM v JOIN lst USING (user_id) WHERE v.item <> held),
        |ic AS (SELECT item, COUNT(*) AS n FROM hist GROUP BY 1),
        |pairs AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS n_both
        |  FROM hist a JOIN hist b ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2),
        |cs AS (SELECT ia, ib, CAST(round(n_both
        |    / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))
        |    * 1000000.0, 0) AS BIGINT) AS c6
        |  FROM pairs JOIN ic na ON na.item = ia JOIN ic nb ON nb.item = ib),
        |bi AS (SELECT ia AS i, ib AS c, c6 FROM cs
        |       UNION ALL SELECT ib, ia, c6 FROM cs),
        |sc AS (SELECT h.user_id, b.c, CAST(SUM(b.c6) AS BIGINT) AS s
        |  FROM hist h JOIN bi b ON b.i = h.item GROUP BY 1, 2),
        |scx AS (SELECT sc.user_id, sc.c, sc.s FROM sc
        |  LEFT JOIN hist hh ON hh.user_id = sc.user_id AND hh.item = sc.c
        |  WHERE hh.item IS NULL),
        |top AS (SELECT user_id, c, row_number() OVER (
        |    PARTITION BY user_id ORDER BY s DESC, c) AS rn FROM scx),
        |hits AS (SELECT t.user_id, t.rn FROM top t
        |  JOIN lst l ON l.user_id = t.user_id AND t.c = l.held
        |  WHERE t.rn <= 10),
        |nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM hist),
        |hm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
        |  COALESCE(CAST(SUM(CAST(round(1000000.0 / rn, 0) AS BIGINT)) AS BIGINT),
        |    0) AS mrr6 FROM hits)
        |SELECT n_users, n_hits,
        |  CAST(n_hits AS DOUBLE) / CAST(n_users AS DOUBLE) AS hit_rate,
        |  CAST(mrr6 AS DOUBLE) / 1000000.0 / CAST(n_users AS DOUBLE) AS mrr
        |FROM nu CROSS JOIN hm""".stripMargin)),

    // Exponentially-smoothed daily levels per event type (simple
    // exponential smoothing, α = 1/2): l_d = c_d/2 + l_{d−1}/2 in CLOSED
    // FORM — l_d = (Σ_{d'≤d} c_{d'}·2^{d'}) / 2^{d+1}, so the whole
    // recursion is ONE running integer sum and an exact power-of-two
    // division: transcendental-free, bit-identical everywhere, and gap
    // days decay correctly because weights depend on day DISTANCE, not
    // row adjacency. Long headroom: counts·2^horizon must fit 63 bits —
    // fine to ~2^20 events/day over a 30-day window; longer horizons
    // re-anchor per window (the decay-ledger trick) or go decimal(38).
    // Scale shape: the corpus collapses to the (type, day) frame first;
    // the window runs on that bounded frame only (the tx_zipf precedent);
    // one-row broadcast min-day (p13 shape).
    Q("ev_smoothing",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val mn = daily.agg(min(col("day")).as("min_day"))
        val w = Window.partitionBy("event_type").orderBy("di")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(mn))
          .withColumn("di", datediff(col("day"), col("min_day")).cast("int"))
          .withColumn("c2", expr("n * shiftleft(cast(1 as bigint), di)"))
          .withColumn("s", sum(col("c2")).over(w))
          .select(col("event_type"), col("day"), col("n"),
            (col("s").cast("double") /
              expr("cast(shiftleft(cast(1 as bigint), di + 1) as double)"))
              .as("level"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |mn AS (SELECT MIN(day) AS min_day FROM daily),
        |idx AS (SELECT event_type, day, n, (day - min_day) AS di,
        |          n * (1::BIGINT << (day - min_day)) AS c2
        |        FROM daily CROSS JOIN mn),
        |sm AS (SELECT event_type, day, n, di,
        |        CAST(SUM(c2) OVER (PARTITION BY event_type ORDER BY di
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
        |      FROM idx)
        |SELECT event_type, day, n,
        |  CAST(s AS DOUBLE) / CAST(1::BIGINT << (di + 1) AS DOUBLE) AS level
        |FROM sm""".stripMargin)),

    // CUSUM change-point detection on daily counts per event type (Page
    // 1954) — the drift alarm behind every pipeline-health monitor. The
    // textbook recursion S_d = max(0, S_{d−1} + dev_d) is NOT a plain
    // window aggregate, but it has the closed form
    // S_d = P_d − min(0, min_{d'≤d} P_{d'}) over the deviation prefix sum
    // P — two window functions, no iteration. Exactness: deviations are
    // scaled integers (nd·n_d − T, the mean scaled through by the day
    // count), missing days enter as explicit zero-count rows (a gap IS
    // evidence of drift), and the alarm compares scaled longs; the
    // reported cusum is one IEEE division. Scale shape: the corpus
    // collapses to (type, day) first; the day-range scaffold is a one-row
    // broadcast + row-local sequence explode; windows run on the bounded
    // scaffold frame only.
    Q("ev_cusum",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val range = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val scaffold = daily.select("event_type").distinct()
          .crossJoin(broadcast(range))
          .select(col("event_type"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
        val filled = scaffold.join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("cnt"), lit(0L)).as("n"))
        val tot = filled.groupBy("event_type")
          .agg(sum(col("n")).as("tt"), count(lit(1)).as("nd"))
        val wOrd = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        filled.join(tot, "event_type")
          .withColumn("dev", col("nd") * col("n") - col("tt"))
          .withColumn("p", sum(col("dev")).over(wOrd))
          .withColumn("s",
            col("p") - least(lit(0L), min(col("p")).over(wOrd)))
          .select(col("event_type"), col("day"), col("n"),
            (col("s").cast("double") / col("nd").cast("double")).as("cusum"),
            (col("s") > col("tt")).as("alarm"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |scaffold AS (
        |  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM (SELECT DISTINCT event_type FROM daily) CROSS JOIN rng),
        |filled AS (
        |  SELECT s.event_type, s.day, COALESCE(d.cnt, 0) AS n
        |  FROM scaffold s LEFT JOIN daily d
        |    ON d.event_type = s.event_type AND d.day = s.day),
        |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tt,
        |          COUNT(*) AS nd FROM filled GROUP BY 1),
        |c AS (SELECT f.event_type, f.day, f.n,
        |        CAST(SUM(nd * n - tt) OVER (PARTITION BY f.event_type
        |          ORDER BY f.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
        |        tt, nd
        |      FROM filled f JOIN tot USING (event_type)),
        |s2 AS (SELECT event_type, day, n, tt, nd,
        |        p - least(0, CAST(MIN(p) OVER (PARTITION BY event_type
        |          ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS s
        |      FROM c)
        |SELECT event_type, day, n,
        |  CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS cusum,
        |  s > tt AS alarm
        |FROM s2""".stripMargin)),

    // Single least-squares changepoint per event type over the daily count
    // series — WHERE did the level shift, where ev_cusum answers WHETHER
    // drift accumulated: the split k minimizing total squared error of a
    // two-segment constant fit, i.e. maximizing S_l²/k + S_r²/(T−k)
    // (binary-segmentation's scoring step, and one PELT round at depth 1).
    // Determinism: daily counts are integers, so the split score is the
    // EXACT scaled integer (S_l²(T−k) + S_r²k)·10⁶ div k(T−k) — both
    // engines walk identical integers (decimal(38,0) here, HUGEINT in the
    // oracle) and argmax ties break on the earlier day. The 10⁶-scaled
    // score stays in long range while a type's total stays ≤ ~3·10⁹
    // events; past that drop the scale factor (the comparison is
    // scale-invariant). Means are one rounded IEEE division each. Scale
    // shape: one map-combined (type, day) aggregate collapses the stream;
    // every window runs on the ≤|types|·|days| daily frame, and the
    // per-type argmax is O(T) via prefix sums — no per-split rescan.
    Q("ev_changepoint",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val all = Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val cum = daily
          .withColumn("k", row_number().over(w).cast("long"))
          .withColumn("sl", sum(col("x")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tt", count(lit(1)).over(all).cast("long"))
          .withColumn("st", sum(col("x")).over(all))
          .filter(col("k") < col("tt"))
        val sel = Window.partitionBy("event_type")
          .orderBy(col("q").desc, col("k"))
        cum
          .withColumn("q", expr(
            """(CAST(sl AS DECIMAL(38,0)) * CAST(sl AS DECIMAL(38,0))
              |   * CAST(tt - k AS DECIMAL(38,0))
              | + CAST(st - sl AS DECIMAL(38,0)) * CAST(st - sl AS DECIMAL(38,0))
              |   * CAST(k AS DECIMAL(38,0))) * 1000000
              | div (k * (tt - k))""".stripMargin))
          .withColumn("rn", row_number().over(sel))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("day").as("split_day"),
            col("k").as("k_days"), col("tt").as("t_days"),
            round(col("sl").cast("double") / col("k").cast("double"), 6)
              .as("mean_before"),
            round((col("st") - col("sl")).cast("double")
              / (col("tt") - col("k")).cast("double"), 6).as("mean_after"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, day,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS k,
        |    CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS tt,
        |    CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS st
        |  FROM daily),
        |scored AS (
        |  SELECT *,
        |    (CAST(sl AS HUGEINT) * CAST(sl AS HUGEINT) * CAST(tt - k AS HUGEINT)
        |     + CAST(st - sl AS HUGEINT) * CAST(st - sl AS HUGEINT)
        |       * CAST(k AS HUGEINT)) * 1000000
        |      // CAST(k * (tt - k) AS HUGEINT) AS q
        |  FROM cum WHERE k < tt)
        |SELECT event_type, day AS split_day, k AS k_days, tt AS t_days,
        |  round(CAST(sl AS DOUBLE) / CAST(k AS DOUBLE), 6) AS mean_before,
        |  round(CAST(st - sl AS DOUBLE) / CAST(tt - k AS DOUBLE), 6)
        |    AS mean_after
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY q DESC, k) AS rn
        |      FROM scored)
        |WHERE rn = 1""".stripMargin)),

    // Theil–Sen robust trend per event type — the median of all pairwise
    // slopes over the daily count series: one wild day (a bot burst, an
    // outage) moves an OLS slope (a20's shape) arbitrarily but shifts a
    // pairwise-slope median by one rank. Determinism: every slope is the
    // EXACT truncated integer (Δcount·10⁶) div Δdays (Spark `div` and
    // DuckDB `//` both truncate toward zero — verified for negatives),
    // and the median is the LOW median — the ((m+1) div 2)-th order
    // statistic — picked by row_number, so no two-value averaging and no
    // float comparisons anywhere. Scale shape: the stream collapses to
    // the (type, day) frame ONCE; the pairwise self-join is bounded by
    // |days|² per type (a year = ~66k pairs — trivial), never by events;
    // at very long horizons the documented rewrite is Sen's median on a
    // day-bucketed series, same shape one level up.
    Q("ev_theil_sen",
      (s, d) => {
        // no checkpoint: the two self-join sides are the IDENTICAL
        // aggregate subtree, so ReuseExchange materializes the daily
        // frame once (plan-asserted below via zero construction jobs);
        // a bare eager=false here EXECUTED the aggregate at construction
        // (measured 2 jobs per plan-only build) — the wrong trade
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val a = daily.select(col("event_type"), col("day").as("di"),
          col("x").as("xi"))
        val b = daily.select(col("event_type"), col("day").as("dj"),
          col("x").as("xj"))
        val slopes = a.join(b, Seq("event_type"))
          .filter(col("di") < col("dj"))
          .select(col("event_type"),
            expr("(xj - xi) * 1000000 div datediff(dj, di)").as("s6"))
        val m = Window.partitionBy("event_type")
        val ord = Window.partitionBy("event_type").orderBy("s6")
        slopes
          .withColumn("n_pairs", count(lit(1)).over(m))
          .withColumn("rn", row_number().over(ord))
          .filter(expr("rn = (n_pairs + 1) div 2"))
          .select(col("event_type"), col("n_pairs"),
            round(col("s6").cast("double") / 1000000.0, 6)
              .as("slope_per_day"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |slopes AS (
        |  SELECT a.event_type,
        |    (b.x - a.x) * 1000000 // datediff('day', a.day, b.day) AS s6
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |ranked AS (
        |  SELECT event_type, s6,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs,
        |    row_number() OVER (PARTITION BY event_type ORDER BY s6) AS rn
        |  FROM slopes)
        |SELECT event_type, n_pairs,
        |  round(CAST(s6 AS DOUBLE) / 1000000.0, 6) AS slope_per_day
        |FROM ranked WHERE rn = (n_pairs + 1) // 2""".stripMargin)),

    // Time-lagged feature engineering per (event_type, day) — the
    // feature-store companion of ev_smoothing/ev_cusum and the standard
    // input block for any demand-forecast model: yesterday's count, the
    // same weekday last week, and the trailing-7-day mean. Built on the
    // SAME zero-filled day scaffold as ev_cusum (a missing day is a real
    // zero, and lag columns must see it), so lag() is correct by
    // construction — no gap-skipping bugs. The trailing mean is an exact
    // integer sum over a 7-row frame with one IEEE division. Windows run
    // on the bounded scaffold only.
    Q("ev_lag_features",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val range = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val filled = daily.select("event_type").distinct()
          .crossJoin(broadcast(range))
          .select(col("event_type"),
            explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("cnt"), lit(0L)).as("n"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val w7 = w.rowsBetween(-6, Window.currentRow)
        filled
          .withColumn("lag_1", lag(col("n"), 1).over(w))
          .withColumn("lag_7", lag(col("n"), 7).over(w))
          .withColumn("s7", sum(col("n")).over(w7))
          .withColumn("c7", count(lit(1)).over(w7))
          .select(col("event_type"), col("day"), col("n"),
            col("lag_1"), col("lag_7"),
            (col("s7").cast("double") / col("c7").cast("double"))
              .as("trailing_mean_7"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |filled AS (
        |  SELECT s.event_type, s.day, COALESCE(d.cnt, 0) AS n
        |  FROM (SELECT event_type,
        |          unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |        FROM (SELECT DISTINCT event_type FROM daily) CROSS JOIN rng) s
        |  LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day)
        |SELECT event_type, day, n,
        |  lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS lag_1,
        |  lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS lag_7,
        |  CAST(CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_mean_7
        |FROM filled""".stripMargin)),

    // Late-straggler sessionization through the STATEFUL streaming operator
    // (graft.streaming.StatefulSessions), judged against the same
    // micros-exact gap-merge SQL as ev_sessionize: micro-batch 1 delivers
    // each user's LAST session (it stays open — the huge watermark lag
    // never fires its timeout), micro-batch 2 delivers EVERY earlier event
    // as a watermark-late straggler. The operator must gap-merge straggler
    // runs exactly like the batch sessionizer and emit sessions 1..n-1 per
    // user; the oracle computes gap sessions and drops each user's last.
    // The MemoryStream harness is test-shaped by necessity (stragglers
    // exist only ACROSS micro-batches); the operator under judgment is the
    // distributed flatMapGroupsWithState fold itself.
    Q("ev_late_sessions",
      (s, d) => lateSessions(s, d),
      Some("""WITH g AS (SELECT user_id, event_id, ts,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |lab AS (SELECT user_id, ts,
        |  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g),
        |sess AS (SELECT user_id, session_id,
        |    MIN(CAST(ts AS TIMESTAMP)) AS session_start,
        |    MAX(CAST(ts AS TIMESTAMP)) AS session_end,
        |    COUNT(*) AS n_events
        |  FROM lab GROUP BY 1, 2)
        |SELECT user_id, session_start, session_end, n_events
        |FROM sess
        |WHERE session_id < (SELECT MAX(s2.session_id) FROM sess s2
        |                    WHERE s2.user_id = sess.user_id)""".stripMargin)),

    // Weekly retention: users active in week w who are also active in
    // week w+1 — the cohort shape, as a distinct-activity self-join on
    // (user, week) pairs (both sides are the small distinct projection).
    Q("ev_retention",
      (s, d) => {
        val weekly = t(s, d, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("week_start"))
          .distinct()
        weekly.as("a")
          .join(weekly.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("b.week_start") === date_add(col("a.week_start"), 7),
            "left")
          .groupBy(col("a.week_start").as("week_start"))
          .agg(
            count(lit(1)).as("n_active"),
            count(col("b.user_id")).as("n_retained"))
      },
      Some("""WITH weekly AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week_start
        |  FROM events)
        |SELECT a.week_start, COUNT(*) AS n_active, COUNT(b.user_id) AS n_retained
        |FROM weekly a
        |LEFT JOIN weekly b ON a.user_id = b.user_id
        |  AND b.week_start = a.week_start + 7
        |GROUP BY a.week_start""".stripMargin)),

    // Cohort LTV curves (the growth-accounting staple next to ev_retention's
    // activity grid): users cohorted by first-activity week, purchase value
    // accumulated per (cohort, week-offset) — "how much has the March
    // cohort spent by week 3". Money stays EXACT: each double value is
    // 6dp-scaled to a long ONCE (engine-identical rounding), summed as
    // longs, cumulated as longs; readable doubles derive at the end.
    // Scale shape: one user-keyed min-week aggregate broadcast-joined
    // back? No — joined user-keyed (users are fact-sized), then one
    // (cohort, offset)-keyed map-combined sum; the cumulative window runs
    // on the cohorts×offsets grid (calendar-bounded, not data-bounded).
    Q("ev_cohort_ltv",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("week"),
            col("event_type"), col("value"))
        val cohorts = ev.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"))
        val grid = ev.filter(col("event_type") === "purchase")
          .join(cohorts, "user_id")
          .select(col("cohort_week"),
            (datediff(col("week"), col("cohort_week")) / 7).cast("int")
              .as("week_offset"),
            round(col("value") * 1000000, 0).cast("long").as("v"))
          .groupBy("cohort_week", "week_offset")
          .agg(sum(col("v")).as("rev_micro"), count(lit(1)).as("n_purchases"))
        val wc = Window.partitionBy("cohort_week").orderBy("week_offset")
        grid
          .withColumn("cum_micro", sum(col("rev_micro")).over(
            wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("cohort_week"), col("week_offset"), col("n_purchases"),
            round(col("rev_micro").cast("double") / 1000000.0, 6).as("revenue"),
            round(col("cum_micro").cast("double") / 1000000.0, 6).as("ltv"))
      },
      Some("""WITH ev AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
        |    event_type, value
        |  FROM events),
        |cohorts AS (SELECT user_id, MIN(week) AS cohort_week
        |            FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT cohort_week,
        |    CAST((week - cohort_week) // 7 AS INTEGER) AS week_offset,
        |    CAST(SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
        |      AS rev_micro,
        |    COUNT(*) AS n_purchases
        |  FROM ev JOIN cohorts USING (user_id)
        |  WHERE event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_purchases,
        |  round(CAST(rev_micro AS DOUBLE) / 1000000.0, 6) AS revenue,
        |  round(CAST(SUM(rev_micro) OVER (PARTITION BY cohort_week
        |    ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    / 1000000.0, 6) AS ltv
        |FROM grid""".stripMargin)),

    // Peak concurrent sessions per day (capacity planning's first
    // question). Sweep-line over session start/end deltas, planned as the
    // DISTRIBUTED two-phase prefix sum: per-day running sums are a
    // day-KEYED window, the cross-day carry is a prefix sum over the tiny
    // calendar-bounded day frame (the sk_skyline banded-prefix argument),
    // and peak(day) = carry + max(local run). The oracle states the naive
    // semantics — ONE global running sum — which equals carry + local by
    // the prefix-sum identity; ties at equal ts order starts (+1) before
    // ends (−1), so touching sessions count as concurrent in both engines.
    Q("ev_concurrency",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val spans = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        val deltas = spans
          .select(col("start_ts").as("ts"), lit(1L).as("delta"),
            col("user_id"), col("session_id"))
          .unionByName(spans.select(col("end_ts").as("ts"),
            lit(-1L).as("delta"), col("user_id"), col("session_id")))
          .withColumn("day", to_date(col("ts")))
        val wd = Window.partitionBy("day")
          .orderBy(col("ts"), col("delta").desc, col("user_id"),
            col("session_id"))
        val local = deltas.withColumn("run", sum(col("delta")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val dayAgg = local.groupBy("day")
          .agg(max(col("run")).as("local_peak"), sum(col("delta")).as("net"))
        val wdays = Window.orderBy("day")
        dayAgg
          .withColumn("cum", sum(col("net")).over(
            wdays.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("carry", coalesce(lag(col("cum"), 1).over(wdays), lit(0L)))
          .select(col("day"), (col("carry") + col("local_peak")).as("peak"))
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |spans AS (SELECT user_id, session_id,
        |            MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |          FROM lab GROUP BY 1, 2),
        |deltas AS (
        |  SELECT start_ts AS ts, 1 AS delta, user_id, session_id FROM spans
        |  UNION ALL
        |  SELECT end_ts AS ts, -1 AS delta, user_id, session_id FROM spans),
        |swept AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    SUM(delta) OVER (ORDER BY ts, delta DESC, user_id, session_id
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM deltas)
        |SELECT day, CAST(MAX(run) AS BIGINT) AS peak
        |FROM swept GROUP BY day""".stripMargin)),

    // Per-user feature-store export (the model-ready table a churn/LTV
    // trainer reads): recency, frequency (events + sessions), monetary,
    // and the longest activity streak — one row per user, every number
    // exact (session count = sum of sessionize breaks, money in scaled
    // longs, streak via the gaps-and-islands key). Scale shape: the
    // sessionize window and the per-user rollup share ONE user-keyed
    // exchange; the streak leg runs on the collapsed (user, day) pair
    // table; the corpus max-day is a one-row broadcast.
    Q("ev_user_features",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val perUser = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("brk")).as("n_sessions"),
            max(to_date(col("ts"))).as("last_day"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 1000000, 0).cast("long")).otherwise(0L))
              .as("monetary_micro"))
        val ws = Window.partitionBy("user_id").orderBy("day")
        val streaks = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .withColumn("grp", date_sub(col("day"), row_number().over(ws)))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(max(col("len")).as("longest_streak"))
        val maxDay = t(s, d, "events").agg(max(to_date(col("ts"))).as("max_day"))
        perUser.join(streaks, "user_id")
          .crossJoin(broadcast(maxDay))
          .select(col("user_id"), col("n_events"), col("n_sessions"),
            col("longest_streak"),
            datediff(col("max_day"), col("last_day")).cast("int")
              .as("recency_days"),
            round(col("monetary_micro").cast("double") / 1000000.0, 6)
              .as("monetary"))
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_type, value, ts,
        |    CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM (SELECT user_id, event_id, event_type, value, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |pu AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    CAST(SUM(brk) AS BIGINT) AS n_sessions,
        |    MAX(CAST(ts AS DATE)) AS last_day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000000, 0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS monetary_micro
        |  FROM lab GROUP BY user_id),
        |du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INTEGER) AS grp
        |  FROM du),
        |runs AS (SELECT user_id, grp, COUNT(*) AS len
        |         FROM isl GROUP BY user_id, grp),
        |streaks AS (SELECT user_id, MAX(len) AS longest_streak
        |            FROM runs GROUP BY user_id),
        |md AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events)
        |SELECT user_id, n_events, n_sessions, longest_streak,
        |  CAST(max_day - last_day AS INTEGER) AS recency_days,
        |  round(CAST(monetary_micro AS DOUBLE) / 1000000.0, 6) AS monetary
        |FROM pu JOIN streaks USING (user_id) CROSS JOIN md""".stripMargin)),

    // Inter-event cadence audit (the bot/scripted-traffic screen a
    // training-data pipeline runs before trusting behavioral data): a
    // human's event gaps are bursty (squared coefficient of variation
    // cv² ≳ 1, the exponential-arrival baseline); a cron-driven client
    // fires metronomically (cv² → 0). Per-user gap second counts stay
    // EXACT longs (n, Σg, Σg²); cv² = (n·Σg² − (Σg)²)/(Σg)² is computed
    // over doubles CAST from those exact integers in one mirrored
    // expression chain, rounded 6dp. Scale shape: one user-keyed window
    // (the sessionize exchange), one map-combined per-user aggregate —
    // the flag never shuffles row-sized data twice.
    Q("ev_bot_cadence",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val g = t(s, d, "events")
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .filter(col("gap_us").isNotNull)
          .select(col("user_id"), expr("gap_us div 1000000").as("g"))
        g.groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sg"),
            sum(col("g") * col("g")).as("sg2"))
          .filter(col("n_gaps") >= 30 && col("sg") > 0)
          .select(col("user_id"), col("n_gaps"),
            round((col("n_gaps").cast("double") * col("sg2").cast("double")
              - col("sg").cast("double") * col("sg").cast("double"))
              / (col("sg").cast("double") * col("sg").cast("double")), 6)
              .as("cv2"))
          .withColumn("is_regular", col("cv2") < 0.3)
      },
      Some("""WITH gaps AS (
        |  SELECT user_id,
        |    (epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
        |      AS g
        |  FROM events),
        |st AS (
        |  SELECT user_id, COUNT(*) AS n_gaps,
        |    CAST(SUM(g) AS BIGINT) AS sg, CAST(SUM(g * g) AS BIGINT) AS sg2
        |  FROM gaps WHERE g IS NOT NULL
        |  GROUP BY user_id)
        |SELECT user_id, n_gaps,
        |  round((CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE)
        |    - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |    / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)), 6) AS cv2,
        |  round((CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE)
        |    - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |    / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)), 6) < 0.3 AS is_regular
        |FROM st WHERE n_gaps >= 30 AND sg > 0""".stripMargin)),

    // Full cohort retention triangle (the matrix behind every retention
    // chart — ev_retention only reports the week+1 diagonal): users
    // cohorted by first-active week, per (cohort, week-offset) distinct
    // active users and the retention fraction against the cohort's size.
    // All counts exact; the rate is one 6dp-rounded division. Scale shape:
    // the stream collapses to the distinct (user, week) pair table ONCE,
    // the user-keyed cohort aggregate joins back user-keyed, and the
    // triangle rollup runs on the calendar-bounded (cohort, offset) grid.
    Q("ev_retention_matrix",
      (s, d) => {
        val weekly = t(s, d, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("week"))
          .distinct()
        val cohorts = weekly.groupBy("user_id")
          .agg(min(col("week")).as("cohort_week"))
        val sizes = cohorts.groupBy("cohort_week")
          .agg(count(lit(1)).as("cohort_size"))
        weekly.join(cohorts, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("week"), col("cohort_week")) / 7).cast("int")
              .as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(broadcast(sizes), "cohort_week")
          .select(col("cohort_week"), col("week_offset"), col("n_active"),
            col("cohort_size"),
            round(col("n_active").cast("double")
              / col("cohort_size").cast("double"), 6).as("retention"))
      },
      Some("""WITH weekly AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
        |  FROM events),
        |cohorts AS (SELECT user_id, MIN(week) AS cohort_week
        |            FROM weekly GROUP BY user_id),
        |sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size
        |          FROM cohorts GROUP BY cohort_week),
        |grid AS (
        |  SELECT cohort_week,
        |    CAST((week - cohort_week) // 7 AS INTEGER) AS week_offset,
        |    COUNT(DISTINCT user_id) AS n_active
        |  FROM weekly JOIN cohorts USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_active, cohort_size,
        |  round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)
        |    AS retention
        |FROM grid JOIN sizes USING (cohort_week)""".stripMargin)),

    // Per-type z-score outlier detection, two-phase: the per-type moments
    // come from a groupBy aggregate (map-side partial combine — each task
    // contributes one (sum, count, m2) triple per type, so 100 TB of events
    // never concentrate in one task) and broadcast-join back onto the
    // events. A window over `event_type` would be wrong at scale: window
    // aggregates do NOT partial-aggregate, so a handful of event types
    // would funnel the whole corpus into a handful of tasks. z is rounded
    // 4dp on BOTH sides before the threshold so sub-ulp accumulation
    // differences cannot flip inclusion.
    Q("ev_anomaly",
      (s, d) => {
        val events = t(s, d, "events")
        val moments = events.groupBy("event_type").agg(
          avg(col("value")).as("mu"),
          stddev_samp(col("value")).as("sigma"))
        events.join(broadcast(moments), "event_type")
          .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 4))
          .filter(abs(col("z")) > 3.0)
          .select(col("event_id"), col("event_type"), col("z"))
      },
      Some("""SELECT event_id, event_type, z FROM (
        |  SELECT event_id, event_type,
        |    round((value - AVG(value) OVER (PARTITION BY event_type)) /
        |          STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS z
        |  FROM events) t
        |WHERE abs(z) > 3.0""".stripMargin)),

    // Streaming window shapes, batch-mode for the oracle; the same transform
    // functions run under readStream+watermark in graft.streaming.
    Q("st_tumbling_window",
      (s, d) => EventOps.tumbling(t(s, d, "events"), "1 hour"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2""".stripMargin),
      headline = true),

    // Distinct users per tumbling window — the streaming-analytics card
    // every dashboard needs; exact countDistinct keyed on the window (the
    // mergeable-sketch variant is a8's HLL over the same shape).
    Q("st_window_users",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("window.start").as("window_start"), col("n_users")),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin)),

    // Per-session roll-up over the gap-sessionizer (ev_sessionize's labels
    // aggregated): session length in events and exact-micros duration —
    // the feature table a session-based model trains on. Same one
    // user-keyed exchange as the labeling pass; the session aggregate
    // clusters on (user_id, session_id), a refinement of the window
    // partitioning, so no second corpus shuffle.
    Q("ev_session_stats",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
              .as("duration_us"))
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events))
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MAX(epoch_us(CAST(ts AS TIMESTAMP))) - MIN(epoch_us(CAST(ts AS TIMESTAMP)))
        |    AS duration_us
        |FROM lab GROUP BY 1, 2""".stripMargin)),

    Q("st_sliding_window",
      (s, d) => EventOps.sliding(t(s, d, "events"), "1 hour", "30 minutes"),
      Some("""WITH b AS (
                SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS bucket, event_type FROM events)
              SELECT window_start, event_type, COUNT(*) AS n_events FROM (
                SELECT bucket AS window_start, event_type FROM b
                UNION ALL
                SELECT bucket - INTERVAL '30 minutes' AS window_start, event_type FROM b)
              GROUP BY 1, 2""".stripMargin)),

    Q("st_session_window",
      (s, d) => EventOps.sessionize(t(s, d, "events"), "6 hours"),
      Some("""WITH flagged AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                       CASE WHEN CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '6 hours'
                            OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events),
              sess AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM flagged)
              SELECT user_id, MIN(ts) AS session_start,
                     MAX(ts) + INTERVAL '6 hours' AS session_end,
                     COUNT(*) AS n_events
              FROM sess GROUP BY user_id, sid""".stripMargin)),

    // RFM segmentation (Hughes 1994's recency/frequency/monetary quintile
    // coding — the classic behavioral-value grid CRM teams cut campaigns
    // by). Per user: recency = days from last event to the fixed anchor
    // 2024-02-01 (a LITERAL, so the score is reproducible across runs and
    // scale factors — never "now()"), frequency = event count, monetary =
    // exact micro-scaled purchase revenue. Each dimension is coded 1–5 by
    // ntile(5) under a TOTAL order (metric, then user_id — best value gets
    // quintile 1), so both engines tile identically; segment = R·100 +
    // F·10 + M. Exactness: monetary sums pre-scaled longs (the
    // ev_cohort_ltv contract); the only doubles out are exact-long /1e6
    // divisions. Scale shape: events pay ONE user-keyed map-combined
    // aggregate; the three global-order ntile windows run on the
    // collapsed user frame only (the dq_auc collapsed-frame argument) —
    // at production user counts the drop-in is
    // [[graft.operators.Ranks.globalNtile]] (range-partition + broadcast
    // offsets), spec'd BIT-EQUAL to these windows on this exact metric
    // frame in RanksSpec — the total order (ties broken by user_id)
    // transfers unchanged.
    Q("ev_rfm",
      (s, d) => {
        val anchor = to_date(lit("2024-02-01"))
        val byUser = t(s, d, "events")
          .groupBy("user_id")
          .agg(
            datediff(anchor, to_date(max(col("ts")))).cast("long").as("r_days"),
            count(lit(1)).as("f"),
            sum(round(col("value") * 1000000, 0).cast("long")).as("m_micro"))
        val rq = Window.orderBy(col("r_days"), col("user_id"))
        val fq = Window.orderBy(col("f").desc, col("user_id"))
        val mq = Window.orderBy(col("m_micro").desc, col("user_id"))
        byUser
          .withColumn("r_q", ntile(5).over(rq).cast("long"))
          .withColumn("f_q", ntile(5).over(fq).cast("long"))
          .withColumn("m_q", ntile(5).over(mq).cast("long"))
          .select(col("user_id"), col("r_days"), col("f"),
            round(col("m_micro").cast("double") / 1000000.0, 6).as("monetary"),
            col("r_q"), col("f_q"), col("m_q"),
            (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("segment"))
      },
      Some("""WITH u AS (
        |  SELECT user_id,
        |    CAST(DATE '2024-02-01' - CAST(MAX(ts) AS DATE) AS BIGINT) AS r_days,
        |    COUNT(*) AS f,
        |    CAST(SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
        |      AS m_micro
        |  FROM events GROUP BY user_id),
        |q AS (
        |  SELECT user_id, r_days, f, m_micro,
        |    CAST(ntile(5) OVER (ORDER BY r_days, user_id) AS BIGINT) AS r_q,
        |    CAST(ntile(5) OVER (ORDER BY f DESC, user_id) AS BIGINT) AS f_q,
        |    CAST(ntile(5) OVER (ORDER BY m_micro DESC, user_id) AS BIGINT) AS m_q
        |  FROM u)
        |SELECT user_id, r_days, f,
        |  round(CAST(m_micro AS DOUBLE) / 1000000.0, 6) AS monetary,
        |  r_q, f_q, m_q, r_q * 100 + f_q * 10 + m_q AS segment
        |FROM q""".stripMargin)),

    // Multi-MODEL conversion attribution (first/last/linear in one pass)
    // over a TIME-WINDOW scope — the complement of ev_attribution, whose
    // linear credit is session-scoped: every purchase shares credit over
    // the user's click/view touches strictly within the 7 days before it,
    // and all three standard models report per channel at once. Declared
    // rules in [[EventOps.attribution]]: same-instant touches excluded,
    // zero-touch conversions drop, (ts, event_id) tiebreak, linear
    // credit as exact round(n_ch·10⁶/n) longs summed per channel. The
    // oracle replays the band join + per-conversion window ranking and
    // the same micro-credit arithmetic.
    Q("ev_attribution_models",
      (s, d) => EventOps.attribution(t(s, d, "events"),
        convType = "purchase", touchTypes = Seq("click", "view"),
        lookbackMicros = 7L * 86400 * 1000000),
      Some("""WITH conv AS (
        |  SELECT event_id AS cid, user_id, epoch_us(ts) AS ct
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS channel, epoch_us(ts) AS tt,
        |    event_id AS tid
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT c.cid, t.channel, t.tt, t.tid
        |  FROM conv c JOIN touch t USING (user_id)
        |  WHERE t.tt < c.ct AND t.tt >= c.ct - 604800000000),
        |ranked AS (
        |  SELECT cid, channel,
        |    row_number() OVER (PARTITION BY cid ORDER BY tt, tid) AS rn_a,
        |    row_number() OVER (PARTITION BY cid ORDER BY tt DESC, tid DESC)
        |      AS rn_d,
        |    COUNT(*) OVER (PARTITION BY cid) AS n,
        |    SUM(CASE WHEN channel = 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY cid) AS n_click
        |  FROM j),
        |per AS (
        |  SELECT cid,
        |    MAX(CASE WHEN rn_a = 1 THEN channel END) AS first_ch,
        |    MAX(CASE WHEN rn_d = 1 THEN channel END) AS last_ch,
        |    MAX(n) AS n, MAX(n_click) AS n_click
        |  FROM ranked GROUP BY cid),
        |lin AS (
        |  SELECT channel, CAST(SUM(w) AS BIGINT) AS linear_micro FROM (
        |    SELECT 'click' AS channel,
        |      CAST(round(n_click * 1000000.0 / n) AS BIGINT) AS w FROM per
        |    UNION ALL
        |    SELECT 'view',
        |      CAST(round((n - n_click) * 1000000.0 / n) AS BIGINT) FROM per)
        |  GROUP BY 1),
        |firsts AS (SELECT first_ch AS channel, CAST(COUNT(*) AS BIGINT)
        |  AS first_touch FROM per GROUP BY 1),
        |lasts AS (SELECT last_ch AS channel, CAST(COUNT(*) AS BIGINT)
        |  AS last_touch FROM per GROUP BY 1)
        |SELECT lin.channel,
        |  COALESCE(first_touch, 0) AS first_touch,
        |  COALESCE(last_touch, 0) AS last_touch,
        |  linear_micro
        |FROM lin
        |LEFT JOIN firsts ON lin.channel = firsts.channel
        |LEFT JOIN lasts ON lin.channel = lasts.channel""".stripMargin)),

    // The SAME RFM segmentation through the two-phase production ntile
    // ([[graft.operators.Ranks.globalNtile]]) instead of three
    // single-partition windows — judged against the IDENTICAL oracle, so
    // the at-scale path is hash-verified end-to-end, not only spec-equal:
    // any divergence between the closed-form bucket arithmetic and SQL
    // ntile would fail this entry even if the window entry stayed green.
    Q("ev_rfm_2p",
      (s, d) => {
        val anchor = to_date(lit("2024-02-01"))
        val byUser = t(s, d, "events")
          .groupBy("user_id")
          .agg(
            datediff(anchor, to_date(max(col("ts")))).cast("long").as("r_days"),
            count(lit(1)).as("f"),
            sum(round(col("value") * 1000000, 0).cast("long")).as("m_micro"))
        val R = graft.operators.Ranks
        val tiled = R.globalNtile(
          R.globalNtile(
            R.globalNtile(byUser,
              Seq(col("r_days"), col("user_id")), 5, "r_q"),
            Seq(col("f").desc, col("user_id")), 5, "f_q"),
          Seq(col("m_micro").desc, col("user_id")), 5, "m_q")
        tiled.select(col("user_id"), col("r_days"), col("f"),
          round(col("m_micro").cast("double") / 1000000.0, 6).as("monetary"),
          col("r_q"), col("f_q"), col("m_q"),
          (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("segment"))
      },
      Some("""WITH u AS (
        |  SELECT user_id,
        |    CAST(DATE '2024-02-01' - CAST(MAX(ts) AS DATE) AS BIGINT) AS r_days,
        |    COUNT(*) AS f,
        |    CAST(SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
        |      AS m_micro
        |  FROM events GROUP BY user_id),
        |q AS (
        |  SELECT user_id, r_days, f, m_micro,
        |    CAST(ntile(5) OVER (ORDER BY r_days, user_id) AS BIGINT) AS r_q,
        |    CAST(ntile(5) OVER (ORDER BY f DESC, user_id) AS BIGINT) AS f_q,
        |    CAST(ntile(5) OVER (ORDER BY m_micro DESC, user_id) AS BIGINT) AS m_q
        |  FROM u)
        |SELECT user_id, r_days, f,
        |  round(CAST(m_micro AS DOUBLE) / 1000000.0, 6) AS monetary,
        |  r_q, f_q, m_q, r_q * 100 + f_q * 10 + m_q AS segment
        |FROM q""".stripMargin)),

    // Revenue concentration by user quintile (the Pareto "does 20% of the
    // base carry the business" readout): users bucketed into value
    // quintiles through the TWO-PHASE global ntile
    // ([[graft.operators.Ranks.globalNtile]] — range repartition +
    // broadcast offsets, no single-partition window; the ev_rfm_2p
    // machinery reused on a new judged surface), each quintile reporting
    // its exact user count, exact scaled-long value mass, and 6dp share
    // of total. The oracle uses SQL ntile over the identical total order,
    // which globalNtile reproduces bucket-for-bucket by its closed-form
    // layout contract. Scale shape: one user-keyed map-combined pass,
    // one range exchange, a 5-row aggregate.
    Q("ev_pareto_share",
      (s, d) => {
        val byUser = t(s, d, "events")
          .groupBy("user_id")
          .agg(sum(round(col("value") * 1000000, 0).cast("long"))
            .as("m_micro"))
        val tiled = graft.operators.Ranks.globalNtile(byUser,
          Seq(col("m_micro").desc, col("user_id")), 5, "quintile")
        val q = tiled.groupBy("quintile")
          .agg(count(lit(1)).as("n_users"), sum(col("m_micro")).as("mq"))
        val tot = q.agg(sum(col("mq")).as("mt"))
        q.crossJoin(broadcast(tot))
          .select(col("quintile"), col("n_users"),
            round(col("mq").cast("double") / 1000000.0, 6).as("value"),
            round(col("mq").cast("double") / col("mt").cast("double"), 6)
              .as("value_share"))
      },
      Some("""WITH u AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
        |      AS m_micro
        |  FROM events GROUP BY user_id),
        |q AS (
        |  SELECT CAST(ntile(5) OVER (ORDER BY m_micro DESC, user_id)
        |    AS BIGINT) AS quintile, m_micro FROM u),
        |g AS (
        |  SELECT quintile, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(m_micro) AS BIGINT) AS mq
        |  FROM q GROUP BY 1),
        |tot AS (SELECT CAST(SUM(mq) AS BIGINT) AS mt FROM g)
        |SELECT quintile, n_users,
        |  round(CAST(mq AS DOUBLE) / 1000000.0, 6) AS value,
        |  round(CAST(mq AS DOUBLE) / CAST(mt AS DOUBLE), 6) AS value_share
        |FROM g CROSS JOIN tot""".stripMargin)),

    // Kaplan–Meier survival curve of user activity STREAKS (Kaplan &
    // Meier 1958) — the censoring-correct estimate naive streak-length
    // histograms get wrong: a streak still running on the corpus's final
    // observed day (the LITERAL anchor 2024-01-30) was not observed to
    // break, so it is CENSORED at its observed length, not counted as a
    // death. Subjects: maximal runs of consecutive active days per user
    // (the ev_streaks entity — day minus dense row_number groups runs
    // identically in both engines); lifetime = run length in days; death
    // = the run's last day precedes the anchor. S(t) = Π_{t'≤t}(1 − d/n)
    // is carried in log-domain as exact scaled longs: each length's
    // ln((n−d)/n) is one mirrored IEEE chain from exact longs,
    // 6dp-pre-rounded before the exact running sum (the dq_source_kl
    // discipline), so the cumulative log-survival is bit-identical and
    // the single exp at the end is one mirrored op under a 6dp round
    // (boundary-audited). n = at-risk via a current-row-to-unbounded-
    // FOLLOWING running sum — no separate total pass; d = n can only
    // happen at the global maximum lifetime (anything alive longer would
    // still be at risk), where S hits exactly 0 and the log column goes
    // null in both engines. Scale shape: events collapse through one
    // (user, day)-keyed distinct and one user-keyed window into runs;
    // the KM windows run on the collapsed per-LENGTH frame, bounded by
    // the observation window's day count, not by users.
    Q("ev_survival_km",
      (s, d) => {
        val days = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val rn = row_number().over(
          Window.partitionBy("user_id").orderBy("day"))
        val u = days.withColumn("grp", date_sub(col("day"), rn))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("life"), max(col("day")).as("last_day"))
          .select(col("life"),
            (col("last_day") < to_date(lit("2024-01-30"))).as("churned"))
        val g = u.groupBy("life").agg(count(lit(1)).as("leave_n"),
          sum(when(col("churned"), 1L).otherwise(0L)).as("d"))
        val atRisk = sum(col("leave_n")).over(
          Window.orderBy("life")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        val r = g.withColumn("n_risk", atRisk)
        val term = when(col("d") < col("n_risk"),
          round(round(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk").cast("double")), 6) * 1000000, 0).cast("long"))
        val cum = sum(term).over(
          Window.orderBy("life")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        r.withColumn("log_s", cum)
          .filter(col("d") > 0)
          .select(col("life"), col("n_risk"), col("d"),
            when(col("d") < col("n_risk"), col("log_s"))
              .otherwise(lit(null).cast("long")).as("log_surv_scaled"),
            when(col("d") < col("n_risk"),
              round(exp(col("log_s").cast("double") / 1000000.0), 6))
              .otherwise(lit(0.0)).as("km"))
      },
      Some("""WITH dd AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |runs AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |          AS INTEGER) AS grp
        |  FROM dd),
        |lf AS (SELECT COUNT(*) AS life,
        |         MAX(day) < DATE '2024-01-30' AS churned
        |       FROM runs GROUP BY user_id, grp),
        |g AS (SELECT life, COUNT(*) AS leave_n,
        |        CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
        |      FROM lf GROUP BY 1),
        |r AS (SELECT life, leave_n, d,
        |        CAST(SUM(leave_n) OVER (ORDER BY life
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |          AS n_risk
        |      FROM g),
        |e AS (SELECT life, n_risk, d,
        |        CAST(SUM(CASE WHEN d < n_risk THEN
        |          CAST(round(round(ln(CAST(n_risk - d AS DOUBLE)
        |            / CAST(n_risk AS DOUBLE)), 6) * 1000000, 0) AS BIGINT)
        |          END) OVER (ORDER BY life ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS log_s
        |      FROM r)
        |SELECT life, n_risk, d,
        |  CASE WHEN d < n_risk THEN log_s END AS log_surv_scaled,
        |  CASE WHEN d < n_risk THEN round(exp(CAST(log_s AS DOUBLE) / 1000000.0), 6)
        |       ELSE 0.0 END AS km
        |FROM e WHERE d > 0""".stripMargin)),

    // Robust outlier screen per event type via median absolute deviation
    // (Hampel's identifier) — the anomaly gate that, unlike ev_anomaly's
    // mean/stddev z-score, a single wild value cannot drag: both the
    // center (median) and the spread (MAD) have a 50% breakdown point.
    // Flag = |x − median| > 5·MAD (a LITERAL multiplier; ≈ 3.37σ under
    // normality). Exactness needs NO rounding: both engines compute the
    // exact interpolating median over the same parquet doubles (the
    // a17_median parity), the deviation chain |x − med| and the 5·MAD
    // product are mirrored IEEE ops on identical inputs, and outputs are
    // counts plus raw medians. Scale shape: two type-keyed aggregates
    // with a broadcast re-attach between them (type cardinality is
    // bounded); production swaps exact medians for mergeable quantile
    // sketches (a19's shape) without changing the flag rule.
    Q("ev_mad_outliers",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"), col("value"))
        val med = ev.groupBy("event_type").agg(median(col("value")).as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .select(col("event_type"), col("value"), col("med"),
            abs(col("value") - col("med")).as("adev"))
        val mad = dev.groupBy("event_type").agg(median(col("adev")).as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            min(col("med")).as("med"), min(col("mad")).as("mad"),
            sum(when(col("adev") > lit(5.0) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"))
      },
      Some("""WITH med AS (
        |  SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1)
        |SELECT event_type, COUNT(*) AS n,
        |  MIN(d.med) AS med, MIN(m.mad) AS mad,
        |  CAST(SUM(CASE WHEN d.adev > 5.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY event_type""".stripMargin)),

    // HITS hubs and authorities (Kleinberg 1999) on the bipartite
    // user→item view graph — the mutual-reinforcement ranking PageRank's
    // single score can't express: a good HUB (curator-like user) views
    // many good items, a good AUTHORITY (canonical item) is viewed by
    // good hubs. Five alternating pull/normalize rounds in EXACT integer
    // arithmetic (the ev_pagerank discipline): scores are 1e6-scaled
    // longs, each half-step L1-normalizes by one trunc division against a
    // one-row broadcast total — transcendental-free and bit-identical to
    // the oracle's unrolled CTEs. Long headroom: raw = Σ edge·1e6 holds
    // to ~9e12 edges; decimal(38) is the drop-in beyond. Scale shape: per
    // round two keyed (non-broadcast) edge joins + two map-combined
    // aggregates on node-bounded frames, lineage cut per round; the
    // event stream is scanned ONCE for the edge frame.
    Q("ev_hits",
      (s, d) => {
        val e = t(s, d, "events").filter(col("event_type") === "view")
          .select(col("user_id").as("hub"),
            get_json_object(col("props"), "$.k").cast("long").as("auth"))
          .distinct()
          .localCheckpoint(eager = false)
        var h = e.select(col("hub")).distinct()
          .select(col("hub"), lit(1000000L).as("s"))
          .localCheckpoint(eager = false)
        var a: DataFrame = null
        for (_ <- 1 to 5) {
          val ar = e.join(h, "hub").groupBy("auth").agg(sum(col("s")).as("raw"))
          val asum = ar.agg(sum(col("raw")).as("t"))
          a = ar.crossJoin(broadcast(asum))
            .select(col("auth"), expr("(raw * 1000000) div t").as("s"))
            .localCheckpoint(eager = false)
          val hr = e.join(a, "auth").groupBy("hub").agg(sum(col("s")).as("raw"))
          val hsum = hr.agg(sum(col("raw")).as("t"))
          h = hr.crossJoin(broadcast(hsum))
            .select(col("hub"), expr("(raw * 1000000) div t").as("s"))
            .localCheckpoint(eager = false)
        }
        val both = a.select(lit("auth").as("side"), col("auth").as("id"),
            col("s").as("score6"))
          .unionAll(h.select(lit("hub").as("side"), col("hub").as("id"),
            col("s").as("score6")))
        val w = Window.partitionBy("side")
          .orderBy(col("score6").desc, col("id"))
        both.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 10)
      },
      Some(HitsSql)),

    // Synchronous label propagation (Raghavan et al. 2007) on the item
    // co-visitation graph — community detection for the catalog: 4 fixed
    // rounds (the explicit iterative-loop contract shared with kcore /
    // pagerank / BPE), each node adopting its neighbors' most frequent
    // label with ties to the SMALLEST label — fully deterministic, no
    // random visit order (the published algorithm's nondeterminism is
    // exactly what a cross-engine contract cannot carry). Winner selection
    // is one max(struct(count, −label)) aggregate — no window. Scale
    // shape: per round one label-keyed edge join + two map-combined
    // aggregates on node-bounded frames, lineage cut per round; reported
    // as community sizes (the bounded rollup).
    Q("ev_label_prop",
      (s, d) => {
        val e = EventOps.covisitationEdges(
            t(s, d, "events").filter(col("event_type") === "view"),
            get_json_object(col("props"), "$.k").cast("long"), minUsers = 6L)
          .select("u", "v")
        val nbr = e.select(col("u").as("node"), col("v").as("nbr"))
          .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
          .localCheckpoint(eager = false)
        var lab = nbr.select(col("node")).distinct()
          .select(col("node"), col("node").as("lab"))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 4) {
          val cnt = nbr
            .join(lab.select(col("node").as("nbr"), col("lab").as("nlab")), "nbr")
            .groupBy("node", "nlab").agg(count(lit(1)).as("c"))
          lab = cnt.groupBy("node")
            .agg(max(struct(col("c"), (-col("nlab")).as("neg"))).as("w"))
            .select(col("node"), (-col("w.neg")).as("lab"))
            .localCheckpoint(eager = false)
        }
        lab.groupBy(col("lab").as("community")).agg(count(lit(1)).as("size"))
      },
      Some(LpaSql)),

    // Fano factor (index of dispersion) of daily event counts per type —
    // the burstiness-vs-Poisson screen at the TIME-SERIES level
    // (ev_bot_cadence screens per-user gaps; Fano screens the aggregate):
    // F = Var/Mean over the ZERO-FILLED day scaffold (gap days are data —
    // the ev_cusum/ev_lag_features scaffold discipline); F ≈ 1 is
    // Poisson, ≫1 bursty/incident-driven, ≪1 metronomic. Population
    // variance over exact integer moments collapses to
    // (n·Σc² − (Σc)²)/(n·Σc) — one IEEE division, no rounding contract.
    // Scale shape: the event stream collapses through one (type, day)
    // map-combined count; the scaffold is |types|×|days| bounded.
    Q("ev_fano",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
        val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = ev.select("event_type").distinct()
        types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
            sum(col("c") * col("c")).as("scc"))
          .select(col("event_type"), col("n_days"), col("sc"),
            ((col("n_days") * col("scc") - col("sc") * col("sc")).cast("double") /
              (col("n_days") * col("sc")).cast("double")).as("fano"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |m AS (SELECT event_type, COUNT(*) AS n_days,
        |        CAST(SUM(c) AS BIGINT) AS sc,
        |        CAST(SUM(c * c) AS BIGINT) AS scc
        |      FROM grid GROUP BY 1)
        |SELECT event_type, n_days, sc,
        |  CAST(n_days * scc - sc * sc AS DOUBLE)
        |    / CAST(n_days * sc AS DOUBLE) AS fano
        |FROM m""".stripMargin)),

    // Page–Hinkley drift statistic per event type (Page 1954, Hinkley
    // 1971) — the ONLINE-monitor member of the drift trio (ev_cusum
    // accumulates one-sided excesses over a fixed reference;
    // ev_changepoint fits the single best split offline; THIS is the
    // classic mean-shift detector a streaming monitor runs): over the
    // zero-filled daily grid, cumulative deviations from the series'
    // own mean M_t = Σ(c_i − μ), and PH_t = M_t − min_{s≤t} M_s — the
    // rise from the running minimum, which grows without bound exactly
    // when the mean has shifted UP (δ = 0 drift allowance, declared).
    // Reported per type: the max PH, its day (earliest tiebreak), and
    // the day count — the alarm threshold is the caller's policy knob.
    // Determinism: the ev_rescaled_range Z_t trick — M_t = exact-long
    // cumsum − t·μ, so every M_t is ONE independent double expression
    // (no double accumulation order); running min / max / argmax are
    // order-fixed windows over identical doubles. Scale: one
    // map-combined corpus pass to (type, day) counts; every window runs
    // on the |types|·|days| grid.
    Q("ev_page_hinkley",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
        val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = ev.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wCum = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("event_type")
        val ph = grid
          .withColumn("t", count(lit(1)).over(wCum))
          .withColumn("cum", sum(col("c")).over(wCum))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("sc", sum(col("c")).over(wAll))
          .withColumn("m",
            col("cum").cast("double") - col("t").cast("double") *
              (col("sc").cast("double") / col("n").cast("double")))
          .withColumn("ph", col("m") - min(col("m")).over(wCum))
        val wPick = Window.partitionBy("event_type")
          .orderBy(col("ph").desc, col("day").asc)
        ph.withColumn("rn", row_number().over(wPick))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("n").as("n_days"),
            round(col("ph"), 6).as("ph_max"), col("day").as("ph_day"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |z AS (
        |  SELECT event_type, day,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS t,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS sc
        |  FROM grid),
        |m AS (
        |  SELECT event_type, day, n,
        |    CAST(cum AS DOUBLE) - CAST(t AS DOUBLE)
        |      * (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS mval
        |  FROM z),
        |phs AS (
        |  SELECT event_type, day, n,
        |    mval - MIN(mval) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS ph
        |  FROM m),
        |pick AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY ph DESC, day ASC) AS rn
        |  FROM phs)
        |SELECT event_type, n AS n_days, round(ph, 6) AS ph_max,
        |  day AS ph_day
        |FROM pick WHERE rn = 1""".stripMargin)),

    // Rescaled-range (R/S) statistic per event type (Hurst 1951, the
    // Mandelbrot–Wallis estimator) — the long-memory readout the
    // variance-family signals (ev_fano, ev_acf) can't give: a series can
    // be over-dispersed yet memoryless, while persistent trends
    // (self-reinforcing engagement, slow drifts) push R/S above the
    // √T random-walk law and H = ln(R/S)/ln(T/2) above 0.5. Over the
    // SAME zero-filled daily grid as ev_fano: R = max−min of the
    // mean-adjusted cumulative deviations, S = population sd. Exact-chain
    // determinism trick: Z_t = cumsum(c) − t·μ with cumsum an EXACT LONG
    // window — each Z_t is one independent double expression (long −
    // long·double), so no double ACCUMULATION order exists to disagree
    // on; S² = scc/n − μ² from exact longs; the one ln pair takes
    // 6dp-pre-rounded R/S (the engine ln discipline). Scale: the corpus
    // collapses to (type, day) counts in one map-combined pass; every
    // window runs on the |types|·|days| grid.
    Q("ev_rescaled_range",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
        val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = ev.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wCum = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("event_type")
        val z = grid
          .withColumn("t", count(lit(1)).over(wCum))
          .withColumn("cum", sum(col("c")).over(wCum))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("sc", sum(col("c")).over(wAll))
          .withColumn("scc", sum(col("c") * col("c")).over(wAll))
          .withColumn("z",
            col("cum").cast("double") - col("t").cast("double") *
              (col("sc").cast("double") / col("n").cast("double")))
        z.groupBy("event_type")
          .agg(max(col("n")).as("n_days"), max(col("sc")).as("sc"),
            max(col("scc")).as("scc"),
            (max(col("z")) - min(col("z"))).as("r"))
          .select(col("event_type"), col("n_days"), col("sc"),
            col("r"),
            sqrt(col("scc").cast("double") / col("n_days").cast("double") -
              (col("sc").cast("double") / col("n_days").cast("double")) *
              (col("sc").cast("double") / col("n_days").cast("double")))
              .as("s"))
          .select(col("event_type"), col("n_days"), col("sc"),
            round(col("r"), 6).as("range_adj"),
            round(col("s"), 6).as("sd"),
            // nullif: a constant-count series has sd = 0 — Spark's x/0.0
            // yields NULL while DuckDB (ieee_floating_point_ops) yields
            // inf/nan; NULL on BOTH sides is the divergence-proof contract
            // (the dq_cochran_armitage discipline)
            round(col("r") / nullif(col("s"), lit(0.0)), 6).as("rs_ratio"),
            round(log(round(col("r") / nullif(col("s"), lit(0.0)), 6)) /
              log(col("n_days").cast("double") / 2.0), 6).as("hurst"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |z AS (
        |  SELECT event_type, day,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS t,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS sc,
        |    CAST(SUM(c * c) OVER (PARTITION BY event_type) AS BIGINT) AS scc
        |  FROM grid),
        |zz AS (
        |  SELECT event_type, n, sc, scc,
        |    CAST(cum AS DOUBLE) - CAST(t AS DOUBLE)
        |      * (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS zval
        |  FROM z),
        |agg AS (
        |  SELECT event_type, MAX(n) AS n_days, MAX(sc) AS sc,
        |    MAX(scc) AS scc, MAX(zval) - MIN(zval) AS r
        |  FROM zz GROUP BY 1),
        |fin AS (
        |  SELECT event_type, n_days, sc, r,
        |    sqrt(CAST(scc AS DOUBLE) / CAST(n_days AS DOUBLE)
        |      - (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))
        |        * (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))) AS s
        |  FROM agg)
        |SELECT event_type, n_days, sc,
        |  round(r, 6) AS range_adj, round(s, 6) AS sd,
        |  round(r / nullif(s, 0.0), 6) AS rs_ratio,
        |  round(ln(round(r / nullif(s, 0.0), 6))
        |    / ln(CAST(n_days AS DOUBLE) / 2.0), 6) AS hurst
        |FROM fin""".stripMargin)),

    // Mann–Kendall trend test (Mann 1945, Kendall 1975) per event type
    // over the SAME zero-filled daily grid as ev_fano/ev_rescaled_range —
    // the nonparametric companion to ev_theil_sen (that one estimates the
    // slope; this one tests whether a monotone trend EXISTS, robust to
    // the count spikes that break an OLS-on-time test). S = Σ_{i<j}
    // sign(c_j − c_i) is an exact long over the |days|²-per-type pair
    // frame (the grid is corpus-collapsed to |types|·|days| rows FIRST,
    // so the self-join is bounded regardless of corpus size); Var(S)
    // carries the tie correction Σ t(t−1)(2t+5) (zero-heavy daily counts
    // are tie-rich — skipping it inflates z badly), and z applies the
    // ±1 continuity correction with the sd divisor null-guarded. Scale:
    // one map-combined corpus pass, then window/join algebra on the
    // bounded grid only.
    Q("dq_mann_kendall",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        // the collapsed (type, day) counts are LazyCheckpoint-ed: span,
        // types, both pair legs and the tie aggregate all read the SAME
        // materialized |types|·|days| frame, so the corpus is scanned
        // exactly ONCE however many branches reference the grid (a bare
        // multi-reference re-plans the map-combined corpus pass per
        // branch — this query has five); n_days folds into the tie
        // aggregate as Σ tcnt
        val counts = graft.plans.LazyCheckpoint.of(
          ev.groupBy("event_type", "day").agg(count(lit(1)).as("c")))
        val span = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = counts.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val pairs = grid.as("a").join(grid.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .select(col("a.event_type").as("event_type"),
            when(col("b.c") > col("a.c"), 1L)
              .when(col("b.c") < col("a.c"), -1L).otherwise(0L).as("sg"))
        val sStat = pairs.groupBy("event_type").agg(sum(col("sg")).as("s_stat"))
        val ties = grid.groupBy("event_type", "c")
          .agg(count(lit(1)).as("tcnt"))
          .groupBy("event_type")
          .agg(sum(col("tcnt")).as("n_days"),
            sum(col("tcnt") * (col("tcnt") - 1) *
              (lit(2L) * col("tcnt") + 5)).as("tie_term"))
        val n = col("n_days")
        val varS = (n * (n - 1) * (lit(2L) * n + 5) - col("tie_term"))
          .cast("double") / 18.0
        val sd = nullif(sqrt(varS), lit(0.0))
        val sD = col("s_stat").cast("double")
        ties.join(sStat, "event_type")
          .select(col("event_type"), col("n_days"), col("s_stat"),
            round(varS, 6).as("var_s"),
            round(when(col("s_stat") > 0, (sD - 1.0) / sd)
              .when(col("s_stat") < 0, (sD + 1.0) / sd)
              .otherwise(0.0), 6).as("z_mk"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |p AS (
        |  SELECT a.event_type,
        |    CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sg
        |  FROM grid a JOIN grid b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |s AS (SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat
        |  FROM p GROUP BY 1),
        |tie AS (
        |  SELECT event_type,
        |    CAST(SUM(tcnt * (tcnt - 1) * (2 * tcnt + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS tcnt
        |    FROM grid GROUP BY 1, 2) GROUP BY 1),
        |nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM grid GROUP BY 1),
        |fin AS (
        |  SELECT n.event_type, n.n_days, s.s_stat,
        |    CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term
        |      AS DOUBLE) / 18.0 AS vs
        |  FROM nd n JOIN s ON s.event_type = n.event_type
        |  JOIN tie t ON t.event_type = n.event_type)
        |SELECT event_type, n_days, s_stat, round(vs, 6) AS var_s,
        |  round(CASE WHEN s_stat > 0
        |      THEN (CAST(s_stat AS DOUBLE) - 1.0) / nullif(sqrt(vs), 0.0)
        |    WHEN s_stat < 0
        |      THEN (CAST(s_stat AS DOUBLE) + 1.0) / nullif(sqrt(vs), 0.0)
        |    ELSE 0.0 END, 6) AS z_mk
        |FROM fin""".stripMargin)),

    // Ljung–Box portmanteau test per event type (Ljung & Box, Biometrika
    // 1978) — where ev_acf reads single lags, Q_LB = n(n+2)·Σ_{k=1..7}
    // ρ_k²/(n−k) tests the JOINT null that the first seven daily-count
    // autocorrelations are all zero — the one-number whiteness audit a
    // forecast-residual or bot-cadence screen needs. Same zero-filled
    // (type, day) grid, collapsed from the corpus ONCE (LazyCheckpoint);
    // lagged products come from a (grid × 7-lag) day-arithmetic join
    // (identical on both engines — the grid has every day, so day+k
    // equi-join ≡ lead(k)), all per-lag sufficient statistics are exact
    // longs, ρ_k's chain is mirrored doubles from those longs, each
    // ρ_k²/(n−k) term pre-rounds to a scaled-1e9 long summed exactly
    // (no cross-lag double order), and a constant series (denominator 0)
    // propagates NULL through every term to a NULL Q. Scale: one
    // map-combined corpus pass; everything after is |types|·|days|·7
    // bounded.
    Q("dq_ljung_box",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = graft.plans.LazyCheckpoint.of(
          ev.groupBy("event_type", "day").agg(count(lit(1)).as("c")))
        val span = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = counts.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
        val pairs = grid.as("a").crossJoin(broadcast(lags))
          .join(grid.as("b"),
            col("b.event_type") === col("a.event_type") &&
              col("b.day") === date_add(col("a.day"), col("lag")))
          .select(col("a.event_type").as("event_type"), col("lag"),
            col("a.c").as("x"), col("b.c").as("y"))
        val lagStats = pairs.groupBy("event_type", "lag").agg(
          count(lit(1)).as("m"),
          sum(col("x") * col("y")).as("pk"),
          sum(col("x")).as("hk"), sum(col("y")).as("tk"))
        val totals = grid.groupBy("event_type").agg(count(lit(1)).as("n"),
          sum(col("c")).as("ss"), sum(col("c") * col("c")).as("s2"))
        val nD = col("n").cast("double")
        val xb = col("ss").cast("double") / nD
        val mD = col("m").cast("double")
        val num = col("pk").cast("double") -
          xb * (col("hk") + col("tk")).cast("double") + mD * xb * xb
        val den = col("s2").cast("double") - col("ss").cast("double") * xb
        val rho = num / nullif(den, lit(0.0))
        val t9 = round(rho * rho / mD * 1.0e9, 0).cast("long")
        lagStats.join(broadcast(totals), "event_type")
          .select(col("event_type"), col("n"), t9.as("t9"))
          .groupBy("event_type", "n")
          .agg(sum(col("t9")).as("ts9"), count(col("t9")).as("n_lags"))
          .select(col("event_type"), col("n").as("n_days"), col("n_lags"),
            round(nD * (nD + 2.0) * col("ts9").cast("double") / 1.0e9, 6)
              .as("q_lb"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |lags AS (SELECT CAST(unnest(generate_series(1, 7)) AS INT) AS lag),
        |pairs AS (SELECT a.event_type, l.lag, a.c AS x, b.c AS y
        |  FROM grid a CROSS JOIN lags l
        |  JOIN grid b ON b.event_type = a.event_type
        |    AND b.day = a.day + l.lag * INTERVAL 1 DAY),
        |ls AS (SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(x * y) AS BIGINT) AS pk, CAST(SUM(x) AS BIGINT) AS hk,
        |    CAST(SUM(y) AS BIGINT) AS tk
        |  FROM pairs GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS ss, CAST(SUM(c * c) AS BIGINT) AS s2
        |  FROM grid GROUP BY 1),
        |terms AS (SELECT l.event_type, t.n,
        |    CAST(l.pk AS DOUBLE)
        |      - CAST(t.ss AS DOUBLE) / CAST(t.n AS DOUBLE)
        |        * CAST(l.hk + l.tk AS DOUBLE)
        |      + CAST(l.m AS DOUBLE)
        |        * (CAST(t.ss AS DOUBLE) / CAST(t.n AS DOUBLE))
        |        * (CAST(t.ss AS DOUBLE) / CAST(t.n AS DOUBLE)) AS num,
        |    CAST(t.s2 AS DOUBLE) - CAST(t.ss AS DOUBLE)
        |      * (CAST(t.ss AS DOUBLE) / CAST(t.n AS DOUBLE)) AS den,
        |    CAST(l.m AS DOUBLE) AS md
        |  FROM ls l JOIN tot t USING (event_type)),
        |t9 AS (SELECT event_type, n,
        |    CAST(round((num / nullif(den, 0.0)) * (num / nullif(den, 0.0))
        |      / md * 1e9, 0) AS BIGINT) AS t9
        |  FROM terms),
        |fin AS (SELECT event_type, n, CAST(SUM(t9) AS BIGINT) AS ts9,
        |    CAST(COUNT(t9) AS BIGINT) AS n_lags
        |  FROM t9 GROUP BY 1, 2)
        |SELECT event_type, n AS n_days, n_lags,
        |  round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
        |    * CAST(ts9 AS DOUBLE) / 1e9, 6) AS q_lb
        |FROM fin""".stripMargin)),

    // Friedman test (Friedman 1937, Conover's tie-robust form) over the
    // (day × type) grid: each DAY is a block, the k event types are
    // ranked within it, and the test asks whether any type's daily-count
    // level systematically differs — the nonparametric repeated-measures
    // companion to dq_kruskal_wallis (that one pools all rows; this one
    // controls for the day, so a global traffic swing can't fake a
    // between-type difference). Determinism: within-day midranks as
    // INTEGER 2·midranks (the dq_mannwhitney trick — no .5 rational),
    // and the ×4-scaled identity Q = (k−1)·Σ_j(R2_j − n(k+1))² /
    // (Σ r2² − nk(k+1)²) makes numerator AND denominator exact longs —
    // ONE final division, no intermediate doubles at all. Degenerate
    // (every day fully tied) → NULL via nullif. Scale shape: one
    // map-combined corpus collapse, per-day rank windows on the bounded
    // grid (blocks are k-row groups), |types|-row algebra.
    Q("dq_friedman",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = graft.plans.LazyCheckpoint.of(
          ev.groupBy("event_type", "day").agg(count(lit(1)).as("c")))
        val span = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = counts.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wR = Window.partitionBy("day").orderBy("c")
        val wT = Window.partitionBy("day", "c")
        val ranked = grid
          .withColumn("r2", lit(2L) * rank().over(wR).cast("long") +
            count(lit(1)).over(wT) - lit(1L))
        val perType = ranked.groupBy("event_type")
          .agg(sum(col("r2")).as("rr2"), count(lit(1)).as("n"))
        val cells = ranked.agg(sum(col("r2") * col("r2")).as("a2"),
          count(lit(1)).as("nk"))
        val tots = perType.agg(count(lit(1)).as("k"), max(col("n")).as("nd"))
        val kk = col("k")
        val nn = col("nd")
        val num = perType.crossJoin(broadcast(tots))
          .select(((col("rr2") - nn * (kk + lit(1L))) *
            (col("rr2") - nn * (kk + lit(1L)))).as("d4"),
            kk.as("k"), nn.as("nd"))
          .groupBy("k", "nd").agg(sum(col("d4")).as("n4"))
        num.crossJoin(broadcast(cells))
          .select(col("k").cast("long").as("n_types"),
            col("nd").as("n_days"),
            round((col("k") - lit(1L)).cast("double") *
              col("n4").cast("double") /
              nullif((col("a2") - col("nd") * col("k") *
                (col("k") + lit(1L)) * (col("k") + lit(1L))).cast("double"),
                lit(0.0)), 6).as("q_friedman"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |ranked AS (SELECT event_type, day, c,
        |    2 * CAST(rank() OVER (PARTITION BY day ORDER BY c) AS BIGINT)
        |      + CAST(COUNT(*) OVER (PARTITION BY day, c) AS BIGINT) - 1 AS r2
        |  FROM grid),
        |pt AS (SELECT event_type, CAST(SUM(r2) AS BIGINT) AS rr2,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ranked GROUP BY 1),
        |cells AS (SELECT CAST(SUM(r2 * r2) AS BIGINT) AS a2 FROM ranked),
        |tots AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(MAX(n) AS BIGINT) AS nd FROM pt),
        |num AS (SELECT k, nd, CAST(SUM((rr2 - nd * (k + 1))
        |      * (rr2 - nd * (k + 1))) AS BIGINT) AS n4
        |  FROM pt CROSS JOIN tots GROUP BY 1, 2)
        |SELECT k AS n_types, nd AS n_days,
        |  round(CAST(k - 1 AS DOUBLE) * CAST(n4 AS DOUBLE)
        |    / nullif(CAST(a2 - nd * k * (k + 1) * (k + 1) AS DOUBLE), 0.0), 6)
        |    AS q_friedman
        |FROM num CROSS JOIN cells""".stripMargin)),

    // Kendall τ-b between two metric SERIES on the same grid (view vs
    // click daily counts) — dq_spearman reads row-level rank
    // correlation; this reads whether two metrics MOVE TOGETHER
    // day-over-day, with the tie handling zero-heavy daily counts need
    // (τ-b discounts tied pairs in either series; plain τ-a would
    // understate association badly on sparse days). Every sufficient
    // statistic is an exact long over the |days|²-bounded day-pair
    // frame (the dq_mann_kendall shape — the corpus collapses FIRST):
    // concordant/discordant pair counts, per-value tie terms n1/n2;
    // the closing chain is one sqrt of an exact long product.
    Q("dq_kendall_tau",
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("event_type").isin("view", "click"))
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = graft.plans.LazyCheckpoint.of(
          ev.groupBy("event_type", "day").agg(count(lit(1)).as("c")))
        val span = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val xy = days
          .join(counts.filter(col("event_type") === "view")
            .select(col("day"), col("c").as("x")), Seq("day"), "left")
          .join(counts.filter(col("event_type") === "click")
            .select(col("day"), col("c").as("y")), Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
            coalesce(col("y"), lit(0L)).as("y"))
        // explicit broadcast: the non-equi (day <) pair join must plan as
        // a BNLJ over the |days|-bounded broadcast grid, not a cartesian
        // (the grid is day-bounded — broadcasting it is right at any SF)
        val pairs = xy.as("a").join(broadcast(xy.as("b")),
            col("a.day") < col("b.day"))
          .select(
            (col("b.x") - col("a.x")).as("dx"),
            (col("b.y") - col("a.y")).as("dy"))
        val cd = pairs.agg(
          sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("conc"),
          sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("disc"),
          count(lit(1)).as("n0"))
        val t1 = xy.groupBy("x").agg(count(lit(1)).as("t"))
          .agg(sum(col("t") * (col("t") - 1) / 2).as("n1"))
        val t2 = xy.groupBy("y").agg(count(lit(1)).as("t"))
          .agg(sum(col("t") * (col("t") - 1) / 2).as("n2"))
        cd.crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
          .select(col("n0"), col("conc"), col("disc"),
            round((col("conc") - col("disc")).cast("double") /
              nullif(sqrt(((col("n0") - col("n1")) *
                (col("n0") - col("n2"))).cast("double")), lit(0.0)), 6)
              .as("tau_b"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events
        |  WHERE event_type IN ('view', 'click')),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |xy AS (SELECT d.day,
        |    COALESCE(v.c, 0) AS x, COALESCE(k.c, 0) AS y
        |  FROM days d
        |  LEFT JOIN counts v ON v.day = d.day AND v.event_type = 'view'
        |  LEFT JOIN counts k ON k.day = d.day AND k.event_type = 'click'),
        |pairs AS (SELECT b.x - a.x AS dx, b.y - a.y AS dy
        |  FROM xy a JOIN xy b ON a.day < b.day),
        |cd AS (SELECT
        |    CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS conc,
        |    CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS disc,
        |    CAST(COUNT(*) AS BIGINT) AS n0
        |  FROM pairs),
        |t1 AS (SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n1
        |  FROM (SELECT x, COUNT(*) AS t FROM xy GROUP BY 1)),
        |t2 AS (SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n2
        |  FROM (SELECT y, COUNT(*) AS t FROM xy GROUP BY 1))
        |SELECT n0, conc, disc,
        |  round(CAST(conc - disc AS DOUBLE)
        |    / nullif(sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE)), 0.0), 6)
        |    AS tau_b
        |FROM cd CROSS JOIN t1 CROSS JOIN t2""".stripMargin)),

    // Wald–Wolfowitz runs test per event type on the above-mean /
    // at-or-below-mean daily-count sequence — the randomness audit the
    // trend tests can't give: a series can be trend-free yet serially
    // CLUMPED (bursts, release waves, bot storms), which shows up as too
    // few runs; over-alternation (load-balancer artifacts) as too many.
    // Determinism: the above-mean indicator compares c·n > Σc in EXACT
    // LONGS (no mean double), the run count is an exact lag-window sum,
    // and μ_R/σ_R are one mirrored double chain from exact n1/n2 with
    // the σ divisor null-guarded (n1 = 0 or n2 = 0 ⇒ z NULL both
    // engines). Scale: map-combined collapse to the grid, then one
    // |types|-keyed window pass.
    Q("dq_runs_test",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        // LazyCheckpoint-ed collapsed counts (the dq_mann_kendall note):
        // the whole query is ONE corpus scan
        val counts = graft.plans.LazyCheckpoint.of(
          ev.groupBy("event_type", "day").agg(count(lit(1)).as("c")))
        val span = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = counts.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wAll = Window.partitionBy("event_type")
        val wSeq = Window.partitionBy("event_type").orderBy("day")
        val flagged = grid
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("sc", sum(col("c")).over(wAll))
          .withColumn("ab",
            when(col("c") * col("n") > col("sc"), 1L).otherwise(0L))
          .withColumn("chg",
            when(lag(col("ab"), 1).over(wSeq).isNotNull &&
              col("ab") =!= lag(col("ab"), 1).over(wSeq), 1L).otherwise(0L))
        val agg = flagged.groupBy("event_type").agg(
          count(lit(1)).as("n_days"), sum(col("ab")).as("n_above"),
          (sum(col("chg")) + 1L).as("runs"))
        val n1 = col("n_above").cast("double")
        val n2 = (col("n_days") - col("n_above")).cast("double")
        val muR = lit(2.0) * n1 * n2 / (n1 + n2) + 1.0
        val varR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2) /
          ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
        agg.select(col("event_type"), col("n_days"), col("n_above"),
          col("runs"),
          round((col("runs").cast("double") - muR) /
            nullif(sqrt(varR), lit(0.0)), 6).as("z_runs"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |f AS (
        |  SELECT event_type, day, c,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS sc
        |  FROM grid),
        |g AS (
        |  SELECT event_type, day,
        |    CASE WHEN c * n > sc THEN 1 ELSE 0 END AS ab
        |  FROM f),
        |h AS (
        |  SELECT event_type, ab,
        |    CASE WHEN lag(ab) OVER (PARTITION BY event_type ORDER BY day)
        |        IS NOT NULL
        |      AND ab <> lag(ab) OVER (PARTITION BY event_type ORDER BY day)
        |      THEN 1 ELSE 0 END AS chg
        |  FROM g),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(ab) AS BIGINT) AS n_above,
        |    CAST(SUM(chg) + 1 AS BIGINT) AS runs
        |  FROM h GROUP BY 1),
        |fin AS (
        |  SELECT *, CAST(n_above AS DOUBLE) AS n1,
        |    CAST(n_days - n_above AS DOUBLE) AS n2
        |  FROM agg)
        |SELECT event_type, n_days, n_above, runs,
        |  round((CAST(runs AS DOUBLE)
        |      - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
        |    / nullif(sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        |      / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 0.0), 6) AS z_runs
        |FROM fin""".stripMargin)),

    // Day-of-week seasonality strength per event type — one-way ANOVA of
    // the daily counts across the 7 weekday classes on the zero-filled
    // grid: F = (SSB/(k−1))/(SSW/(n−k)) plus the bounded readout
    // SSB/SST ∈ [0,1] ("what share of daily variance is weekday
    // rhythm"), the signal behind weekday-aware anomaly thresholds and
    // the seasonal-naive forecast (ev_seasonal_naive assumes it; this
    // MEASURES it). Weekday classes via pmod(datediff(day, anchor), 7) —
    // an engine-agnostic formula, no dow() convention mismatch.
    // Determinism: per-class (n_g, Σc) and per-type (n, Σc, Σc²) are
    // exact longs; the SSB class terms pre-round to 6dp scaled longs
    // before the exact sum (the dq_anova discipline); F and strength are
    // one mirrored double chain, nullif-guarded for constant series.
    Q("ev_dow_seasonality",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        // LazyCheckpoint-ed collapsed counts (the dq_mann_kendall note),
        // and BOTH rollup levels (per-dow, per-type) fold out of ONE grid
        // reference — the per-type sufficient statistics (n, Σc, Σc²) are
        // sums of the per-dow ones: the whole query is ONE corpus scan
        val counts = graft.plans.LazyCheckpoint.of(
          ev.groupBy("event_type", "day").agg(count(lit(1)).as("c")))
        val span = counts.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = counts.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"),
            pmod(datediff(col("day"), to_date(lit("2024-01-01"))), lit(7))
              .as("dow"),
            coalesce(col("c"), lit(0L)).as("c"))
        val byDow = grid.groupBy("event_type", "dow")
          .agg(count(lit(1)).as("ng"), sum(col("c")).as("sg"),
            sum(col("c") * col("c")).as("sgg"))
        val bt = round(round(col("sg").cast("double") *
          col("sg").cast("double") / col("ng").cast("double"), 6) *
          1000000, 0).cast("long")
        val perType = byDow
          .select(col("event_type"), bt.as("bt"), col("ng"), col("sg"),
            col("sgg"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("k"), sum(col("bt")).as("btl"),
            sum(col("ng")).as("n_days"), sum(col("sg")).as("sc"),
            sum(col("sgg")).as("scc"))
        val nD = col("n_days").cast("double")
        val kD = col("k").cast("double")
        val cf = col("sc").cast("double") * col("sc").cast("double") / nD
        val ssb = col("btl").cast("double") / 1000000.0 - cf
        val sst = col("scc").cast("double") - cf
        val ssw = sst - ssb
        perType
          .select(col("event_type"), col("n_days"), col("k").as("n_classes"),
            round(ssb, 6).as("ss_between"),
            // nullif sits on each DIVISOR, not around the division
            // (round-15 ADVICE): n_days == k makes ssw/(nD−kD) an x/0 the
            // two engines disagree on (Spark NULL, DuckDB inf — and
            // nullif(inf, 0) keeps the inf), and k == 1 left ssb/(kD−1.0)
            // unguarded entirely
            round((ssb / nullif(kD - 1.0, lit(0.0))) /
              nullif(ssw / nullif(nD - kD, lit(0.0)), lit(0.0)), 6)
              .as("f_dow"),
            round(ssb / nullif(sst, lit(0.0)), 6).as("seasonal_strength"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type,
        |    ((CAST(d.day - DATE '2024-01-01' AS BIGINT) % 7) + 7) % 7 AS dow,
        |    COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |bydow AS (
        |  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(c) AS BIGINT) AS sg
        |  FROM grid GROUP BY 1, 2),
        |pertype AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(round(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |        / CAST(ng AS DOUBLE), 6) * 1000000, 0) AS BIGINT))
        |      AS BIGINT) AS btl
        |  FROM bydow GROUP BY 1),
        |tots AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS scc
        |  FROM grid GROUP BY 1),
        |fin AS (
        |  SELECT t.event_type, t.n_days, p.k,
        |    CAST(p.btl AS DOUBLE) / 1000000.0
        |      - CAST(t.sc AS DOUBLE) * CAST(t.sc AS DOUBLE)
        |        / CAST(t.n_days AS DOUBLE) AS ssb,
        |    CAST(t.scc AS DOUBLE)
        |      - CAST(t.sc AS DOUBLE) * CAST(t.sc AS DOUBLE)
        |        / CAST(t.n_days AS DOUBLE) AS sst
        |  FROM tots t JOIN pertype p ON p.event_type = t.event_type)
        |SELECT event_type, n_days, k AS n_classes,
        |  round(ssb, 6) AS ss_between,
        |  round((ssb / nullif(CAST(k AS DOUBLE) - 1.0, 0.0))
        |    / nullif((sst - ssb) / nullif(CAST(n_days AS DOUBLE)
        |      - CAST(k AS DOUBLE), 0.0), 0.0), 6) AS f_dow,
        |  round(ssb / nullif(sst, 0.0), 6) AS seasonal_strength
        |FROM fin""".stripMargin)),

    // Empirical entropy rate of the session Markov chain (Shannon 1948) —
    // ONE number for "how predictable is user behavior": H = −Σ_{ij}
    // p(i,j)·ln p(j|i) over ev_markov's transition counts, equivalently
    // −Σ n_ij·ln(n_ij/n_i) / N. A falling rate means funnels are
    // ossifying; a jump flags new flows or bots. Exactness: each
    // ln(n_ij/n_i) pre-rounds to a 6dp scaled long (boundary-audited),
    // the n_ij-weighted sum is exact long arithmetic, and ONE division
    // ends the chain — all inside a single aggregate, no scalar
    // cross-join. Scale shape: the ev_markov discipline verbatim (one
    // user-keyed window exchange, |types|²-bounded transition frame).
    Q("ev_entropy_rate",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
        val trans = t(s, d, "events")
          .withColumn("brk",
            when(gap.isNull || gap > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("brk")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("next_sess", lead(col("session_id"), 1).over(w))
          .filter(col("next_type").isNotNull &&
            col("next_sess") === col("session_id"))
          .groupBy(col("event_type").as("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        val totals = trans.groupBy("prev_type")
          .agg(sum(col("n")).as("n_prev"))
        trans.join(broadcast(totals), "prev_type")
          .select(col("n"),
            round(log(col("n").cast("double") / col("n_prev").cast("double"))
              * lit(1000000), 0).cast("long").as("ln6"))
          .agg(sum(col("n")).as("n_trans"),
            sum(col("n") * col("ln6")).as("s"))
          .select(col("n_trans"),
            (-col("s").cast("double") / lit(1000000.0) /
              col("n_trans").cast("double")).as("entropy_rate"))
      },
      Some("""WITH lab AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (SELECT user_id, event_id, event_type, ts,
        |          epoch_us(CAST(ts AS TIMESTAMP))
        |            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM events)),
        |tr AS (
        |  SELECT event_type AS prev_type, session_id,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type,
        |    lead(session_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_sess
        |  FROM lab),
        |cnt AS (SELECT prev_type, next_type, COUNT(*) AS n FROM tr
        |        WHERE next_type IS NOT NULL AND next_sess = session_id
        |        GROUP BY 1, 2),
        |tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_prev
        |        FROM cnt GROUP BY 1),
        |term AS (SELECT n, CAST(round(
        |    ln(CAST(n AS DOUBLE) / CAST(n_prev AS DOUBLE)) * 1000000, 0)
        |    AS BIGINT) AS ln6
        |  FROM cnt JOIN tot USING (prev_type)),
        |m AS (SELECT CAST(SUM(n) AS BIGINT) AS n_trans,
        |        CAST(SUM(n * ln6) AS BIGINT) AS s FROM term)
        |SELECT n_trans,
        |  -CAST(s AS DOUBLE) / 1000000.0 / CAST(n_trans AS DOUBLE)
        |    AS entropy_rate
        |FROM m""".stripMargin)),

    // Lag-1 / lag-7 autocorrelation of daily event counts per type — the
    // day-over-day persistence and weekly-seasonality screens a forecast
    // feature block (ev_lag_features) should be justified by, on the SAME
    // zero-filled day scaffold (gap days are real zeros; skipping them
    // would splice non-adjacent days together). Pearson over the lagged
    // pairs in EXACT integer moments: (m·Σxy − Σx·Σy) /
    // √((m·Σx²−(Σx)²)·(m·Σy²−(Σy)²)) — one correctly-rounded sqrt of an
    // exact long product, one division; degenerate (constant) series
    // report 0. Scale shape: one (type, day) map-combined count, the
    // bounded scaffold, one type-keyed window for both leads, two
    // melted rows per day — everything after the first count is
    // |types|×|days| bounded.
    Q("ev_acf",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
        val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = ev.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("day")
        val led = grid.withColumn("y1", lead(col("c"), 1).over(w))
          .withColumn("y7", lead(col("c"), 7).over(w))
        val melted = led.filter(col("y1").isNotNull)
            .select(col("event_type"), lit(1L).as("lag"),
              col("c").as("x"), col("y1").as("y"))
          .unionAll(led.filter(col("y7").isNotNull)
            .select(col("event_type"), lit(7L).as("lag"),
              col("c").as("x"), col("y7").as("y")))
        melted.groupBy("event_type", "lag")
          .agg(count(lit(1)).as("m"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("lag"), col("m"),
            when((col("m") * col("sxx") - col("sx") * col("sx")) > 0 &&
                (col("m") * col("syy") - col("sy") * col("sy")) > 0,
              (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt(((col("m") * col("sxx") - col("sx") * col("sx")) *
                  (col("m") * col("syy") - col("sy") * col("sy")))
                  .cast("double")))
              .otherwise(lit(0.0)).as("acf"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |led AS (SELECT event_type, c,
        |    lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
        |    lead(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
        |  FROM grid),
        |melted AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS lag, c AS x, y1 AS y
        |  FROM led WHERE y1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, CAST(7 AS BIGINT), c, y7
        |  FROM led WHERE y7 IS NOT NULL),
        |m AS (SELECT event_type, lag, COUNT(*) AS m,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy,
        |        CAST(SUM(x * x) AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) AS BIGINT) AS syy
        |      FROM melted GROUP BY 1, 2)
        |SELECT event_type, lag, m,
        |  CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
        |    THEN CAST(m * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST((m * sxx - sx * sx) * (m * syy - sy * sy) AS DOUBLE))
        |    ELSE 0.0 END AS acf
        |FROM m""".stripMargin)),

    // Seasonal-naive forecast evaluation (the MASE idea, Hyndman & Koehler
    // 2006): on the zero-filled day scaffold, score the forecast "day t
    // repeats day t−7" against the naive "day t repeats day t−1" by the
    // ratio of their absolute-error sums over the SAME eval window — the
    // honest pre-model baseline check every metric dashboard needs (a
    // ratio < 1 says weekly seasonality is real and a model must beat
    // seasonal-naive, not naive, to matter; pairs with ev_acf's lag-7
    // screen). Exact integer error sums, ONE division per type, 0 when
    // the naive denominator is 0 (constant series). Scale shape: the
    // ev_acf scaffold — one (type, day) map-combined count, a bounded
    // grid, one window per type.
    Q("ev_seasonal_naive",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
        val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val days = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val types = ev.select("event_type").distinct()
        val grid = types.crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("day")
        grid.withColumn("l1", lag(col("c"), 1).over(w))
          .withColumn("l7", lag(col("c"), 7).over(w))
          .filter(col("l7").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("c") - col("l7"))).as("sae_seasonal"),
            sum(abs(col("c") - col("l1"))).as("sae_naive1"))
          .select(col("event_type"), col("n_eval"),
            col("sae_seasonal"), col("sae_naive1"),
            when(col("sae_naive1") > 0,
              col("sae_seasonal").cast("double") / col("sae_naive1").cast("double"))
              .otherwise(lit(0.0)).as("mase"))
      },
      Some("""WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |counts AS (SELECT event_type, day, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |    AS DATE) AS day FROM span),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
        |  FROM types t CROSS JOIN days d
        |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day),
        |lagged AS (SELECT event_type, c,
        |    lag(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
        |    lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS l7
        |  FROM grid)
        |SELECT event_type, COUNT(*) AS n_eval,
        |  CAST(SUM(abs(c - l7)) AS BIGINT) AS sae_seasonal,
        |  CAST(SUM(abs(c - l1)) AS BIGINT) AS sae_naive1,
        |  CASE WHEN SUM(abs(c - l1)) > 0
        |    THEN CAST(SUM(abs(c - l7)) AS DOUBLE) / CAST(SUM(abs(c - l1)) AS DOUBLE)
        |    ELSE 0.0 END AS mase
        |FROM lagged WHERE l7 IS NOT NULL GROUP BY 1""".stripMargin)),

    // Adamic–Adar link prediction over the co-visitation graph (Adamic &
    // Adar 2003) — the hub-discounted upgrade of ev_covisitation's raw
    // common-user counts: each shared user contributes 1/ln(deg_u), so
    // catalog-crawling power users stop dominating the recommendation
    // edges. Weights pre-round to 6dp scaled longs per USER (boundary-
    // audited) before the exact-long pair sum; one division at the end.
    // Scale shape: the capped bucketPairs per-user emission with the
    // weight riding inside the item struct — zero shuffles beyond the
    // unweighted edge count.
    Q("ev_adamic_adar",
      (s, d) => {
        val views = t(s, d, "events").filter(col("event_type") === "view")
        val item = get_json_object(col("props"), "$.k").cast("long")
        EventOps.adamicAdar(views, item)
      },
      Some("""WITH vi AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events
        |  WHERE event_type = 'view'
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |w AS (SELECT user_id,
        |    CAST(round(CAST(1000000 AS DOUBLE)
        |      / ln(CAST(COUNT(*) AS DOUBLE)), 0) AS BIGINT) AS w6
        |  FROM vi GROUP BY user_id HAVING COUNT(*) >= 2),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, w.w6
        |  FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
        |  JOIN w ON w.user_id = a.user_id)
        |SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_common,
        |  CAST(SUM(w6) AS DOUBLE) / 1000000.0 AS adamic_adar
        |FROM pairs GROUP BY 1, 2""".stripMargin)),

    // Streaming-parity entry for the HLL register ledger (the
    // ev_late_sessions pattern applied to the sketch family): the fixture
    // documents flow through the streaming sink in TWO micro-batch runs,
    // and the estimate SERVED FROM THE LEDGER must bit-equal the oracle's
    // one-shot batch derivation — judged proof that per-batch register
    // partitions + max-merge are batching-invariant, not just spec'd so.
    // Streaming-parity entry for the decay-score ledger (the st_hll_ledger
    // treatment for the ADDITIVE-merge ledger family): the fixture events
    // flow through startDecayLedgerSink in TWO micro-batch runs, scores are
    // served from the ledger, and the result must bit-equal ev_decay_score's
    // one-shot batch derivation — judged proof that per-batch (user, day)
    // partial counts + serve-time weighting against the ledger-wide max day
    // are batching-invariant (day counts torn across batches and the
    // max-day anchor landing in either half included).
    Q("st_decay_ledger",
      (s, d) => decayLedger(s, d),
      Some("""WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
        |e AS (SELECT user_id,
        |        (1::BIGINT << (30 - CAST((max_day - CAST(ts AS DATE)) // 7 AS INT))) AS wt
        |      FROM events CROSS JOIN mx)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(wt) AS DOUBLE) / 1073741824.0 AS decay_score
        |FROM e GROUP BY 1""".stripMargin)),

    // Streaming-parity entry for the CUSUM drift ledger: events flow
    // through startCusumLedgerSink in TWO micro-batch runs, the drift
    // table is served from the summed (type, day) partials via the SAME
    // chain as the batch entry — and judged against ev_cusum's IDENTICAL
    // oracle, so the streaming monitor cannot drift from the batch
    // statistic by a single integer.
    Q("st_cusum_ledger",
      (s, d) => cusumLedger(s, d),
      Some("""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |scaffold AS (
        |  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM (SELECT DISTINCT event_type FROM daily) CROSS JOIN rng),
        |filled AS (
        |  SELECT s.event_type, s.day, COALESCE(d.cnt, 0) AS n
        |  FROM scaffold s LEFT JOIN daily d
        |    ON d.event_type = s.event_type AND d.day = s.day),
        |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tt,
        |          COUNT(*) AS nd FROM filled GROUP BY 1),
        |c AS (SELECT f.event_type, f.day, f.n,
        |        CAST(SUM(nd * n - tt) OVER (PARTITION BY f.event_type
        |          ORDER BY f.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
        |        tt, nd
        |      FROM filled f JOIN tot USING (event_type)),
        |s2 AS (SELECT event_type, day, n, tt, nd,
        |        p - least(0, CAST(MIN(p) OVER (PARTITION BY event_type
        |          ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)) AS s
        |      FROM c)
        |SELECT event_type, day, n,
        |  CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS cusum,
        |  s > tt AS alarm
        |FROM s2""".stripMargin)),

    // Streaming-parity entry for the count-min counter ledger (the
    // st_hll_ledger treatment for the LINEAR-sketch family): documents
    // flow through startCmsLedgerSink in TWO micro-batch runs — every
    // frequent token's occurrences torn across both — estimates are
    // served from the summed ledger partitions, and the result must
    // bit-equal the oracle's one-shot batch CMS (the tx_cms_freq formula:
    // exact integer counters, min over 3 md5-sliced rows, query set =
    // tokens with exact count ≥ 20).
    Q("st_cms_ledger",
      (s, d) => cmsLedger(s, d),
      Some("""WITH tf AS (
        |  SELECT token, COUNT(*) AS n_exact
        |  FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token),
        |keyed AS (
        |  SELECT token, n_exact, r,
        |    (strpos('0123456789abcdef', substring(md5(token), 1 + 3 * r, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substring(md5(token), 2 + 3 * r, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substring(md5(token), 3 + 3 * r, 1)) - 1) AS bucket
        |  FROM tf CROSS JOIN (SELECT unnest([0, 1, 2]) AS r)),
        |counters AS (
        |  SELECT r, bucket, CAST(SUM(n_exact) AS BIGINT) AS c
        |  FROM keyed GROUP BY 1, 2)
        |SELECT k.token, CAST(MIN(k.n_exact) AS BIGINT) AS n_exact,
        |  CAST(MIN(c.c) AS BIGINT) AS est
        |FROM keyed k JOIN counters c USING (r, bucket)
        |GROUP BY k.token
        |HAVING MIN(k.n_exact) >= 20""".stripMargin)),

    // Streaming-parity entry for the log-bucket quantile ledger (the
    // st_cms_ledger treatment for ORDER STATISTICS): document lengths
    // flow through startQuantileLedgerSink in TWO micro-batch runs —
    // every bucket's count torn across both — and five quantiles are
    // served from the summed ledger partitions. The oracle re-derives
    // the one-shot batch histogram with the SAME transcendental-free
    // bucket function (shift = max(0, bitlength − 1 − 5) via binary-
    // string length, pure integer shifts for the bounds), so the served
    // (q, n, rank, lo, hi) rows must bit-equal — a rank-bracket
    // guarantee, not an estimate (see operators/LogHistogram.scala).
    Q("st_quantile_ledger",
      (s, d) => quantileLedger(s, d),
      Some("""WITH v AS (
        |  SELECT length(text) AS v FROM documents WHERE text IS NOT NULL),
        |b AS (
        |  SELECT GREATEST(0, length(bin(v)) - 1 - 5) AS shift,
        |    v >> GREATEST(0, length(bin(v)) - 1 - 5) AS m, COUNT(*) AS c
        |  FROM v GROUP BY 1, 2),
        |cum AS (
        |  SELECT (m << shift) AS lo, ((m + 1) << shift) - 1 AS hi,
        |    SUM(c) OVER (ORDER BY (m << shift)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER () AS n
        |  FROM b),
        |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE)
        |    AS q)
        |SELECT q, CAST(n AS BIGINT) AS n,
        |  CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT) AS rank,
        |  CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi
        |FROM (
        |  SELECT qs.q, c.n, c.lo, c.hi,
        |    row_number() OVER (PARTITION BY qs.q ORDER BY c.lo) AS rn
        |  FROM qs JOIN cum c
        |    ON c.cum >= ceil(qs.q * CAST(c.n AS DOUBLE)))
        |WHERE rn = 1""".stripMargin)),

    Q("st_hll_ledger",
      (s, d) => hllLedger(s, d),
      Some("""WITH hx AS (
        |  SELECT md5(text) AS h FROM documents WHERE text IS NOT NULL),
        |rr AS (SELECT substring(h, 1, 2) AS reg,
        |    CASE WHEN length(regexp_replace(substring(h, 3, 13), '^0+', '')) = 0
        |      THEN 53
        |      ELSE (13 - length(regexp_replace(substring(h, 3, 13), '^0+', ''))) * 4
        |        + CASE substring(regexp_replace(substring(h, 3, 13), '^0+', ''), 1, 1)
        |            WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
        |            WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
        |            ELSE 0 END + 1 END AS rho
        |  FROM hx),
        |regs AS (SELECT reg, CAST(MAX(rho) AS BIGINT) AS m_j FROM rr GROUP BY 1),
        |z AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_regs,
        |    CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - m_j AS INTEGER)) AS BIGINT)
        |      + (256 - COUNT(*)) * 9007199254740992 AS z53
        |  FROM regs)
        |SELECT n_regs, CAST(z53 AS BIGINT) AS z53,
        |  CAST(0.718273 AS DOUBLE) * CAST(65536 AS DOUBLE)
        |    * CAST(9007199254740992 AS DOUBLE) / CAST(z53 AS DOUBLE)
        |    AS estimate
        |FROM z""".stripMargin)),

    // Streaming-parity entry for the watermarked STREAM-STREAM JOIN (the
    // st_hll_ledger treatment for join state): fixture events arrive as
    // two micro-batches, LATE HALF FIRST, through purchaseViewJoin — so
    // cross-batch matches must come from buffered join state — and the
    // drained stream must bit-equal the batch interval join the oracle
    // runs (the ij_interval_join semantics). See [[runStreamJoin]].
    Q("st_stream_join",
      (s, d) => streamJoin(s, d),
      Some("""SELECT a.event_id AS purchase_id, b.event_id AS view_id, a.user_id
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') a
        |JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id
        | AND b.ts <= a.ts AND b.ts >= a.ts - INTERVAL 1 HOUR""".stripMargin)),

    // The LEFT-OUTER streaming join, drained past the watermark with
    // sentinel pusher batches — judged eviction/null-padding semantics
    // (every unmatched purchase exactly once). See [[runStreamLeftJoin]].
    Q("st_stream_left_join",
      (s, d) => streamLeftJoin(s, d),
      Some("""SELECT a.event_id AS purchase_id, b.event_id AS view_id, a.user_id
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') a
        |LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'view') b
        |  ON a.user_id = b.user_id
        | AND b.ts <= a.ts AND b.ts >= a.ts - INTERVAL 1 HOUR""".stripMargin))
  )
}
