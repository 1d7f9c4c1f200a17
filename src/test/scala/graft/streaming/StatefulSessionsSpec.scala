package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch fold: gap closes a session and emits it with totals") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 15:00:00"), 4.0) // > 1h gap: closes first session
    ).toDF("user_id", "ts", "value")
    val got = StatefulSessions.sessionsFlatMap(df, gapMs = 3600 * 1000).collect().toSeq
    // only the closed-by-gap session is emitted in batch mode; the final
    // open session has no timeout to fire
    assert(got == Seq(StatefulSessions.ClosedSession(
      1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3.0)))
  }

  test("streaming: a late event within one gap of the open session extends its START") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "2 hours") // generous lateness so stragglers land
    val sessions = StatefulSessions.sessionsFlatMap(events, gapMs = 15 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("late_sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // batch 2 (watermark-permitted stragglers, 2h lateness, 15min gap):
      // 09:50 is within one gap of the open session's start — must merge
      // and LOWER the start; 09:00 is more than one gap before the start —
      // can't join, emits as its own session
      input.addData((1L, ts("2024-01-01 09:50:00"), 2.0),
        (1L, ts("2024-01-01 09:00:00"), 4.0))
      q.processAllAvailable()
      // advance the watermark far enough to time the merged session out
      input.addData((2L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("late_sessions_out")
        .as[StatefulSessions.ClosedSession].collect().filter(_.user_id == 1L)
        .sortBy(_.session_start.getTime).toSeq
      assert(got.head === StatefulSessions.ClosedSession(
        1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1L, 4.0))
      assert(got(1) === StatefulSessions.ClosedSession(
        1L, ts("2024-01-01 09:50:00"), ts("2024-01-01 10:00:00"), 2L, 3.0),
        "the merged session must start at the late event it absorbed")
    } finally q.stop()
  }

  test("streaming: stragglers within one gap of EACH OTHER merge before emitting") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "6 hours") // generous lateness so stragglers land
    val sessions = StatefulSessions.sessionsFlatMap(events, gapMs = 15 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("straggler_merge_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // three stragglers, all > 1 gap before the 12:00 open session:
      // 09:00 and 09:05 are within one gap of each other → ONE session;
      // 10:00 is > 1 gap after 09:05 → its own session
      input.addData((1L, ts("2024-01-01 09:00:00"), 2.0),
        (1L, ts("2024-01-01 09:05:00"), 3.0),
        (1L, ts("2024-01-01 10:00:00"), 4.0))
      q.processAllAvailable()
      val got = spark.table("straggler_merge_out")
        .as[StatefulSessions.ClosedSession].collect().filter(_.user_id == 1L)
        .sortBy(_.session_start.getTime).toSeq
      assert(got == Seq(
        StatefulSessions.ClosedSession(
          1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:05:00"), 2L, 5.0),
        StatefulSessions.ClosedSession(
          1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"), 1L, 4.0)),
        "same-batch stragglers must gap-merge like EventOps.sessionize would")
    } finally q.stop()
  }

  test("streaming: a straggler run merges into the open session when a later " +
      "late event extends the session start back to within one gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "2 hours")
    val sessions = StatefulSessions.sessionsFlatMap(events, gapMs = 15 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("backmerge_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // 11:36 arrives first in the sorted batch: > 1 gap before the open
      // session's 12:00 start → classified a straggler. 11:50 then merges
      // into the open session and LOWERS its start to 11:50 — now only 14
      // minutes after the straggler run's end, so gap semantics
      // (EventOps.sessionize) say all three events are ONE session. The
      // operator must merge the pending straggler instead of emitting a
      // split.
      input.addData((1L, ts("2024-01-01 11:36:00"), 2.0),
        (1L, ts("2024-01-01 11:50:00"), 4.0))
      q.processAllAvailable()
      assert(spark.table("backmerge_out").count() == 0,
        "nothing may close: the straggler run joined the open session")
      // advance the watermark past end + gap to flush the merged session
      input.addData((2L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("backmerge_out")
        .as[StatefulSessions.ClosedSession].collect().filter(_.user_id == 1L).toSeq
      assert(got == Seq(StatefulSessions.ClosedSession(
        1L, ts("2024-01-01 11:36:00"), ts("2024-01-01 12:00:00"), 3L, 7.0)),
        "the straggler run and the backward-extended open session must gap-merge")
    } finally q.stop()
  }

  test("streaming: a mid-batch session close still gap-merges the pending " +
      "straggler run the session was extended backward toward") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "2 hours")
    val sessions = StatefulSessions.sessionsFlatMap(events, gapMs = 15 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("midclose_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // same shape as the back-merge test, but a THIRD event (13:00, more
      // than one gap after 12:00) closes the session inside the fold: the
      // close must emit [11:36, 12:00] as ONE merged session — not the
      // split ([11:50,12:00] now, [11:36] later) a straggler-blind close
      // would produce
      input.addData((1L, ts("2024-01-01 11:36:00"), 2.0),
        (1L, ts("2024-01-01 11:50:00"), 4.0),
        (1L, ts("2024-01-01 13:00:00"), 8.0))
      q.processAllAvailable()
      val got = spark.table("midclose_out")
        .as[StatefulSessions.ClosedSession].collect().filter(_.user_id == 1L).toSeq
      assert(got == Seq(StatefulSessions.ClosedSession(
        1L, ts("2024-01-01 11:36:00"), ts("2024-01-01 12:00:00"), 3L, 7.0)),
        "a mid-fold close must apply the same straggler gap-merge as the " +
          "end-of-fold flush")
    } finally q.stop()
  }

  test("streaming: event-time timeout emits sessions as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
    val sessions = StatefulSessions.sessionsFlatMap(events, gapMs = 3600 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:30:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // session still open
      // an event far in the future advances the watermark past the timeout
      input.addData((2L, ts("2024-01-02 00:00:00"), 9.0))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-03 00:00:00"), 9.0))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .as[StatefulSessions.ClosedSession].collect().filter(_.user_id == 1L).toSeq
      assert(got == Seq(StatefulSessions.ClosedSession(
        1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 2L, 3.0)))
    } finally q.stop()
  }
}
