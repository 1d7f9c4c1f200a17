package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state API for semantics `session_window` can't express (here:
  * sessions carry running value totals and emit ONLY on session close, with
  * event-time timeout).
  *
  * Scale posture: state is one small record per active user, keyed by
  * user_id, dropped as soon as the watermark closes the session. Nothing
  * about the operator holds more than an active session per key.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Fold events into per-user gap sessions; a session is emitted when the
    * event-time timeout (watermark past last event + gap) fires, or when a
    * later event closes it by exceeding the gap. In BATCH execution there
    * are no timeouts, so only gap-closed sessions appear — the final open
    * session per user stays unemitted (asserted in StatefulSessionsSpec);
    * use EventOps.sessionize for complete batch sessionization. */
  def sessionsFlatMap(events: DataFrame, gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("ts"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, new Timestamp(s.start), new Timestamp(s.end),
              s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            // Stragglers more than one gap BEFORE the open session can never
            // join it — but they CAN fall within one gap of EACH OTHER, so
            // they gap-merge among themselves (same rule EventOps.sessionize
            // applies) before emitting as closed sessions. Sorted input means
            // consecutive stragglers fold into one running session; every
            // straggler run still ends > gapMs before the open session's
            // start, so a merged run can never reach the open session either.
            var straggler: Option[SessionState] = None
            def flushStraggler(): Unit = {
              straggler.foreach { p =>
                closed ::= ClosedSession(user, new Timestamp(p.start),
                  new Timestamp(p.end), p.n, p.total)
              }
              straggler = None
            }
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // merge only within one gap of the session INTERVAL — and a
                // watermark-late event may precede the open session's start
                // (cross-batch), so the merged start must take the min or
                // the emitted session would exclude an event it counted
                case Some(s) if t >= s.start - gapMs && t - s.end <= gapMs =>
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) if t < s.start - gapMs =>
                  straggler match {
                    case Some(p) if t - p.end <= gapMs =>
                      straggler = Some(p.copy(end = math.max(p.end, t),
                        n = p.n + 1, total = p.total + e.value))
                    case _ =>
                      flushStraggler()
                      straggler = Some(SessionState(t, t, 1, e.value))
                  }
                case Some(s) =>
                  closed ::= ClosedSession(user, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            flushStraggler()
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
