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
  * State tracks event time in MICROSECONDS (`Timestamp.getTime` keeps only
  * ms, and the events fixture carries real sub-ms parts) so session
  * boundaries agree exactly with the micros-exact batch sessionizer
  * (`ev_sessionize`) at gap edges — judged against the same SQL oracle in
  * `ev_late_sessions`.
  *
  * Scale posture: state is one small record per active user, keyed by
  * user_id, dropped as soon as the watermark closes the session. Nothing
  * about the operator holds more than an active session per key.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  /** start/end in event-time MICROS. */
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Fold events into per-user gap sessions; a session is emitted when the
    * event-time timeout (watermark past last event + gap) fires, or when a
    * later event closes it by exceeding the gap. In BATCH execution there
    * are no timeouts, so only gap-closed sessions appear — the final open
    * session per user stays unemitted (asserted in StatefulSessionsSpec);
    * use EventOps.sessionize for complete batch sessionization. */
  def sessionsFlatMap(events: DataFrame, gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
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
            Iterator(ClosedSession(user, toTs(s.start), toTs(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            // Stragglers more than one gap BEFORE the open session (as of
            // their arrival) can fall within one gap of EACH OTHER, so they
            // gap-merge among themselves (same rule EventOps.sessionize
            // applies) before emitting as closed sessions. Sorted input
            // means consecutive stragglers fold into one running session.
            // NOTE: a LATER same-batch event can extend the open session
            // backward (the min() below), so the pending straggler run may
            // END within one gap of the session start — that pair gap-merges
            // wherever the session would otherwise emit: at a mid-fold close
            // AND at the end of the fold, before anything flushes.
            var straggler: Option[SessionState] = None
            def flushStraggler(): Unit = {
              straggler.foreach { p =>
                closed ::= ClosedSession(user, toTs(p.start), toTs(p.end), p.n, p.total)
              }
              straggler = None
            }
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                // merge only within one gap of the session INTERVAL — and a
                // watermark-late event may precede the open session's start
                // (cross-batch), so the merged start must take the min or
                // the emitted session would exclude an event it counted
                case Some(s) if t >= s.start - gapUs && t - s.end <= gapUs =>
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) if t < s.start - gapUs =>
                  straggler match {
                    case Some(p) if t - p.end <= gapUs =>
                      straggler = Some(p.copy(end = math.max(p.end, t),
                        n = p.n + 1, total = p.total + e.value))
                    case _ =>
                      flushStraggler()
                      straggler = Some(SessionState(t, t, 1, e.value))
                  }
                case Some(s) =>
                  // closing mid-fold: the open session may have been extended
                  // backward (the min() above) to within one gap of the
                  // pending straggler run — gap semantics say that pair is
                  // ONE session, so merge before emitting (same rule as the
                  // end-of-fold check below). Sorted input means nothing
                  // after t can be a straggler again (t' >= t = new start).
                  val toEmit = straggler match {
                    case Some(p) if s.start - p.end <= gapUs =>
                      straggler = None
                      SessionState(math.min(p.start, s.start),
                        math.max(p.end, s.end), s.n + p.n, s.total + p.total)
                    case _ => s
                  }
                  flushStraggler()
                  closed ::= ClosedSession(user, toTs(toEmit.start),
                    toTs(toEmit.end), toEmit.n, toEmit.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            // the backward-extension case from the NOTE above: if the open
            // session's start has moved to within one gap of the pending
            // straggler run, gap semantics say they are ONE session
            (straggler, cur) match {
              case (Some(p), Some(s)) if s.start - p.end <= gapUs =>
                cur = Some(SessionState(math.min(p.start, s.start),
                  math.max(p.end, s.end), s.n + p.n, s.total + p.total))
                straggler = None
              case _ => ()
            }
            flushStraggler()
            cur.foreach { s =>
              state.update(s)
              // timeout API is ms: round UP so the timeout can never fire
              // before watermark truly passes end + gap
              state.setTimeoutTimestamp(Math.floorDiv(s.end, 1000L) + gapMs + 1)
            }
            closed.reverse.iterator
          }
      }
  }
}
