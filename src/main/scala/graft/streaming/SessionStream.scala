package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for streaming sessionization (the `events` harness
  * schema, projected).
  */
final case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp,
                              value: Double)

/** One open session interval. All times are whole epoch seconds (the same
  * `unix_timestamp` floor as the batch q47 operator, so batch and
  * streaming sessions agree exactly).
  */
final case class OpenSession(startS: Long, lastS: Long, nEvents: Long,
                             valSum: Long)

/** Per-user state: ALL open intervals, not just the latest. Out-of-order
  * events (newer than the watermark but older than the open session) can
  * open an interval BEHIND the current one or bridge two intervals — a
  * single-interval state silently mis-starts such sessions (review
  * finding, round 3).
  */
final case class SessionState(open: List[OpenSession])

/** One closed session. */
final case class SessionRow(user_id: Long, start_s: Long, end_s: Long,
                            n_events: Long, val_sum: Long)

/** Streaming counterpart of the batch gap-sessionization (q47), built on
  * `flatMapGroupsWithState` — the custom-state Structured Streaming surface
  * (SURVEY.md §2.j): per-user open-interval state, sealed by the EVENT-TIME
  * WATERMARK (state bounded by the watermark horizon, never by the corpus).
  *
  * Correctness under disorder: an event merges into every interval within
  * `gap` of it on EITHER side (single-linkage on the time line), so the
  * final intervals are the connected components of the "within gap" graph —
  * exactly the batch definition of a session — for ANY arrival order of
  * events the watermark hasn't expired. An interval is emitted only when
  * `last + gap < watermark`: any event that could still extend or bridge it
  * would have to be older than the watermark, which the engine drops before
  * this function runs. Proven equal to batch q47 (incl. shuffled delivery
  * and checkpoint restart) in SessionStreamSpec.
  *
  * Scale notes: state is keyed on user_id (one shuffle, same key as the
  * batch variant's single exchange); per-key state is the list of currently
  * open intervals — almost always length 1, bounded by the number of
  * sessions a user can have inside one watermark horizon.
  */
object SessionStream {

  /** Session gap — 1800 s, matching the batch q47 operator. */
  val GapS = 1800L

  def sessionize(events: Dataset[SessionEvent],
                 watermark: String = "1 hour"): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  private def update(user: Long, it: Iterator[SessionEvent],
                     state: GroupState[SessionState]): Iterator[SessionRow] = {
    val wmS = Math.floorDiv(state.getCurrentWatermarkMs(), 1000L)
    var intervals = state.getOption.map(_.open).getOrElse(Nil)
    if (!state.hasTimedOut) {
      val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      evs.foreach { e =>
        val ts = Math.floorDiv(e.ts.getTime, 1000L) // unix_timestamp floor
        val v = math.floor(e.value).toLong
        val (touching, rest) = intervals.partition(s =>
          ts >= s.startS - GapS && ts <= s.lastS + GapS)
        val merged = touching.foldLeft(OpenSession(ts, ts, 1L, v)) { (a, s) =>
          OpenSession(math.min(a.startS, s.startS), math.max(a.lastS, s.lastS),
            a.nEvents + s.nEvents, a.valSum + s.valSum)
        }
        intervals = merged :: rest
      }
    }
    // seal everything the watermark has passed: no event the engine still
    // admits (ts >= watermark) can reach an interval with last+gap < wm
    val (closed, open) = intervals.partition(s => s.lastS + GapS < wmS)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessionState(open.sortBy(_.startS)))
      // strictly after both the earliest possible seal point and the
      // current watermark (ms precision)
      state.setTimeoutTimestamp(
        (open.map(_.lastS + GapS).min) * 1000L + 1000L)
    }
    closed.sortBy(s => (s.startS, s.lastS))
      .map(s => SessionRow(user, s.startS, s.lastS, s.nEvents, s.valSum))
      .iterator
  }
}
