package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for streaming sessionization (the `events` harness
  * schema, projected).
  */
final case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp,
                              value: Double)

/** Open-session state kept per user between micro-batches. All times are
  * whole epoch seconds (the same `unix_timestamp` floor as the batch
  * q47 operator, so batch and streaming sessions agree exactly).
  */
final case class OpenSession(startS: Long, lastS: Long, nEvents: Long,
                             valSum: Long)

/** One closed session. */
final case class SessionRow(user_id: Long, start_s: Long, end_s: Long,
                            n_events: Long, val_sum: Long)

/** Streaming counterpart of the batch gap-sessionization (q47), built on
  * `flatMapGroupsWithState` — the custom-state Structured Streaming surface
  * (SURVEY.md §2.j): per-user open-session state, closed either by a
  * within-batch gap or by an EVENT-TIME TIMEOUT once the watermark passes
  * `last_event + gap` (so state is bounded by the watermark horizon, never
  * by the corpus — a user who goes quiet costs one state row until the
  * watermark sweeps them out).
  *
  * Scale notes: state is keyed on user_id (one shuffle, same key as the
  * batch variant's single exchange); per-key state is one constant-size
  * [[OpenSession]]. Events inside a micro-batch are sorted per user
  * (ts, event_id) before folding — identical tie-breaks to q47's window
  * ORDER BY. Cross-batch order is event-time order by construction:
  * anything older than the watermark was already timed out, and Spark
  * delivers each batch's rows for a key in one group call.
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
                     state: GroupState[OpenSession]): Iterator[SessionRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
    if (state.hasTimedOut) {
      // watermark passed lastS + gap: the open session can never grow again
      state.getOption.foreach(s =>
        out += SessionRow(user, s.startS, s.lastS, s.nEvents, s.valSum))
      state.remove()
    } else {
      val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption.orNull
      evs.foreach { e =>
        val ts = Math.floorDiv(e.ts.getTime, 1000L) // unix_timestamp floor
        val v = math.floor(e.value).toLong
        if (cur == null) cur = OpenSession(ts, ts, 1L, v)
        else if (ts - cur.lastS > GapS) {
          out += SessionRow(user, cur.startS, cur.lastS, cur.nEvents, cur.valSum)
          cur = OpenSession(ts, ts, 1L, v)
        } else cur = OpenSession(cur.startS, math.max(cur.lastS, ts),
          cur.nEvents + 1L, cur.valSum + v)
      }
      if (cur != null) {
        state.update(cur)
        // fire strictly after the gap closes; ms precision
        state.setTimeoutTimestamp((cur.lastS + GapS) * 1000L + 1L)
      }
    }
    out.iterator
  }
}
