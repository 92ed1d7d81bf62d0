package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Custom-state sessionization (§2.8's stateful-op surface):
  * gap-based user sessions via flatMapGroupsWithState.
  *
  * Batch counterpart (same semantics, SQL-expressible) is
  * queries.Shaping.sessionize (q41) — lag + running-sum gaps-and-islands.
  * The streaming version keeps ONE open session per user in state
  * (bounded memory: state size = O(active users), the property that
  * matters at 100 TB/day), emits a session the moment a later event
  * arrives more than `gapSec` after it ends, and leaves the trailing
  * open session in state (production closes it via timeout; tests can
  * read it as the non-emitted remainder).
  */
object Sessionize {

  case class SessionEvent(user_id: Long, sec: Long)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  def mergeBatch(userId: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession], gapSec: Long)
      : Iterator[ClosedSession] = {
    val sorted = events.map(_.sec).toArray.sorted
    if (sorted.isEmpty) return Iterator.empty
    var open = state.getOption.orNull
    val closed = Seq.newBuilder[ClosedSession]
    for (sec <- sorted) {
      if (open == null) {
        open = OpenSession(sec, sec, 1)
      } else if (sec - open.end > gapSec) {
        closed += ClosedSession(userId, open.start, open.end, open.n)
        open = OpenSession(sec, sec, 1)
      } else if (sec < open.start - gapSec) {
        // cross-batch late arrival older than the open session's reach:
        // it can't merge (the gap backwards exceeds gapSec) — emit it as
        // its own already-closed late session rather than corrupting the
        // open one. (The batch counterpart q41, which sees all events at
        // once, would have sessionized it in order.)
        closed += ClosedSession(userId, sec, sec, 1)
      } else {
        // merge; late-but-mergeable events may extend the session START
        // backwards as well as the end forwards
        open = OpenSession(math.min(open.start, sec),
          math.max(open.end, sec), open.n + 1)
      }
    }
    state.update(open)
    closed.result().iterator
  }

  /** Streaming sessionize: Append-mode closed sessions. */
  def sessionizeStream(events: Dataset[SessionEvent],
      gapSec: Long): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (k, it, st) => mergeBatch(k, it, st, gapSec))
  }
}
