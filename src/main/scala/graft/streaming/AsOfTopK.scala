package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming as-of TOP-K attribution (the ingest-time counterpart of
  * batch q474: for every purchase, the last K clicks at-or-before it,
  * rank-preserved — multi-touch attribution at the stream edge).
  *
  * State per user is a RING of the K most recent clicks — O(K) per
  * active user, the bounded-memory property that matters at
  * 100 TB/day; the batch plan's per-user sequence numbers and
  * union-sweep are unnecessary here because arrival order IS the
  * sequence. Each micro-batch's events are processed in event-time
  * order ((ts, clicks-first, event_id) — the batch family's inclusive
  * ≤ tie-break), purchases emit attributions for whatever clicks are
  * buffered (fewer than K prior clicks ⇒ fewer ranks, same as the
  * batch drop rule), and the buffer persists across batches and
  * restarts through the checkpoint.
  *
  * In-order contract: like every as-of operator, correctness needs
  * per-user event-time order ACROSS batches (in production the source
  * is watermark-sorted or replayed per partition in order; the spec
  * drives time-split batches). A click arriving after a purchase with
  * a later ts attributes only subsequent purchases — the standard
  * streaming-late-data caveat, same as dropDuplicatesWithinWatermark.
  */
object AsOfTopK {

  case class MixedEvent(user_id: Long, tsus: Long, event_id: Long,
      is_click: Boolean)
  case class ClickRef(tsus: Long, event_id: Long)
  case class ClickWindow(clicks: Seq[ClickRef])
  case class Attribution(purchase_id: Long, user_id: Long,
      rank_back: Int, click_id: Long, gap_us: Long)

  def mergeBatch(userId: Long, events: Iterator[MixedEvent],
      state: GroupState[ClickWindow], k: Int): Iterator[Attribution] = {
    // event-time order, clicks before simultaneous purchases (the
    // inclusive ≤ bound), event_id as the final tie
    val sorted = events.toArray
      .sortBy(e => (e.tsus, !e.is_click, e.event_id))
    var buf = state.getOption.map(_.clicks.toVector)
      .getOrElse(Vector.empty[ClickRef])
    val out = Seq.newBuilder[Attribution]
    sorted.foreach { e =>
      if (e.is_click)
        buf = (buf :+ ClickRef(e.tsus, e.event_id)).takeRight(k)
      else {
        var rank = 1
        buf.reverseIterator.foreach { c =>
          out += Attribution(e.event_id, userId, rank, c.event_id,
            e.tsus - c.tsus)
          rank += 1
        }
      }
    }
    state.update(ClickWindow(buf))
    out.result().iterator
  }

  /** Append-mode attributions; K most recent clicks per user in
    * checkpointed state. */
  def attributeStream(events: Dataset[MixedEvent],
      k: Int): Dataset[Attribution] = {
    implicit val outEnc = Encoders.product[Attribution]
    implicit val stateEnc = Encoders.product[ClickWindow]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickWindow, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (u, it, st) => mergeBatch(u, it, st, k))
  }
}
