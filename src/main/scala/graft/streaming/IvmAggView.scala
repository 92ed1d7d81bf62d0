package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming aggregate-view maintenance with RETRACTIONS — the
  * transformWithState twin of batch q481 (Governance.ivmAggRetract):
  * the view (count, sum) per group key is maintained from a stream of
  * SIGNED delta rows (DBToaster/Materialize semantics — a delete is an
  * insert with multiplicity −1), with groups whose maintained count
  * reaches zero REMOVED from state (the retraction edge case naive IVM
  * gets wrong; the emitted n=0 row is the changelog tombstone a
  * downstream sink turns into a DELETE).
  *
  * Output is a per-(key, micro-batch) changelog row carrying the
  * post-batch view plus a per-group version number, so a consumer (or
  * the parity spec) can reconstruct "latest view" from an append-only
  * sink without relying on arrival order. `ver` is monotone within a
  * group lifetime; a group deleted (n=0, state cleared) and later
  * re-created restarts at 1 — ordering across lifetimes is the sink
  * log's job, exactly as in production changelog consumers.
  *
  * Lifecycle edges (r9 ADVICE): a micro-batch whose deltas net to
  * zero for a group that never existed emits NOTHING and creates no
  * state (a tombstone for an absent key would feed a DELETE for a row
  * the sink never had); a retraction that would drive a group's count
  * negative fails the query — the changelog is malformed and any
  * clamped continuation would diverge from the source.
  *
  * 100 TB stance: state is O(live groups) — the view itself, nothing
  * row-shaped; each micro-batch costs O(delta + touched groups), the
  * same bound q481's batch merge proves (the delta aggregate happens
  * map-side inside the state shuffle). Exactly-once across restarts
  * rides the state-store checkpoint — asserted by IvmAggViewSpec,
  * which replays the second delta chunk in a NEW stream run over the
  * same checkpoint and requires the final view to equal the batch
  * query's maintained columns bit-for-bit.
  */
object IvmAggView {

  /** Signed delta: dn = +1 insert / −1 retract, dc = signed measure. */
  final case class Delta(key: String, dn: Long, dc: Long)

  /** Post-batch view row; n == 0 is a tombstone (group removed). */
  final case class ViewRow(key: String, ver: Long, n: Long, sc: Long)

  private final case class ViewState(ver: Long, n: Long, sc: Long)

  private class Processor
      extends StatefulProcessor[String, Delta, ViewRow] {
    @transient private var view: ValueState[ViewState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      view = getHandle.getValueState[ViewState]("view",
        Encoders.product[ViewState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Delta],
        timerValues: TimerValues): Iterator[ViewRow] = {
      var dn = 0L
      var dc = 0L
      rows.foreach { d => dn += d.dn; dc += d.dc }
      val existed = view.exists()
      val prev = if (existed) view.get() else ViewState(0L, 0L, 0L)
      val next = ViewState(prev.ver + 1, prev.n + dn, prev.sc + dc)
      // malformed changelog: more retractions than the group ever had
      // inserts. Fail the query loudly — clamping would store a view
      // the deltas don't support, and a downstream DELETE/UPSERT sink
      // would silently diverge from the source.
      if (next.n < 0L) throw new IllegalStateException(
        s"IvmAggView: group '$key' retracted below zero " +
          s"(count ${prev.n} + delta $dn = ${next.n})")
      // net-zero batch for a group that never existed (e.g. +1 and −1
      // in one micro-batch): a no-op, NOT a tombstone — emitting a
      // DELETE for an absent key corrupts idempotent-upsert sinks
      if (!existed && next.n == 0L) Iterator.empty
      else {
        if (next.n == 0L) view.clear() // group removed; emit tombstone
        else view.update(next)
        Iterator.single(ViewRow(key, next.ver, next.n,
          if (next.n == 0L) 0L else next.sc))
      }
    }
  }

  /** Apply to a (streaming or batch) delta Dataset. Append mode: one
    * changelog row per touched group per micro-batch. */
  def run(deltas: Dataset[Delta]): Dataset[ViewRow] = {
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Append())
  }
}
