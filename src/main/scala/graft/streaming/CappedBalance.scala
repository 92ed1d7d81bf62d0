package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** q176's capped running balance (running sum floored at zero) as a
  * CONTINUOUS stream — built on Spark 4's `transformWithState`
  * arbitrary-state API (the successor to mapGroupsWithState: typed
  * per-key state handles, TTL, timers). State per user is one
  * (n_events, balance) pair — O(active users), independent of stream
  * length — and the fold order inside each micro-batch is pinned to
  * the (tsMicros, eventId) total order, so a stream fed batches in
  * time order produces exactly the batch fold's balances
  * (NewsStreamSpec asserts equality against a plain-Scala fold).
  *
  * The floor is why this NEEDS arbitrary state: max(0,·) doesn't
  * distribute over +, so no windowed/aggregate streaming form exists —
  * the same reason q176's batch form is a higher-order fold. */
object CappedBalance {

  /** One signed ledger delta. */
  final case class Delta(userId: Long, tsMicros: Long, eventId: Long,
    cents: Long)

  /** Continuously-updated per-user balance. */
  final case class Balance(userId: Long, nEvents: Long,
    cappedBalance: Long)

  private class Processor
      extends StatefulProcessor[Long, Delta, Balance] {
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("bal",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Delta],
        timerValues: TimerValues): Iterator[Balance] = {
      // within-batch arrival order is not the ledger order; pin it
      val sorted = rows.toSeq.sortBy(d => (d.tsMicros, d.eventId))
      var (n, bal) =
        if (state.exists()) state.get() else (0L, 0L)
      sorted.foreach { d =>
        n += 1
        bal = math.max(0L, bal + d.cents)
      }
      state.update((n, bal))
      Iterator.single(Balance(key, n, bal))
    }
  }

  /** Apply to a (possibly streaming) Dataset[Delta]. Update mode: one
    * Balance row per touched user per micro-batch; the latest row per
    * user (highest nEvents) is the current balance. */
  def run(deltas: Dataset[Delta]): Dataset[Balance] = {
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.userId)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())
  }
}
