package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming trending-terms score: per-term exponentially time-decayed
  * hit weight (the "what is hot NOW" signal a corpus-ingest dashboard
  * ranks by), maintained continuously with Spark 4's
  * `transformWithState`.
  *
  * Semantics: a hit at time t adds 1.0; an existing weight w observed
  * Δt after its last update first decays to w·2^(−Δt/halfLife). The
  * weight is carried in INTEGER micro-units and each decay step is
  * `round`-quantized, so the fold is exact integer state — a stream
  * fed batches in time order produces BIT-IDENTICAL weights to a
  * plain fold over the same hits (spec-asserted), and replays across
  * restarts cannot drift. Within a micro-batch the fold order is
  * pinned to (tsMicros, hitId), the same total-order contract the
  * other streaming operators declare.
  *
  * Scale stance: state is one (lastTs, weight, hits) triple per
  * DISTINCT term — O(vocabulary), independent of stream length; for
  * unbounded vocabularies put the CMS heavy-hitter prefilter (q61's
  * sketch) in front so only candidate terms reach keyed state. Top-k
  * selection is a batch query over the update sink (rank by
  * weightMicro), not stream-side.
  */
object DecayedTrends {

  /** One term occurrence. */
  final case class TermHit(term: String, tsMicros: Long, hitId: Long)

  /** Continuously-updated decayed weight (1 hit = 1_000_000). */
  final case class TermWeight(term: String, lastTsMicros: Long,
    weightMicro: Long, hits: Long)

  /** One decay-then-add step; exposed so the spec folds the identical
    * arithmetic. */
  def step(weightMicro: Long, lastTs: Long, ts: Long,
      halfLifeMicros: Long): Long = {
    val decayed =
      if (weightMicro == 0L) 0L
      else math.round(weightMicro *
        math.pow(0.5, (ts - lastTs).toDouble / halfLifeMicros))
    decayed + 1000000L
  }

  private class Processor(halfLifeMicros: Long)
      extends StatefulProcessor[String, TermHit, TermWeight] {
    @transient private var state: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long, Long)]("w",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TermHit],
        timerValues: TimerValues): Iterator[TermWeight] = {
      val sorted = rows.toSeq.sortBy(h => (h.tsMicros, h.hitId))
      var (lastTs, w, n) =
        if (state.exists()) state.get() else (Long.MinValue, 0L, 0L)
      sorted.foreach { h =>
        w = step(w, lastTs, h.tsMicros, halfLifeMicros)
        lastTs = h.tsMicros
        n += 1
      }
      state.update((lastTs, w, n))
      Iterator.single(TermWeight(key, lastTs, w, n))
    }
  }

  /** Apply to a (possibly streaming) Dataset[TermHit]. Update mode:
    * one TermWeight row per touched term per micro-batch; the latest
    * row per term (highest hits) is the current score. */
  def run(hits: Dataset[TermHit],
      halfLifeMicros: Long): Dataset[TermWeight] = {
    import hits.sparkSession.implicits._
    hits.groupByKey(_.term)
      .transformWithState(new Processor(halfLifeMicros),
        TimeMode.None(), OutputMode.Update())
  }
}
