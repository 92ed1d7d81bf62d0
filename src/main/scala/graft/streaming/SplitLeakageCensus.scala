package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of batch q486 (TrainingData.splitLeakage): maintain
  * the train/eval split-leakage pair census AS PAIRS ARRIVE — the
  * ingest-time form of the contamination audit, where near-dup pairs
  * stream out of the LSH index (StreamingNearDup's emission shape) and
  * the census must be current without re-scanning history.
  *
  * Each pair is tagged with the SAME hash60-based split and pair-class
  * derivation as the batch query (TrainingData.splitTag — shared code,
  * not a copy), then a transformWithState processor keyed by
  * pair_class keeps one running count per class. Output is a
  * per-(class, micro-batch) changelog row with the post-batch
  * cumulative count and a version number, the IvmAggView contract —
  * "latest view" is reconstructible from an append-only sink, and
  * exactly-once across restarts rides the state-store checkpoint
  * (spec-asserted by replaying the second pair chunk in a new stream
  * run over the same checkpoint and requiring equality with the batch
  * q486 census, micro shares included).
  *
  * 100 TB stance: state is O(pair classes) = 3 rows — nothing scales
  * with the corpus; per micro-batch cost is O(arriving pairs), with
  * the per-class delta aggregate happening map-side inside the state
  * shuffle (groupByKey on a 3-value key; the count-per-class combine
  * is associative so Spark's partial aggregation bounds the shuffle
  * at 3 rows per map task).
  */
object SplitLeakageCensus {

  /** One near-dup pair as emitted by the (streaming) dedup index. */
  final case class PairRow(doc_a: Long, doc_b: Long)

  /** Post-batch census row; n_pairs is cumulative for the class. */
  final case class CensusRow(pair_class: String, ver: Long, n_pairs: Long)

  private final case class CensusState(ver: Long, n: Long)

  private class Processor
      extends StatefulProcessor[String, String, CensusRow] {
    @transient private var st: ValueState[CensusState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CensusState]("census",
        Encoders.product[CensusState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[String],
        timerValues: TimerValues): Iterator[CensusRow] = {
      var d = 0L
      rows.foreach(_ => d += 1L)
      val prev = if (st.exists()) st.get() else CensusState(0L, 0L)
      val next = CensusState(prev.ver + 1, prev.n + d)
      st.update(next)
      Iterator.single(CensusRow(key, next.ver, next.n))
    }
  }

  /** Apply to a (streaming or batch) pair Dataset. Append mode: one
    * changelog row per touched class per micro-batch. */
  def run(pairs: Dataset[PairRow]): Dataset[CensusRow] = {
    import pairs.sparkSession.implicits._
    val tag = graft.queries.TrainingData.splitTag _
    pairs.toDF()
      .select(when(tag(col("doc_a")) === tag(col("doc_b")),
          concat(tag(col("doc_a")), lit("-"), tag(col("doc_b"))))
        .otherwise(lit("cross-split")).as("pair_class"))
      .as[String]
      .groupByKey(identity)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Append())
  }
}
