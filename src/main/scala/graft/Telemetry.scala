package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine telemetry: per-action metric capture via
  * `QueryExecutionListener` — the operational layer a pipeline needs at
  * scale (is tonight's run shuffling 10× yesterday's bytes? which mart
  * rebuild spilled?). Register once per session:
  *
  * {{{
  * val t = new Telemetry.MetricsCapture
  * spark.listenerManager.register(t)
  * // ... run jobs ...
  * t.snapshot  // (action, durationNs, metricName -> summed value)
  * }}}
  *
  * Metrics are summed per name across the executed plan's nodes
  * (`numOutputRows`, `dataSize`, `spillSize`, shuffle records, ...) —
  * coarse by design: the per-query fingerprint that feeds a regression
  * dashboard, not a profiler. Listener callbacks are delivered async on
  * the listener bus; readers poll [[MetricsCapture.snapshot]]. Capture
  * cost is one tree walk per completed action on the driver — nothing
  * touches the executors, safe to leave on in production.
  */
object Telemetry {

  final case class ActionMetrics(action: String, durationNs: Long,
      metrics: Map[String, Long], failed: Boolean)

  final class MetricsCapture extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[ActionMetrics]

    private def summed(qe: QueryExecution): Map[String, Long] = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      val agg = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      // AQE nodes hold their materialized plans OUTSIDE `children`
      // (AdaptiveSparkPlanExec.executedPlan, QueryStageExec.plan) — a
      // plain tree walk sees only the adaptive shell and no metrics
      def walk(p: SparkPlan): Unit = {
        p.metrics.foreach { case (name, m) =>
          if (m.value > 0) agg(name) += m.value
        }
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case _ => p.children.foreach(walk)
        }
      }
      walk(qe.executedPlan)
      agg.toMap
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      buf.add(ActionMetrics(funcName, durationNs, summed(qe),
        failed = false))

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      buf.add(ActionMetrics(funcName, 0L, Map.empty, failed = true))

    /** All captures so far, oldest first. */
    def snapshot: Seq[ActionMetrics] = buf.iterator.asScala.toSeq

    def clear(): Unit = buf.clear()
  }
}
