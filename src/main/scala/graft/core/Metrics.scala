package graft.core

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Harvests the Observation-API metrics that FilterInterceptor /
  * OnlineObserver / LatencyDetector attach via `df.observe(name, ...)` —
  * the engine's replacement for the reference's per-operator metric groups
  * (core/metric/Metrics.java:9-25, scope/<s>/operator/<o>/<name>).
  *
  * Metric key shape: `<observation>/<column>` (e.g. `filter.ops/dropped`,
  * `observer.health/null_payloads`, `latency.e2e/alert_count`) — last
  * observed value wins, counters accumulate per completed execution/batch.
  */
class MetricsCollector extends Serializable {
  private val values = new ConcurrentHashMap[String, Long]()

  private[core] def record(name: String, row: org.apache.spark.sql.Row): Unit =
    row.schema.fieldNames.foreach { f =>
      row.getAs[Any](f) match {
        case n: Number => values.merge(s"$name/$f", n.longValue(), (a, b) => a + b)
        case _ => ()
      }
    }

  def snapshot: Map[String, Long] = values.asScala.toMap

  def get(key: String): Option[Long] = Option(values.get(key))

  def reset(): Unit = values.clear()

  /** Batch harvesting: register on the session; fires per completed action. */
  def listener: QueryExecutionListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) => record(name, row) }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Streaming harvesting: observed metrics arrive per micro-batch progress. */
  def streamingListener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit =
      event.progress.observedMetrics.asScala.foreach { case (name, row) => record(name, row) }
    override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}

object MetricsCollector {

  /** Create a collector and attach both batch and streaming listeners. */
  def attach(spark: SparkSession): MetricsCollector = {
    val c = new MetricsCollector
    spark.listenerManager.register(c.listener)
    spark.streams.addListener(c.streamingListener)
    c
  }
}
