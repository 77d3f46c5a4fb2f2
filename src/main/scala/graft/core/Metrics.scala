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

  private[graft] def record(name: String, row: org.apache.spark.sql.Row): Unit =
    row.schema.fieldNames.foreach { f =>
      row.getAs[Any](f) match {
        case n: Number => values.merge(s"$name/$f", n.longValue(), (a, b) => a + b)
        case _ => ()
      }
    }

  def snapshot: Map[String, Long] = values.asScala.toMap

  def get(key: String): Option[Long] = Option(values.get(key))

  def reset(): Unit = values.clear()

  /** Prometheus text exposition (v0.0.4) of the current snapshot — the
    * reference exposes operator metrics to a Prometheus scraper via Flink's
    * reporter config (core/config/FlinkEnv.java:12-23); here the same
    * numbers render as `graft_<observation>{column="<field>"} <value>`.
    * Metric/label names are sanitized to the Prometheus charset.
    */
  def prometheusText: String = {
    def sanitize(s: String): String = s.replaceAll("[^a-zA-Z0-9_]", "_")
    snapshot.toSeq
      .map { case (key, v) =>
        val (obs, field) = key.span(_ != '/')
        (s"graft_${sanitize(obs)}", sanitize(field.drop(1)), v)
      }
      .groupBy(_._1)
      .toSeq
      .sortBy(_._1)
      .map { case (metric, rows) =>
        (s"# TYPE $metric counter" +:
          rows.sortBy(_._2).map { case (_, c, v) => s"""$metric{column="$c"} $v""" })
          .mkString("\n")
      }
      .mkString("", "\n", "\n")
  }

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

/** Minimal Prometheus scrape endpoint over a [[MetricsCollector]]: GET
  * /metrics on the given port serves the text exposition. JDK built-in
  * HttpServer — no dependencies, driver-local (the reference's
  * prometheus reporter port, core/config/FlinkEnv.java:12-23). Call
  * `close()` on shutdown.
  */
final class MetricsEndpoint(collector: MetricsCollector, port: Int) extends AutoCloseable {
  private val server =
    com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(port), 0)
  server.createContext(
    "/metrics",
    (exchange: com.sun.net.httpserver.HttpExchange) => {
      val body = collector.prometheusText.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
      exchange.sendResponseHeaders(200, body.length.toLong)
      val os = exchange.getResponseBody
      try os.write(body)
      finally os.close()
    }
  )
  server.start()

  /** The bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  override def close(): Unit = server.stop(0)
}
