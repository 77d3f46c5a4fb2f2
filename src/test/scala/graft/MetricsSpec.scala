package graft

import org.apache.spark.sql.functions._
import graft.core.MetricsCollector
import graft.patterns.{FilterInterceptor, LatencyDetector, OnlineObserver, QualityCheck}

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("MetricsCollector harvests filter/observer/latency observation metrics") {
    val collector = new MetricsCollector
    spark.listenerManager.register(collector.listener)
    try {
      val df = Seq((1, 10.0), (2, 200.0), (3, 300.0)).toDF("id", "v")
        .withColumn("eventTime", lit("2024-01-01 00:00:00").cast("timestamp"))
      val piped = df
        .transform(FilterInterceptor("gt100", col("v") > 100))
        .transform(OnlineObserver("checks", Seq(QualityCheck("big", col("v") > 250))))
        .transform(LatencyDetector("lat", "eventTime", thresholdMs = 1,
          clock = lit("2024-01-01 00:00:01").cast("timestamp")))
      piped.collect() // action triggers QueryExecutionListener (async)
      val deadline = System.currentTimeMillis() + 10000
      while (collector.get("filter.gt100/dropped").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(collector.get("filter.gt100/in") === Some(3L))
      assert(collector.get("filter.gt100/passed") === Some(2L))
      assert(collector.get("filter.gt100/dropped") === Some(1L))
      assert(collector.get("observer.checks/total") === Some(2L))
      assert(collector.get("observer.checks/big") === Some(1L))
      assert(collector.get("latency.lat/alert_count") === Some(2L))
      assert(collector.get("latency.lat/e2e_latency_max_ms") === Some(1000L))
    } finally spark.listenerManager.unregister(collector.listener)
  }

  test("MetricsCollector harvests streaming observation metrics per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val collector = new MetricsCollector
    val listener = collector.streamingListener
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Int]
      val observed = mem.toDF()
        .transform(OnlineObserver("stream_health", Seq(QualityCheck("big", col("value") > 10))))
      val q = observed.writeStream.format("memory").queryName("metrics_stream").outputMode("append").start()
      try {
        mem.addData(1, 5, 20)
        q.processAllAvailable()
        mem.addData(30)
        q.processAllAvailable()
        val deadline = System.currentTimeMillis() + 10000
        while (collector.get("observer.stream_health/total") != Some(4L) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        // counters accumulate across micro-batches
        assert(collector.get("observer.stream_health/total") === Some(4L))
        assert(collector.get("observer.stream_health/big") === Some(2L))
      } finally q.stop()
    } finally spark.streams.removeListener(listener)
  }

  test("Prometheus exposition: text format and localhost scrape endpoint") {
    val collector = new MetricsCollector
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](3L, 1L),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("in", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dropped", org.apache.spark.sql.types.LongType))))
    collector.record("filter.ops", row)
    val text = collector.prometheusText
    assert(text.contains("# TYPE graft_filter_ops counter"))
    assert(text.contains("""graft_filter_ops{column="in"} 3"""))
    assert(text.contains("""graft_filter_ops{column="dropped"} 1"""))
    // one TYPE line per metric family, even with several labeled series
    assert(text.linesIterator.count(_.startsWith("# TYPE graft_filter_ops ")) === 1)
    val ep = new graft.core.MetricsEndpoint(collector, port = 0)
    try {
      val url = java.net.URI.create(s"http://127.0.0.1:${ep.boundPort}/metrics").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(conn.getResponseCode === 200)
      assert(body === text)
    } finally ep.close()
  }
}
