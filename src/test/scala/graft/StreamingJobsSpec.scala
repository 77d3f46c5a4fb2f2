package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.jobs.{OrderPaymentJoinJob, UserSessionAnalysisJob, UserStateMaterializeJob}
import graft.model.StreamEnvelop

/** Streaming faces of the remaining jobs. */
class StreamingJobsSpec extends SparkSpec {
  import spark.implicits._

  private def mkEnv(op: String, pk: String, payload: String, tsSec: Long, src: String = "src"): StreamEnvelop =
    StreamEnvelop(op, src, payload, new Timestamp(tsSec * 1000), new Timestamp(tsSec * 1000), s"t-$pk-$tsSec", pk, Map.empty)

  test("UserStateMaterialize streaming: compacted changelog with tombstones") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[StreamEnvelop]
      val out = UserStateMaterializeJob.buildStreaming(mem.toDS(), ttlMs = 0)
      val q = out.writeStream.format("memory").queryName("mat_stream").outputMode("append").start()
      try {
        mem.addData(mkEnv("insert", "u1", """{"v":1}""", 1))
        q.processAllAvailable()
        mem.addData(mkEnv("delete", "u1", null, 2))
        q.processAllAvailable()
        val rows = spark.table("mat_stream")
          .select($"key".cast("string"), $"value".isNull).as[(String, Boolean)].collect().toSet
        assert(rows === Set(("u1", false), ("u1", true))) // INSERT then tombstone
      } finally q.stop()
    } finally spark.conf.unset(key)
  }

  test("UserSessionAnalysis streaming: closed sessions become SESSION_CLOSED envelopes") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamEnvelop]
    val out = UserSessionAnalysisJob.buildStreaming(mem.toDS().toDF(), gap = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sess_stream").outputMode("append").start()
    try {
      mem.addData(mkEnv("login", "u1", "{}", 100), mkEnv("click", "u1", "{}", 104))
      q.processAllAvailable()
      mem.addData(mkEnv("x", "u1", "{}", 500)) // advances watermark, closes session
      q.processAllAvailable()
      mem.addData(mkEnv("y", "u1", "{}", 900))
      q.processAllAvailable()
      val rows = spark.table("sess_stream")
        .filter($"operation" === "SESSION_CLOSED")
        .select(get_json_object($"payloadJson", "$.actions"), element_at($"metadata", "eventCount"))
        .as[(String, String)].collect()
      assert(rows.contains(("login,click", "2")))
    } finally q.stop()
  }

  test("OrderPaymentJoin streaming: payment payload lands in order metadata") {
    implicit val sc = spark.sqlContext
    val orders = MemoryStream[StreamEnvelop]
    val payments = MemoryStream[StreamEnvelop]
    val out = OrderPaymentJoinJob.buildStreaming(
      orders.toDS().toDF(), payments.toDS().toDF(), ttlMs = 60 * 1000, delay = "2 minutes")
    val q = out.writeStream.format("memory").queryName("opj_stream").outputMode("append").start()
    try {
      orders.addData(mkEnv("insert", "o1", """{"amount":100}""", 100, "orders"))
      payments.addData(mkEnv("insert", "o1", """{"status":"PAID"}""", 110, "payments"))
      q.processAllAvailable()
      val got = spark.table("opj_stream")
        .select($"primaryKey", element_at($"metadata", "paymentPayload"), element_at($"metadata", "paymentSource"))
        .as[(String, String, String)].collect()
      assert(got.contains(("o1", """{"status":"PAID"}""", "payments")))
    } finally q.stop()
  }
}
