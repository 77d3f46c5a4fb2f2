package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.connectors.CdcSource
import graft.jobs.MongoToKafkaJob

/** End-to-end streaming flagship: file-backed change stream (hash-mod
  * splits, checkpoint = resume token) → fused transformWithState pipeline →
  * memory sink.
  */
class StreamingJobSpec extends SparkSpec {
  import spark.implicits._

  test("MongoToKafka streaming: CDC files flow through the fused pipeline") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("cdc-stream").toString
      // change-log fixture: insert, duplicate insert (same key+ts), update
      // with same payload (op changed → emitted: __op joins the hash
      // composite like the reference), second update with the same op and
      // payload as the first (suppressed), update with new payload, delete
      Files.writeString(
        java.nio.file.Paths.get(s"$dir/batch1.json"),
        Seq(
          """{"op":"insert","db":"d","collection":"c","documentKey":"{\"_id\": 1}","fullDocument":"{\"_id\": 1, \"v\": 10}","updatedFields":null,"eventTime":"2024-01-01T00:00:00.000Z"}""",
          """{"op":"insert","db":"d","collection":"c","documentKey":"{\"_id\": 1}","fullDocument":"{\"_id\": 1, \"v\": 10}","updatedFields":null,"eventTime":"2024-01-01T00:00:00.000Z"}""",
          """{"op":"update","db":"d","collection":"c","documentKey":"{\"_id\": 1}","fullDocument":"{\"_id\": 1, \"v\": 10}","updatedFields":null,"eventTime":"2024-01-01T00:01:00.000Z"}""",
          """{"op":"update","db":"d","collection":"c","documentKey":"{\"_id\": 1}","fullDocument":"{\"_id\": 1, \"v\": 10}","updatedFields":null,"eventTime":"2024-01-01T00:01:30.000Z"}""",
          """{"op":"update","db":"d","collection":"c","documentKey":"{\"_id\": 1}","fullDocument":"{\"_id\": 1, \"v\": 20}","updatedFields":null,"eventTime":"2024-01-01T00:02:00.000Z"}""",
          """{"op":"delete","db":"d","collection":"c","documentKey":"{\"_id\": 2}","fullDocument":null,"updatedFields":null,"eventTime":"2024-01-01T00:03:00.000Z"}""",
          // malformed: fullDocument has no _id → schema gate must dead-letter
          // it, not drop it (r3 discarded the streaming DLQ)
          """{"op":"insert","db":"d","collection":"c","documentKey":"{\"_id\": 3}","fullDocument":"{\"v\": 99}","updatedFields":null,"eventTime":"2024-01-01T00:04:00.000Z"}"""
        ).mkString("\n"))
      val cdc = CdcSource.multi(spark, dir, numSplits = 2)
      // a processing-time TTL would make the two state stores diverge —
      // rejected up front; startStreaming is the TTL'd face
      val ttlErr = intercept[IllegalArgumentException] {
        MongoToKafkaJob.buildStreaming(cdc, ttlMs = 60000)
      }
      assert(ttlErr.getMessage.contains("startStreaming"))
      val (out, dlq) = MongoToKafkaJob.buildStreaming(cdc, ttlMs = 0)
      val q = out.writeStream.format("memory").queryName("m2k_stream").outputMode("append").start()
      val qDlq = dlq.writeStream.format("memory").queryName("m2k_dlq").outputMode("append").start()
      try {
        q.processAllAvailable()
        qDlq.processAllAvailable()
        // the _id-less document landed in the DLQ with the schema error code
        val dead = spark.table("m2k_dlq")
          .select($"errorType", $"rawEvent").as[(String, String)].collect()
        assert(dead.toSeq === Seq((graft.model.ErrorCodes.SchemaViolation, """{"v": 99}""")))
        // exact set equality also proves the dead-lettered key "3" never
        // reaches the good stream
        val rows = spark.table("m2k_stream")
          .select($"operation", $"primaryKey", get_json_object($"payloadJson", "$.v").as("v"))
          .as[(String, String, Option[String])].collect().toSet
        // duplicate insert dropped; first update emitted (op changed even
        // though payload didn't); second same-op-same-payload update
        // suppressed; changed update and delete flow through
        assert(rows === Set(
          ("insert", "1", Some("10")),
          ("update", "1", Some("10")),
          ("update", "1", Some("20")),
          ("delete", "2", None)))
        // metadata decoration + trace id stamped
        val meta = spark.table("m2k_stream")
          .select(element_at($"metadata", "stage.pre-sink.taskName")).as[String].collect()
        assert(meta.forall(_ == "MongoToKafka"))
      } finally { q.stop(); qDlq.stop() }
    } finally spark.conf.unset(key)
  }

  test("MongoToKafka single-pass streaming: one pipeline fans out to good + DLQ paths") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("cdc-single").toString
      Files.writeString(
        java.nio.file.Paths.get(s"$dir/batch1.json"),
        Seq(
          """{"op":"insert","db":"d","collection":"c","documentKey":"{\"_id\": 1}","fullDocument":"{\"_id\": 1, \"v\": 10}","updatedFields":null,"eventTime":"2024-01-01T00:00:00.000Z"}""",
          """{"op":"insert","db":"d","collection":"c","documentKey":"{\"_id\": 1}","fullDocument":"{\"_id\": 1, \"v\": 10}","updatedFields":null,"eventTime":"2024-01-01T00:00:00.000Z"}""",
          """{"op":"insert","db":"d","collection":"c","documentKey":"{\"_id\": 3}","fullDocument":"{\"v\": 99}","updatedFields":null,"eventTime":"2024-01-01T00:04:00.000Z"}"""
        ).mkString("\n"))
      val out = Files.createTempDirectory("cdc-single-out").toString
      val q = MongoToKafkaJob.startStreaming(
        CdcSource.multi(spark, dir, numSplits = 2),
        outPath = s"$out/good", dlqPath = s"$out/dlq",
        checkpoint = s"$out/ckpt", ttlMs = 0)
      try {
        q.processAllAvailable()
        val good = spark.read.parquet(s"$out/good")
          .select($"primaryKey", get_json_object($"payloadJson", "$.v")).as[(String, String)].collect().toSet
        assert(good === Set(("1", "10"))) // dup dropped, _id-less routed away
        val dead = spark.read.parquet(s"$out/dlq")
          .select($"errorType", $"rawEvent").as[(String, String)].collect()
        assert(dead.toSeq === Seq((graft.model.ErrorCodes.SchemaViolation, """{"v": 99}""")))
      } finally q.stop()
    } finally spark.conf.unset(key)
  }
}
