package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.connectors.{EsSink, KafkaConnectors, UpsertSink}
import graft.model.StreamEnvelop

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def mkEnv(op: String, pk: String, payload: String, tsSec: Long): StreamEnvelop =
    StreamEnvelop(op, "src", payload, new Timestamp(tsSec * 1000), new Timestamp(tsSec * 1000), s"t-$pk-$tsSec", pk, Map.empty)

  test("UpsertSink.writer maintains the keyed table across micro-batches (foreachBatch)") {
    implicit val sc = spark.sqlContext
    val path = Files.createTempDirectory("upsert").toString + "/table"
    val mem = MemoryStream[StreamEnvelop]
    val q = mem.toDS().toDF().writeStream
      .foreachBatch(UpsertSink.writer(path) _)
      .outputMode("append").start()
    try {
      mem.addData(mkEnv("insert", "a", """{"v":1}""", 1), mkEnv("insert", "b", """{"v":2}""", 2))
      q.processAllAvailable()
      assert(UpsertSink.readTable(spark, path).count() === 2)
      // replace a, delete b, insert c — across a later batch
      mem.addData(
        mkEnv("update", "a", """{"v":10}""", 3),
        mkEnv("DELETE", "b", null, 4),
        mkEnv("insert", "c", """{"v":3}""", 5))
      q.processAllAvailable()
      val t = UpsertSink.readTable(spark, path)
        .select("_id", "doc").as[(String, String)].collect().toMap
      assert(t === Map("a" -> """{"v":10}""", "c" -> """{"v":3}"""))
    } finally q.stop()
  }

  test("Dlq.replay: recovered envelopes flow, still-broken events stay dead") {
    val clock = org.apache.spark.sql.functions.lit("2024-07-01 00:00:00").cast("timestamp")
    val dlq = Seq(
      ("PARSING_ERROR", "bad", "src", new Timestamp(0), """{"operation":"insert","source":"s","primaryKey":"k1"}""", null.asInstanceOf[String]),
      ("PARSING_ERROR", "bad", "src", new Timestamp(0), "still not json", null.asInstanceOf[String])
    ).toDF(graft.core.Dlq.columns: _*)
    val (recovered, stillDead) = graft.core.Dlq.replay(dlq, clock)
    assert(recovered.select("primaryKey").as[String].collect() === Array("k1"))
    assert(stillDead.count() === 1)
    assert(stillDead.select("source").as[String].head() === "dlq-replay")
  }

  test("EsSink.prepare: null trace ids skipped, duplicate doc ids collapsed") {
    val df = Seq(
      mkEnv("i", "a", "{}", 1).copy(traceId = "t1"),
      mkEnv("i", "b", "{}", 2).copy(traceId = "t1"), // same doc id -> one doc
      mkEnv("i", "c", "{}", 3).copy(traceId = null)
    ).toDF()
    val out = EsSink.prepare(df)
    assert(out.count() === 1)
    assert(out.select("_doc_id").as[String].head() === "t1")
  }

  test("Kafka keyedProjection roundtrips the envelope through JSON") {
    val df = Seq(mkEnv("insert", "k1", """{"v":1}""", 1).copy(metadata = Map("m" -> "x"))).toDF()
    val proj = KafkaConnectors.keyedProjection(df, compacted = false)
    val (key, value) = proj.as[(Array[Byte], Array[Byte])].head()
    assert(new String(key) === "k1")
    val parsed = org.apache.spark.sql.functions.from_json(
      org.apache.spark.sql.functions.lit(new String(value)),
      graft.parsers.EnvelopeParser.envelopeSchema)
    val row = spark.range(1).select(parsed.as("e")).select("e.primaryKey", "e.operation").head()
    assert(row.getString(0) === "k1" && row.getString(1) === "insert")
  }
}
