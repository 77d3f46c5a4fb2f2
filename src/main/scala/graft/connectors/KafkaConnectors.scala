package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink builders.
  * Option plumbing mirrors the reference:
  *  - source (connector/kafka/KafkaSourceBuilder.java:24-49): committed
  *    offsets reset LATEST, `isolation.level=read_committed` iff delivery
  *    mode is exactly-once, value-only string deserialization
  *  - sink (connector/kafka/KafkaSinkBuilder.java:28-198): key = primaryKey
  *    bytes, at-least-once default, acks=all + snappy + 50 ms linger,
  *    compacted mode emits a tombstone (null value) for DELETE operations
  *
  * Exactly-once: Spark's Kafka sink has no producer transactions; the
  * effective guarantee here is checkpointed at-least-once + idempotent keyed
  * writes + compaction — which is what the reference itself recommends as the
  * default (README.md:69). For transaction-grade exactly-once APPENDS
  * (KafkaSinkBuilder.java:87-109's transactional mode — no key required,
  * zombie writers fenced, consumers see committed data only) use
  * [[TxnLogSink]]: the same epoch-fenced two-phase commit, expressed as an
  * atomic per-(queryId, batchId) manifest rename.
  */
object KafkaConnectors {

  sealed trait DeliveryMode
  case object AtLeastOnce extends DeliveryMode
  case object ExactlyOnce extends DeliveryMode

  def sourceOptions(
      bootstrap: String,
      topic: String,
      groupId: String = "stream-group",
      delivery: DeliveryMode = AtLeastOnce
  ): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> "latest",
    "kafka.group.id" -> groupId,
    "kafka.isolation.level" -> (delivery match {
      case ExactlyOnce => "read_committed"
      case AtLeastOnce => "read_uncommitted"
    })
  )

  /** Unbounded value-only string stream from a topic. */
  def source(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      delivery: DeliveryMode = AtLeastOnce
  ): DataFrame =
    spark.readStream
      .format("kafka")
      .options(sourceOptions(bootstrap, topic, delivery = delivery))
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  def sinkOptions(bootstrap: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "kafka.acks" -> "all",
    "kafka.compression.type" -> "snappy",
    "kafka.linger.ms" -> "50",
    "kafka.batch.size" -> (32 * 1024).toString,
    "kafka.enable.idempotence" -> "true"
  )

  /** Envelope frame → Kafka (key, value) projection.
    * key = primaryKey bytes; value = envelope JSON; in compacted mode DELETE
    * operations produce a tombstone (null value) so log compaction physically
    * removes the key.
    */
  def keyedProjection(envelopes: DataFrame, compacted: Boolean): DataFrame = {
    val json = to_json(
      struct(
        col("operation"), col("source"), col("payloadJson"), col("eventTime"),
        col("processedTime"), col("traceId"), col("primaryKey"), col("metadata")
      )
    )
    // tombstone: DELETE and CHANGELOG_DELETE both compact away the key
    val value =
      if (compacted)
        when(upper(col("operation")).endsWith("DELETE"), lit(null).cast("string")).otherwise(json)
      else json
    envelopes.select(
      col("primaryKey").cast("binary").as("key"),
      value.cast("binary").as("value")
    )
  }

  /** Streaming writer for an envelope frame. */
  def sink(
      envelopes: DataFrame,
      bootstrap: String,
      topic: String,
      checkpoint: String,
      compacted: Boolean = false
  ): DataStreamWriter[Row] =
    keyedProjection(envelopes, compacted).writeStream
      .format("kafka")
      .options(sinkOptions(bootstrap, topic))
      .option("checkpointLocation", checkpoint)
}
