package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.stateful._

/** Verification queries for the stateful patterns (SURVEY §2.6 A1-A4),
  * exercising the batch faces of the real operators; the streaming faces share
  * the same key/ordering semantics and are covered by MemoryStream specs.
  */
object StatefulQueries {

  private def env(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsAsEnvelopes(spark, dir)

  private val envCte = s"WITH env AS (${Tables.envelopesSql})"

  // ------------------------------------------------------------- A4 dedup
  def a4Dedup(spark: SparkSession, dir: String): DataFrame =
    Deduplicator(Seq("primaryKey", "source"))
      .batch(env(spark, dir), "eventTime", "event_id")
      .select(col("event_id"), col("primaryKey"), col("source"))

  val a4Sql: String =
    s"""$envCte
       |SELECT event_id, primaryKey, source FROM (
       |  SELECT event_id, primaryKey, source,
       |    ROW_NUMBER() OVER (PARTITION BY primaryKey, source ORDER BY eventTime, event_id) AS rn
       |  FROM env)
       |WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------ A3 merger
  /** Payload with per-row `updatedAt` noise that must be excluded from the
    * change comparison (reference MongoToKafkaJob.java:70-80 excludes
    * updatedAt/modifiedAt).
    */
  def a3Merger(spark: SparkSession, dir: String): DataFrame = {
    val noisy = env(spark, dir).withColumn(
      "payloadJson",
      concat(
        lit("{\"k\": "),
        get_json_object(col("payloadJson"), "$.k"),
        lit(", \"updatedAt\": "),
        col("event_id"),
        lit("}")
      )
    )
    StatefulMerger(Seq("primaryKey"), "payloadJson", excludedFields = Seq("updatedAt"))
      .batch(noisy, "eventTime", "event_id")
      .select(col("event_id"), col("primaryKey"))
  }

  val a3Sql: String =
    s"""$envCte
       |SELECT event_id, primaryKey FROM (
       |  SELECT event_id, primaryKey,
       |    json_extract_string(payloadJson, '$$.k') AS k,
       |    LAG(json_extract_string(payloadJson, '$$.k')) OVER (
       |      PARTITION BY primaryKey ORDER BY eventTime, event_id) AS prev_k
       |  FROM env)
       |WHERE prev_k IS NULL OR k <> prev_k""".stripMargin

  // ------------------------------------------------------ A2 materializer
  def a2Materializer(spark: SparkSession, dir: String): DataFrame =
    Materializer("primaryKey", "payloadJson", col("operation") === "delete")
      .batchChangelog(env(spark, dir), "eventTime", "event_id")
      .select(
        col("key"),
        col("change_type"),
        get_json_object(col("before"), "$.k").as("before_k"),
        get_json_object(col("after"), "$.k").as("after_k"),
        unix_micros(col("ts")).as("ts_us")
      )

  val a2Sql: String =
    s"""$envCte, s AS (
       |  SELECT primaryKey AS key, operation, eventTime, event_id,
       |    CASE WHEN operation = 'delete' THEN NULL
       |         ELSE json_extract_string(payloadJson, '$$.k') END AS after_k,
       |    LAG(CASE WHEN operation = 'delete' THEN NULL
       |             ELSE json_extract_string(payloadJson, '$$.k') END) OVER (
       |      PARTITION BY primaryKey ORDER BY eventTime, event_id) AS before_k
       |  FROM env)
       |SELECT key, change_type, before_k, after_k, ts_us FROM (
       |  SELECT key,
       |    CASE WHEN operation = 'delete' AND before_k IS NOT NULL THEN 'DELETE'
       |         WHEN operation = 'delete' THEN NULL
       |         WHEN before_k IS NULL THEN 'INSERT'
       |         ELSE 'UPDATE' END AS change_type,
       |    before_k, after_k, epoch_us(eventTime) AS ts_us
       |  FROM s)
       |WHERE change_type IS NOT NULL""".stripMargin

  // ---------------------------------------------------------- A1 sessions
  def a1Sessions(spark: SparkSession, dir: String): DataFrame =
    SessionAnalyzer("user_id", "ts", "4 hours")
      .analyze(Tables.events(spark, dir), actionCol = "event_type", tieCol = "event_id")

  val a1Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |g AS (
      |  SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
      |                   OR ts - LAG(ts) OVER w > INTERVAL 4 HOUR THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, SUM(new_s) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id AS key,
      |  epoch_us(MIN(ts)) AS session_start_us,
      |  epoch_us(MAX(ts) + INTERVAL 4 HOUR) AS session_end_us,
      |  COUNT(*) AS event_count,
      |  (epoch_us(MAX(ts) + INTERVAL 4 HOUR) - epoch_us(MIN(ts))) // 1000 AS duration_ms,
      |  string_agg(event_type, ',' ORDER BY ts, event_id) AS actions
      |FROM s GROUP BY user_id, sid""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a4_dedup" -> a4Dedup,
    "a3_merger" -> a3Merger,
    "a2_materializer" -> a2Materializer,
    "a1_sessions" -> a1Sessions
  )

  val oracles: Map[String, String] = Map(
    "a4_dedup" -> a4Sql,
    "a3_merger" -> a3Sql,
    "a2_materializer" -> a2Sql,
    "a1_sessions" -> a1Sql
  )
}
