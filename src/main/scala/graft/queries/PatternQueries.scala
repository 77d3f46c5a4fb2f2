package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.patterns._
import graft.parsers.{CdcParser, EnvelopeParser}

/** One verification query per stateless pattern operator (SURVEY §2.3/2.4/2.7/2.8).
  *
  * Every query is deterministic (injected clocks, no uuid/partition-id) and has
  * a DuckDB oracle. Queries use the REAL operator implementations — the oracle
  * SQL independently re-derives the expected output.
  */
object PatternQueries {

  private val fixedClock: Column = lit("2024-07-01 00:00:00").cast("timestamp")
  private val fixedClockUs = 1719792000000000L

  private def env(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsAsEnvelopes(spark, dir)

  private val envCte = s"WITH env AS (${Tables.envelopesSql})"

  // ---------------------------------------------------------------- F1 filter
  def f1Filter(spark: SparkSession, dir: String): DataFrame = {
    val pat = FilterInterceptor("ops", col("operation") =!= "unknown" && col("value") > 50)
    env(spark, dir)
      .transform(pat)
      .select(col("event_id"), col("operation"), col("source"), col("value"))
  }

  val f1Sql: String =
    s"""$envCte
       |SELECT event_id, operation, source, value FROM env
       |WHERE operation <> 'unknown' AND value > 50""".stripMargin

  // ------------------------------------------------------------- F2 splitter
  private def splitterRoutes = Seq(
    Route("purchases", col("source") === "purchase"),
    Route("errors", col("source") === "error"),
    Route("high_value", col("value") > 150)
  )

  def f2SplitterFirstMatch(spark: SparkSession, dir: String): DataFrame =
    ParallelSplitter(splitterRoutes)
      .routed(env(spark, dir))
      .select(col("event_id"), col("route"))

  val f2Sql: String =
    s"""$envCte
       |SELECT event_id,
       |  CASE WHEN source = 'purchase' THEN 'purchases'
       |       WHEN source = 'error' THEN 'errors'
       |       WHEN value > 150 THEN 'high_value'
       |       ELSE 'main' END AS route
       |FROM env""".stripMargin

  def f2SplitterCopy(spark: SparkSession, dir: String): DataFrame =
    ParallelSplitter(splitterRoutes)
      .exploded(env(spark, dir))
      .select(col("event_id"), col("route"))

  val f2CopySql: String =
    s"""$envCte
       |SELECT event_id, 'purchases' AS route FROM env WHERE source = 'purchase'
       |UNION ALL SELECT event_id, 'errors' FROM env WHERE source = 'error'
       |UNION ALL SELECT event_id, 'high_value' FROM env WHERE value > 150
       |UNION ALL SELECT event_id, 'main' FROM env""".stripMargin

  // -------------------------------------------------- F3 metadata decorator
  def f3MetadataDecorator(spark: SparkSession, dir: String): DataFrame = {
    val pat = MetadataDecorator(
      "presink", taskName = "graft-job", clock = fixedClock, subtask = lit(0))
    env(spark, dir)
      .transform(pat)
      .select(
        col("event_id"),
        element_at(col("metadata"), "ingestSource").as("ingest_source"),
        element_at(col("metadata"), "stage.presink.taskName").as("task_name"),
        element_at(col("metadata"), "stage.presink.subtaskIndex").as("subtask"),
        element_at(col("metadata"), "stage.presink.processedAt").as("processed_at")
      )
  }

  val f3Sql: String =
    s"""$envCte
       |SELECT event_id, source AS ingest_source, 'graft-job' AS task_name,
       |  '0' AS subtask, '$fixedClockUs' AS processed_at
       |FROM env""".stripMargin

  // ---------------------------------------------------- F4 online observer
  def f4OnlineObserver(spark: SparkSession, dir: String): DataFrame =
    OnlineObserver(
      "health",
      Seq(
        QualityCheck("null_payloads", col("payloadJson").isNull),
        QualityCheck("purchases", col("source") === "purchase"),
        QualityCheck("high_value", col("value") > 150)
      )
    ).summarize(env(spark, dir))

  val f4Sql: String =
    s"""$envCte
       |SELECT COUNT(*) AS total,
       |  COUNT(CASE WHEN payloadJson IS NULL THEN 1 END) AS null_payloads,
       |  COUNT(CASE WHEN source = 'purchase' THEN 1 END) AS purchases,
       |  COUNT(CASE WHEN value > 150 THEN 1 END) AS high_value
       |FROM env""".stripMargin

  // ---------------------------------------------------- F5 latency detector
  def f5LatencyDetector(spark: SparkSession, dir: String): DataFrame =
    LatencyDetector("e2e", "eventTime", thresholdMs = 30000, clock = lit("2024-03-01 00:00:00").cast("timestamp"))
      .summarize(env(spark, dir))

  val f5Sql: String =
    s"""$envCte
       |SELECT
       |  MAX(epoch_ms(TIMESTAMP '2024-03-01 00:00:00') - epoch_ms(eventTime)) AS e2e_latency_max_ms,
       |  AVG(epoch_ms(TIMESTAMP '2024-03-01 00:00:00') - epoch_ms(eventTime)) AS e2e_latency_avg_ms,
       |  COUNT(CASE WHEN epoch_ms(TIMESTAMP '2024-03-01 00:00:00') - epoch_ms(eventTime) > 30000 THEN 1 END) AS alert_count,
       |  COUNT(*) AS total
       |FROM env""".stripMargin

  // ------------------------------------------------- F6 flow disruption (batch)
  def f6FlowDisruption(spark: SparkSession, dir: String): DataFrame =
    graft.stateful.FlowDisruptionDetector.detectBatch(
      Tables.events(spark, dir),
      keyCol = "user_id",
      tsCol = "ts",
      tieCol = "event_id",
      timeoutMs = 2L * 24 * 3600 * 1000
    ).drop("event_id")

  val f6Sql: String =
    """SELECT user_id, prev_us, ts_us, ts_us - prev_us AS gap_us FROM (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_us
      |  FROM events)
      |WHERE prev_us IS NOT NULL AND ts_us - prev_us > 172800000000""".stripMargin

  // ------------------------------------------------------------- F7 fan-in
  def f7FanIn(spark: SparkSession, dir: String): DataFrame = {
    val e = env(spark, dir)
    val evens = e.filter(col("event_id") % 2 === 0)
    val odds = e.filter(col("event_id") % 2 === 1)
    WatermarkAlignedFanIn("eventTime", "5 seconds")(
      Seq("evens" -> evens, "odds" -> odds)
    ).select(col("event_id"), col("ingestSource"), unix_micros(col("eventTime")).as("ev_us"))
  }

  val f7Sql: String =
    s"""$envCte
       |SELECT event_id,
       |  CASE WHEN event_id % 2 = 0 THEN 'evens' ELSE 'odds' END AS ingestSource,
       |  epoch_us(eventTime) AS ev_us
       |FROM env""".stripMargin

  // ------------------------------------------------------ V1 schema enforcer
  /** Deterministically corrupt the payload to exercise all violation paths. */
  private def corruptedPayload: Column =
    when(col("event_id") % 7 === 0, lit("""{"k": "x"}"""))
      .when(col("event_id") % 11 === 0, lit("""{"x": 1}"""))
      .when(col("event_id") % 13 === 0, lit("not json"))
      .otherwise(col("payloadJson"))

  private val corruptedPayloadSql =
    """CASE WHEN event_id % 7 = 0 THEN '{"k": "x"}'
      |     WHEN event_id % 11 = 0 THEN '{"x": 1}'
      |     WHEN event_id % 13 = 0 THEN 'not json'
      |     ELSE payloadJson END""".stripMargin

  private def schemaEnforcer = SchemaEnforcer(
    "payloadJson",
    Seq(
      SchemaVersion(2, Seq(FieldSpec("k", FieldType.NUMBER)), strict = true),
      SchemaVersion(1, Seq(FieldSpec("k", FieldType.ANY)), strict = false)
    )
  )

  def v1SchemaGood(spark: SparkSession, dir: String): DataFrame = {
    val prepared = env(spark, dir).withColumn("payloadJson", corruptedPayload)
    val (good, _) = schemaEnforcer.enforce(prepared)
    good.select(col("event_id"), col("matched_version"))
  }

  val v1GoodSql: String =
    s"""$envCte, prepared AS (
       |  SELECT event_id, $corruptedPayloadSql AS p FROM env)
       |SELECT event_id,
       |  CASE WHEN event_id % 7 <> 0 AND event_id % 11 <> 0 AND event_id % 13 <> 0 THEN 2
       |       WHEN event_id % 7 = 0 THEN 1 END AS matched_version
       |FROM prepared
       |WHERE event_id % 7 = 0 OR (event_id % 11 <> 0 AND event_id % 13 <> 0)""".stripMargin

  def v1SchemaDlq(spark: SparkSession, dir: String): DataFrame = {
    val prepared = env(spark, dir).withColumn("payloadJson", corruptedPayload)
    val (_, bad) = schemaEnforcer.enforce(prepared)
    bad.select(col("event_id"), col("violations"))
  }

  val v1DlqSql: String =
    s"""$envCte
       |SELECT event_id,
       |  CASE WHEN event_id % 11 = 0 THEN 'v2:[missing:k,unknown:x];v1:[missing:k]'
       |       ELSE 'v2:[invalid:payload];v1:[invalid:payload]' END AS violations
       |FROM env
       |WHERE event_id % 7 <> 0 AND (event_id % 11 = 0 OR event_id % 13 = 0)""".stripMargin

  // -------------------------------------------------- V2 constraint enforcer
  private def constraintRules = Seq(
    NotNullRule("c_mktsegment"),
    RangeRule("c_acctbal", 0, 9999),
    FormatRule("c_name", "^Customer#[0-9]+$", "custname")
  )

  def v2ConstraintsDlq(spark: SparkSession, dir: String): DataFrame = {
    val (_, bad) = ConstraintEnforcer(constraintRules).enforce(Tables.customer(spark, dir))
    bad.select(col("c_custkey"), col("violations"))
  }

  val v2Sql: String =
    """SELECT c_custkey,
      |  concat_ws(',',
      |    CASE WHEN c_mktsegment IS NULL THEN 'c_mktsegment is null' END,
      |    CASE WHEN c_acctbal < 0 OR c_acctbal > 9999 THEN 'c_acctbal out of range' END,
      |    CASE WHEN c_name IS NOT NULL AND NOT regexp_matches(c_name, '^Customer#[0-9]+$') THEN 'c_name bad custname' END
      |  ) AS violations
      |FROM customer
      |WHERE c_mktsegment IS NULL
      |   OR c_acctbal < 0 OR c_acctbal > 9999
      |   OR (c_name IS NOT NULL AND NOT regexp_matches(c_name, '^Customer#[0-9]+$'))""".stripMargin

  // ------------------------------------------------- P1 envelope parser
  /** Envelope JSON strings built from events, ~3.5% deterministically corrupt. */
  private def rawEnvelopes(spark: SparkSession, dir: String): DataFrame = {
    val e = env(spark, dir)
    val json = to_json(
      struct(
        col("operation"), col("source"), col("payloadJson"),
        col("eventTime"), col("traceId"), col("primaryKey")
      ),
      Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    )
    e.select(
      col("event_id"),
      when(col("event_id") % 53 === 0, concat(lit("CORRUPT"), json))
        .when(col("event_id") % 59 === 0, lit("""{"broken"""))
        .otherwise(json)
        .as("value")
    )
  }

  def p1EnvelopeParse(spark: SparkSession, dir: String): DataFrame = {
    val (good, _) = EnvelopeParser.parse(rawEnvelopes(spark, dir), "value", clock = fixedClock)
    good.select(
      col("traceId"), col("operation"), col("source"), col("primaryKey"),
      unix_micros(col("eventTime")).as("ev_us"),
      unix_micros(col("processedTime")).as("proc_us")
    )
  }

  val p1Sql: String =
    s"""$envCte
       |SELECT traceId, operation, source, primaryKey,
       |  epoch_us(eventTime) AS ev_us, $fixedClockUs AS proc_us
       |FROM env
       |WHERE event_id % 53 <> 0 AND event_id % 59 <> 0""".stripMargin

  def p1EnvelopeDlq(spark: SparkSession, dir: String): DataFrame = {
    val (_, bad) = EnvelopeParser.parse(rawEnvelopes(spark, dir), "value", clock = fixedClock)
    bad.groupBy(col("errorType")).agg(count(lit(1)).as("n"))
  }

  val p1DlqSql: String =
    s"""$envCte
       |SELECT 'PARSING_ERROR' AS errorType, COUNT(*) AS n FROM env
       |WHERE event_id % 53 = 0 OR event_id % 59 = 0""".stripMargin

  // ------------------------------------------------------- P2 CDC parser
  /** CDC-shaped frame deterministically derived from events. */
  private def cdcFrame(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cents = round(col("value") * 100).cast("long")
    val ops = array(lit("c"), lit("update"), lit("d"), lit("replace"), lit("zz"))
    val op = element_at(ops, (col("event_id") % 5 + 1).cast("int"))
    val fullDoc = concat(lit("{\"_id\": "), col("user_id"), lit(", \"v\": "), cents, lit("}"))
    e.select(
      op.as("op"),
      lit("testdb").as("db"),
      col("event_type").as("collection"),
      concat(lit("{\"_id\": "), col("user_id"), lit("}")).as("documentKey"),
      when(op === "d", lit(null).cast("string"))
        .when(op === "update" && col("event_id") % 10 === 6, lit(null).cast("string"))
        .otherwise(fullDoc)
        .as("fullDocument"),
      when(op === "update", concat(lit("{\"v\": "), cents, lit("}")))
        .otherwise(lit(null).cast("string"))
        .as("updatedFields"),
      col("ts").as("eventTime"),
      col("event_id")
    )
  }

  def p2CdcParse(spark: SparkSession, dir: String): DataFrame =
    CdcParser
      .parse(cdcFrame(spark, dir), clock = fixedClock)
      .select(
        col("operation"), col("source"), col("primaryKey"),
        get_json_object(col("payloadJson"), "$.v").as("v"),
        unix_micros(col("eventTime")).as("ev_us")
      )

  val p2Sql: String =
    """SELECT
      |  CASE CAST(event_id % 5 AS INT)
      |    WHEN 0 THEN 'insert' WHEN 1 THEN 'update' WHEN 2 THEN 'delete'
      |    WHEN 3 THEN 'update' ELSE 'unknown' END AS operation,
      |  event_type AS source,
      |  CAST(user_id AS VARCHAR) AS primaryKey,
      |  CASE WHEN event_id % 5 = 2 THEN NULL
      |       ELSE CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR) END AS v,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS ev_us
      |FROM events""".stripMargin

  // -------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_filter" -> f1Filter,
    "f2_splitter_first_match" -> f2SplitterFirstMatch,
    "f2_splitter_copy" -> f2SplitterCopy,
    "f3_metadata_decorator" -> f3MetadataDecorator,
    "f4_online_observer" -> f4OnlineObserver,
    "f5_latency_detector" -> f5LatencyDetector,
    "f6_flow_disruption" -> f6FlowDisruption,
    "f7_fanin" -> f7FanIn,
    "v1_schema_good" -> v1SchemaGood,
    "v1_schema_dlq" -> v1SchemaDlq,
    "v2_constraints_dlq" -> v2ConstraintsDlq,
    "p1_envelope_parse" -> p1EnvelopeParse,
    "p1_envelope_dlq" -> p1EnvelopeDlq,
    "p2_cdc_parse" -> p2CdcParse
  )

  val oracles: Map[String, String] = Map(
    "f1_filter" -> f1Sql,
    "f2_splitter_first_match" -> f2Sql,
    "f2_splitter_copy" -> f2CopySql,
    "f3_metadata_decorator" -> f3Sql,
    "f4_online_observer" -> f4Sql,
    "f5_latency_detector" -> f5Sql,
    "f6_flow_disruption" -> f6Sql,
    "f7_fanin" -> f7Sql,
    "v1_schema_good" -> v1GoodSql,
    "v1_schema_dlq" -> v1DlqSql,
    "v2_constraints_dlq" -> v2Sql,
    "p1_envelope_parse" -> p1Sql,
    "p1_envelope_dlq" -> p1DlqSql,
    "p2_cdc_parse" -> p2Sql
  )
}
