package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A composable stream pattern: `Dataset ⇒ Dataset`, applied with
  * `df.transform(pattern)`. Works identically on batch and streaming frames —
  * all patterns here are pure column expressions, so Catalyst can push, prune
  * and whole-stage-codegen through them (the reference's pattern chain, by
  * contrast, is opaque record-at-a-time Java; see SURVEY §4.1).
  */
trait StreamPattern extends (DataFrame => DataFrame) {
  def name: String
}

/** Predicate filter with pass/drop counters.
  * Semantics from reference pattern/filter/FilterInterceptor.java:10-49.
  * Counters ride the Observation API (`df.observe`) instead of Flink metric
  * groups: zero extra pass over the data, visible via QueryExecutionListener /
  * StreamingQueryListener.
  */
final case class FilterInterceptor(name: String, predicate: Column)
    extends StreamPattern {
  def apply(df: DataFrame): DataFrame =
    df.observe(
      s"filter.$name",
      count(lit(1)).as("in"),
      count(when(predicate, 1)).as("passed"),
      // NULL predicates are dropped by the filter but `!NULL` is NULL, so
      // they'd vanish from BOTH counters without the coalesce — the
      // invariant is in == passed + dropped
      count(when(!coalesce(predicate, lit(false)), 1)).as("dropped")
    ).filter(predicate)
}

/** A named health predicate (reference pattern/observability/QualityCheck.java:6-27). */
final case class QualityCheck(name: String, predicate: Column)

/** Pass-through that counts matches of each QualityCheck.
  * Reference pattern/observability/OnlineObserver.java:11-60.
  * `apply` attaches observation metrics (streaming & batch); `summarize` is the
  * batch/SQL-oracle view of the same counters as a one-row DataFrame.
  */
final case class OnlineObserver(name: String, checks: Seq[QualityCheck])
    extends StreamPattern {
  require(checks.nonEmpty, "at least one quality check required")

  private def aggs: Seq[Column] =
    count(lit(1)).as("total") +: checks.map(c => count(when(c.predicate, 1)).as(c.name))

  def apply(df: DataFrame): DataFrame = df.observe(s"observer.$name", aggs.head, aggs.tail: _*)

  def summarize(df: DataFrame): DataFrame = df.agg(aggs.head, aggs.tail: _*)
}

/** Adds `stage.<name>.*` entries to the metadata map column.
  * Reference pattern/observability/MetadataDecorator.java:13-82 mutates the map
  * in place; here it is an immutable `map_concat` (duplicate keys: last wins via
  * mapKeyDedupPolicy=LAST_WIN is NOT assumed — stage keys are namespaced so they
  * never collide).
  *
  * `clock`/`subtask` default to real runtime values (current_timestamp /
  * spark_partition_id) and are injectable for deterministic verification.
  */
final case class MetadataDecorator(
    name: String,
    taskName: String,
    metadataCol: String = "metadata",
    clock: Column = current_timestamp(),
    subtask: Column = spark_partition_id()
) extends StreamPattern {
  def apply(df: DataFrame): DataFrame = {
    val stamped = map(
      lit(s"stage.$name.taskName"), lit(taskName),
      lit(s"stage.$name.subtaskIndex"), subtask.cast("string"),
      lit(s"stage.$name.processedAt"), unix_micros(clock.cast("timestamp")).cast("string")
    )
    // strip this stage's own keys before concatenating: re-applying the
    // stage (pipeline retry, replayed frame) would otherwise produce
    // duplicate map keys, which aborts under mapKeyDedupPolicy=EXCEPTION —
    // re-stamping is idempotent-by-construction instead
    val prefix = s"stage.$name."
    df.withColumn(
      metadataCol,
      when(col(metadataCol).isNull, stamped)
        .otherwise(
          map_concat(map_filter(col(metadataCol), (k, _) => !k.startsWith(prefix)), stamped))
    )
  }
}

/** Pass-through computing end-to-end latency = now() - eventTime with an alert
  * counter above `thresholdMs`. Reference pattern/observability/LatencyDetector.java:15-81.
  * Emits observation metrics `e2e_latency_max_ms` / `alert_count`; `summarize`
  * is the batch view.
  */
final case class LatencyDetector(
    name: String,
    eventTimeCol: String,
    thresholdMs: Long,
    clock: Column = current_timestamp()
) extends StreamPattern {

  private def latencyMs: Column =
    unix_millis(clock.cast("timestamp")) - unix_millis(col(eventTimeCol).cast("timestamp"))

  private def aggs: Seq[Column] = Seq(
    max(latencyMs).as("e2e_latency_max_ms"),
    // avg, not sum/count(*): rows with a NULL event time have no latency and
    // must not deflate the average (sum skips them, count(*) would not)
    avg(latencyMs).as("e2e_latency_avg_ms"),
    count(when(latencyMs > thresholdMs, 1)).as("alert_count"),
    count(lit(1)).as("total")
  )

  def apply(df: DataFrame): DataFrame =
    df.observe(s"latency.$name", aggs.head, aggs.tail: _*)

  def summarize(df: DataFrame): DataFrame = df.agg(aggs.head, aggs.tail: _*)
}
