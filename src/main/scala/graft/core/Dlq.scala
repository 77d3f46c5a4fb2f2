package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dead-letter-queue as a first-class second output.
  *
  * The reference publishes DLQ events from a singleton side-channel Kafka
  * producer inside operators (core/dlq/DLQPublisher.java:18-97). In Spark,
  * side-channel producers inside executors fight the execution model; instead
  * every validation/parse stage returns (good, bad) and the bad frames are
  * unioned into one DLQ stream written by its own sink — same delivery
  * guarantees as the data path, testable, replayable.
  */
object Dlq {

  val columns: Seq[String] =
    Seq("errorType", "errorMessage", "source", "timestamp", "rawEvent", "stacktrace")

  /** Normalize an arbitrary bad-rows frame into the DlqEvent schema. */
  def toDlq(
      bad: DataFrame,
      errorType: String,
      errorMessage: Column,
      source: String,
      rawEvent: Column,
      clock: Column = current_timestamp()
  ): DataFrame =
    bad.select(
      lit(errorType).as("errorType"),
      errorMessage.as("errorMessage"),
      lit(source).as("source"),
      clock.cast("timestamp").as("timestamp"),
      rawEvent.cast("string").as("rawEvent"),
      lit(null).cast("string").as("stacktrace")
    )

  /** Union several DLQ frames into the single dead-letter stream. */
  def union(frames: Seq[DataFrame]): Option[DataFrame] =
    frames.reduceOption(_.unionByName(_))

  /** Replay dead letters through the envelope parser (the reference's
    * dlq-replay flow, docs/recovery/dlq-replay-guide.md): raw events are
    * re-parsed; still-bad rows land in a fresh DLQ frame whose errorMessage
    * carries an incrementing `(replay attempt N)` counter — how an operator
    * detects a poison message instead of cycling it forever.
    * Returns (recovered envelopes, still dead).
    */
  def replay(
      dlq: DataFrame,
      clock: Column = current_timestamp()
  ): (DataFrame, DataFrame) = {
    // prior attempt count per raw event, parsed back out of errorMessage.
    // ANCHORED to the single trailing "(replay attempt N)" suffix this
    // module itself writes — an unanchored pattern would read (and the
    // rewrite below would strip) counter-like text inside the preserved
    // original error message, e.g. a quoted raw event that cycled through
    // an outer replay system.
    val prevAttempt = coalesce(
      nullif(
        regexp_extract(col("errorMessage"), "\\(replay attempt (\\d+)\\)$", 1), lit(""))
        .cast("int"),
      lit(0))
    val prev = dlq
      .groupBy(col("rawEvent").as("_raw"))
      .agg(max(prevAttempt).as("_prev"))
    val (good, bad) = graft.parsers.EnvelopeParser.parse(
      dlq.select(col("rawEvent").as("value")),
      "value",
      clock,
      source = "dlq-replay"
    )
    val stillDead = bad
      .join(prev, bad("rawEvent") === prev("_raw"), "left")
      .select(
        col("errorType"),
        // REPLACE the prior counter suffix (trailing-anchored — original
        // error text is never touched) rather than appending another:
        // after N replays the message carries one "(replay attempt N)",
        // not a growing chain — and the extraction above stays unambiguous
        concat(
          regexp_replace(col("errorMessage"), " \\(replay attempt \\d+\\)$", ""),
          lit(" (replay attempt "),
          (coalesce(col("_prev"), lit(0)) + 1).cast("string"),
          lit(")")).as("errorMessage"),
        col("source"),
        col("timestamp"),
        col("rawEvent"),
        col("stacktrace"))
    (good, stillDead)
  }
}

/** Map-column helpers. */
object MapOps {
  import org.apache.spark.sql.functions._

  /** Upsert (k -> v) into a map column: existing key replaced, null map
    * treated as empty — no dependency on spark.sql.mapKeyDedupPolicy.
    */
  def upsert(m: Column, k: String, v: Column): Column =
    map_concat(
      map_filter(coalesce(m, map()), (key, _) => key =!= k),
      map(lit(k), v)
    )
}
