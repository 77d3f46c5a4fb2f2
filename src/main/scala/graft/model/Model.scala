package graft.model

import java.sql.Timestamp

/** The universal event record of the engine — a row-oriented,
  * schema-flexible CDC/event envelope.
  *
  * Semantics derived from the reference's envelope
  * (reference: src/main/java/com/streamforge/core/model/StreamEnvelop.java:19-30):
  * `payloadJson` is the raw business payload as a JSON string; typed fields are
  * projected on demand with `get_json_object`/`from_json` so Catalyst can prune.
  */
case class StreamEnvelop(
    operation: String,
    source: String,
    payloadJson: String,
    eventTime: Timestamp,
    processedTime: Timestamp,
    traceId: String,
    primaryKey: String,
    metadata: Map[String, String]
)

object StreamEnvelop {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val Unknown = "unknown"
}

/** Dead-letter record. Rather than a side-channel producer (reference:
  * core/dlq/DLQPublisher.java:18-97), DLQ is a first-class second output:
  * validation stages return (good, bad) dataset pairs.
  * Error-type catalog mirrors reference core/config/ErrorCodes.java:7-11.
  */
case class DlqEvent(
    errorType: String,
    errorMessage: String,
    source: String,
    timestamp: Timestamp,
    rawEvent: String,
    stacktrace: String
)

object ErrorCodes {
  val ParsingError = "PARSING_ERROR"
  val SourceParsingError = "SOURCE_PARSING_ERROR"
  val SchemaViolation = "SCHEMA_VIOLATION"
  val ConstraintViolation = "CONSTRAINT_VIOLATION"
  val SinkError = "SINK_ERROR"
  val ProcessingError = "PROCESSING_ERROR"
}

/** Changelog/CDC output row (Debezium-style before/after).
  * reference: pattern/materialization/ChangelogEvent.java:6-14.
  */
case class ChangelogEvent(
    changeType: String, // INSERT | UPDATE | DELETE
    key: String,
    before: Option[String], // payload JSON before (None for INSERT)
    after: Option[String], // payload JSON after (None for DELETE)
    timestamp: Timestamp
)

/** Session-window aggregate output.
  * reference: pattern/session/SessionResult.java:7-14.
  */
case class SessionResult[R](
    key: String,
    sessionStart: Timestamp,
    sessionEnd: Timestamp,
    eventCount: Long,
    durationMs: Long,
    result: R
)

/** Raw CDC change event, pre-parse — the shape produced by a Mongo-style
  * change stream (reference: connector/mongo/MongoChangeStreamSource.java:226-239).
  * Document payloads are JSON strings (schemaless), keys extracted on demand.
  */
case class CdcEvent(
    op: String, // insert|update|replace|delete|c|u|d|...
    db: String,
    collection: String,
    documentKey: String, // JSON string {"_id": ...}
    fullDocument: String, // JSON string or null (delete)
    updatedFields: String, // JSON string or null
    eventTime: Timestamp
)

/** One (doc, LSH band bucket) row of the streaming near-dup pipeline. */
case class BandRow(sid: Long, bucket: String)

/** A near-duplicate CANDIDATE hit: `sid` collided with earlier doc `dupOf`
  * on at least the band that produced this row.
  */
case class NearDupHit(sid: Long, dupOf: Long)

/** One (group, item) observation of the streaming heavy-hitter gate. */
case class ItemObservation(group: String, item: String)

/** One Misra-Gries summary row for `group` after a micro-batch:
  * `estimate` undercounts by at most groupTotal/k (the MG guarantee).
  */
case class HeavyHitter(group: String, item: String, estimate: Long, groupTotal: Long)

/** One scored arrival of the streaming per-source quality gate. */
case class ScoredDoc(sid: Long, source: String, score: Long)

/** The quality gate's verdict for one arrival: of the `nPrev` docs its
  * source streamed before it, `nBetter` sat in strictly higher score bins;
  * the doc is kept iff `nBetter < max(1, (nPrev+1)·keepPpm div 1e6)` — it
  * would rank within the top keep-fraction of everything seen so far.
  */
case class QualityVerdict(
    sid: Long, source: String, score: Long, nPrev: Long, nBetter: Long, keep: Boolean)

/** Per-source state of the streaming quality gate: a fixed-width score
  * histogram plus the arrival count — bounded regardless of stream length.
  */
case class QualityGateState(bins: Array[Long], n: Long)
