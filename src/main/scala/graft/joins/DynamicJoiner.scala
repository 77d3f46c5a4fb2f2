package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed stream-stream equi-join, N:M within a time window (TTL).
  * Reference pattern/enrich/DynamicJoiner.java:22-328: both sides buffered in
  * TTL'd MapState; every arrival joins against ALL buffered opposite rows
  * (N:M product); INNER/LEFT/RIGHT/FULL_OUTER; outer rows emitted when an
  * unmatched buffered row's TTL expires.
  *
  * Spark-first mapping: the TTL window is a join-time range condition —
  * `rTs BETWEEN lTs - ttl AND lTs + ttl` — which is exactly the set of pairs
  * the reference's mutual buffers can ever match (each side waits ttl for the
  * other). In streaming, watermarks bound the buffer like the reference TTL
  * and outer rows emit on watermark expiry (reference: on timer expiry); the
  * reference's axis is processing/arrival time — for strict fidelity stamp an
  * arrival-time column at ingest and join on it (SURVEY §2.5 J1).
  *
  * Scale: this is Spark's native stream-stream join (state-store backed,
  * partitioned by key); in batch it is a plain range-condition equi-join the
  * planner executes as a hash join on the equi-part with the range as a
  * post-filter — one shuffle per side, skew handled by AQE.
  */
final case class DynamicJoiner(
    leftKey: String,
    rightKey: String,
    leftTs: String,
    rightTs: String,
    ttlMs: Long,
    joinType: String = "inner" // inner | left_outer | right_outer | full_outer
) {
  require(
    Set("inner", "left_outer", "right_outer", "full_outer").contains(joinType),
    s"unsupported join type $joinType"
  )
  // a negative TTL makes the range condition unsatisfiable — every join
  // silently 100% miss — so reject it at construction
  require(ttlMs >= 0, s"ttlMs must be non-negative, got $ttlMs")

  private def condition(l: DataFrame, r: DataFrame) = {
    // raw timestamp +- interval (NOT unix_micros arithmetic): Spark's
    // streaming-join watermark extraction must see the bare event-time
    // columns in the range condition to bound state / emit outer rows
    val ttl = expr(s"INTERVAL $ttlMs MILLISECOND")
    l(leftKey) === r(rightKey) &&
    r(rightTs) >= l(leftTs) - ttl &&
    r(rightTs) <= l(leftTs) + ttl
  }

  /** Batch face: range-condition equi-join. */
  def batch(left: DataFrame, right: DataFrame): DataFrame =
    left.join(right, condition(left, right), joinType)

  /** Streaming face: watermarked stream-stream join. `delay` bounds state
    * retention on both sides (the reference's TTL); must cover ttl plus
    * out-of-orderness.
    */
  def streaming(left: DataFrame, right: DataFrame, delay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r, condition(l, r), joinType)
  }
}

object DynamicJoiner {

  /** Stamp an ingest/arrival-time column. The reference's join TTL runs on
    * PROCESSING-time arrival distance (DynamicJoiner.java:206-229), not
    * event time — for strict fidelity stamp both streams at ingest and pass
    * the stamped column as the join's time axis:
    * {{{
    * val l = DynamicJoiner.stampArrival(orders, "arrivalTs")
    * val r = DynamicJoiner.stampArrival(payments, "arrivalTs")
    * DynamicJoiner("k", "k2", "arrivalTs", "arrivalTs2", ttl).streaming(l, r, delay)
    * }}}
    */
  def stampArrival(df: DataFrame, colName: String): DataFrame =
    df.withColumn(colName, current_timestamp())
}
