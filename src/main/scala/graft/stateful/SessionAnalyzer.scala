package graft.stateful

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time session windows by inactivity gap.
  * Reference pattern/session/SessionAnalyzer.java:20-187: bounded
  * out-of-orderness watermarks, EventTimeSessionWindows.withGap, user fold
  * over the buffered session events, SessionResult output. Window end =
  * last event + gap in both Flink and Spark, so bounds match (SURVEY §2.6 A1).
  *
  * Spark-first: the built-in `session_window` aggregation — works identically
  * for batch and streaming (append mode with watermark). One shuffle on the
  * key; Spark merges session fragments across partitions.
  *
  * `allowedLateness` has no direct Spark knob: fold it into the watermark
  * delay (documented delta, SURVEY §7.3.6).
  *
  * Boundary delta: an event arriving EXACTLY at lastEvent+gap merges into
  * the session in Spark (touching windows merge); Flink's
  * EventTimeSessionWindows splits there. Measure-zero on continuous
  * timestamps; oracles use the Spark (touch-merge) semantics.
  */
final case class SessionAnalyzer(
    keyCol: String,
    tsCol: String,
    gap: String, // e.g. "30 minutes"
    outOfOrderness: String = "0 seconds"
) {

  /** Session aggregation with the reference job's fold (concatenated
    * operations + count, job/session/UserSessionAnalysisJob.java:61-73)
    * plus arbitrary extra aggregates.
    *
    * `actionCol` values are concatenated in (ts, tie) order.
    * Output: key, session_start_us, session_end_us (last event + gap),
    * event_count, duration_ms, actions.
    */
  def analyze(df: DataFrame, actionCol: String, tieCol: String): DataFrame = {
    val in = if (df.isStreaming) df.withWatermark(tsCol, outOfOrderness) else df
    aggSessions(in, actionCol, tieCol)
  }

  /** Flink `allowedLateness` parity (reference SessionAnalyzer.java:76-78:
    * a closed window re-fires an UPDATED result for each late event within
    * the lateness) lives in [[Processors.sessionsWithLateness]] — Spark's
    * built-in session_window only supports append mode (one firing on
    * close), so the re-firing face is a transformWithState processor with
    * event-time timers emitting an update stream.
    */
  private def aggSessions(in: DataFrame, actionCol: String, tieCol: String): DataFrame =
    in.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("event_count"),
        concat_ws(
          ",",
          transform(
            array_sort(
              collect_list(
                struct(unix_micros(col(tsCol)).as("ts_us"), col(tieCol).as("tie"), col(actionCol).as("a"))
              )
            ),
            e => e.getField("a")
          )
        ).as("actions")
      )
      .select(
        col(keyCol).as("key"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("event_count"),
        ((unix_micros(col("session_window.end")) - unix_micros(col("session_window.start"))) / lit(1000L))
          .cast("long")
          .as("duration_ms"),
        col("actions")
      )
}
