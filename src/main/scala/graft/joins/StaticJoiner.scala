package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Broadcast enrichment join against slowly-changing reference data.
  * Reference pattern/enrich/StaticJoiner.java:18-172: reference stream held in
  * BroadcastState (last-write-wins per key); main-side lookup by key; miss or
  * null key → pass through unenriched (LEFT-join behavior); no TTL.
  *
  * Spark-first mapping:
  *  - the LWW per-key view of the ref stream = [[latestPerKey]] (one shuffle
  *    over the — small — ref side only)
  *  - the enrichment = broadcast LEFT join: zero shuffle on the 100 TB main
  *    side, ref replicated to every executor exactly like BroadcastState
  *  - in streaming, the same join is a stream-static join re-evaluated per
  *    micro-batch (ref as a table updated by its own query)
  */
final case class StaticJoiner(mainKey: String, refKey: String) {

  /** Last-write-wins compaction of a changelog-ish reference frame:
    * newest row per key by (tsCol, tieCol). Mirrors BroadcastState
    * last-write-wins (reference :155-170).
    */
  def latestPerKey(ref: DataFrame, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(refKey)).orderBy(col(tsCol).desc, col(tieCol).desc)
    ref.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Enrich `main` with the given ref columns; unmatched/null-key rows pass
    * through with nulls (reference :134-151). Ref side is broadcast.
    */
  def enrich(main: DataFrame, ref: DataFrame, refCols: Seq[String]): DataFrame = {
    val r = ref.select((refKey +: refCols).distinct.map(col): _*)
    main.join(broadcast(r), main(mainKey) === r(refKey), "left").drop(r(refKey))
  }
}
