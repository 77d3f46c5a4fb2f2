package graft.stateful

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.StreamEnvelop

/** Change-suppression: emit a row only when its (normalized) payload differs
  * from the last emitted payload for the same key.
  * Reference pattern/merge/StatefulMerger.java:25-122: per-key ValueState of a
  * composite payload hash, excluded fields removed before hashing; equal hash
  * → suppress, else update state + emit. TTL default 24h.
  *
  * `opCol`: include this column in the hashed composite as a `__op` entry —
  * the reference's MongoToKafka chain adds "__op" to the merged map
  * (job/cdc/MongoToKafkaJob.java buildChain) so a DELETE whose payload
  * canonicalizes equal to the prior event's payload is still emitted.
  */
final case class StatefulMerger(
    keyCols: Seq[String],
    payloadCol: String,
    excludedFields: Seq[String] = Seq.empty,
    ttlMs: Long = 24 * 3600 * 1000,
    opCol: Option[String] = None
) {

  /** Batch face: keep rows whose canonical payload differs from the previous
    * row's (per key, ordered by ts/tie). One shuffle on the key.
    */
  def batch(df: DataFrame, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieCol))
    val payloadCanon = PayloadNorm.canonical(col(payloadCol), excludedFields)
    val canon = opCol.fold(payloadCanon)(o => concat(lit("__op="), col(o), lit("|"), payloadCanon))
    df.withColumn("_canon", canon)
      .withColumn("_prev", lag(col("_canon"), 1).over(w))
      .filter(col("_prev").isNull || col("_canon") =!= col("_prev"))
      .drop("_canon", "_prev")
  }

  /** Streaming face: per-key last-hash state with processing-time TTL.
    * State is written and the TTL re-armed ONLY when an event is accepted
    * (hash changed) — suppressed duplicates leave state untouched so the TTL
    * runs from the last accepted write, matching the reference's
    * StateTtlConfig OnCreateAndWrite semantics (duplicates arriving faster
    * than the TTL do not postpone expiry/re-emission).
    */
  def streaming(
      ds: Dataset[StreamEnvelop],
      key: StreamEnvelop => String
  ): Dataset[StreamEnvelop] = {
    import ds.sparkSession.implicits._
    val excluded = excludedFields.toSet
    val includeOp = opCol.isDefined
    val ttl = ttlMs
    val conf =
      if (ttl > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    ds.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append, conf)(
        (_: String, events: Iterator[StreamEnvelop], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption
            val out = events.filter { e =>
              val h = StatefulMerger.hashPayload(
                e.payloadJson, excluded, if (includeOp) Some(e.operation) else None)
              val changed = !last.contains(h)
              if (changed) last = Some(h)
              changed
            }.toVector
            if (out.nonEmpty) {
              last.foreach(state.update)
              if (ttl > 0) state.setTimeoutDuration(ttl)
            }
            out.iterator
          }
        }
      )
  }
}

object StatefulMerger {

  /** JVM-side canonical payload hash, mirroring [[PayloadNorm.canonical]]:
    * parse the flat JSON object to string pairs, drop excluded keys, sort,
    * hash the `k=v|k=v` rendering. Deterministic across JVMs (no
    * Object.hashCode). `op` joins the composite as a `__op` entry (the
    * reference's MongoToKafka "__op" map key).
    */
  def hashPayload(payload: String, excluded: Set[String], op: Option[String] = None): Long = {
    val canonical = (JsonFlat.parse(payload)
      .filterNot { case (k, _) => excluded.contains(k) } ++ op.map("__op" -> _))
      .toSeq
      .sortBy(_._1)
      .map { case (k, v) => s"$k=${Option(v).getOrElse("∅")}" }
      .mkString("|")
    scala.util.hashing.MurmurHash3.stringHash(canonical).toLong
  }
}
