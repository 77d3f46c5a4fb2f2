package graft.parsers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC change event → StreamEnvelop, as pure column expressions.
  * Decision tree from reference job/cdc/parser/MongoToKafkaParser.java:25-175:
  *  - op normalization: c/insert→insert, u/update/replace→update,
  *    d/delete→delete, else unknown (:83-89)
  *  - payload: fullDocument first (:91-96); update without a full document
  *    falls back to updatedFields merged with documentKey (:98-121);
  *    delete payload = documentKey (:123-136)
  *  - primaryKey = payload._id as string (:138-141)
  *
  * Everything is codegen-friendly Catalyst (when/coalesce/json functions);
  * no per-record Java like the reference, so the parse stage fuses with the
  * scan at any scale.
  */
object CdcParser {

  def normalizeOp(op: Column): Column = {
    val o = lower(op)
    when(o.isin("c", "insert"), "insert")
      .when(o.isin("u", "update", "replace"), "update")
      .when(o.isin("d", "delete"), "delete")
      .otherwise("unknown")
  }

  /** JSON object merge, `b` keys overriding `a` keys (order: a-without-b keys
    * first, then b), via string maps. No dependency on mapKeyDedupPolicy.
    */
  private def mergeJson(a: Column, b: Column): Column = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val mt = MapType(StringType, StringType)
    val ma = from_json(coalesce(a, lit("{}")), mt)
    val mb = from_json(coalesce(b, lit("{}")), mt)
    to_json(map_concat(map_filter(ma, (k, _) => !map_contains_key(mb, k)), mb))
  }

  /** Parse a CDC frame with columns
    * (op, db, collection, documentKey, fullDocument, updatedFields, eventTime)
    * into envelope columns. `clock` injectable for determinism.
    */
  def parse(cdc: DataFrame, clock: Column = current_timestamp()): DataFrame = {
    val operation = normalizeOp(col("op"))
    val payload =
      when(operation === "delete", col("documentKey"))
        .otherwise(
          coalesce(
            col("fullDocument"),
            when(operation === "update", mergeJson(col("updatedFields"), col("documentKey"))),
            col("documentKey")
          )
        )
    // ComputeOnce + two-step select: the payload tree (which embeds the
    // updatedFields/documentKey JSON merge) is needed twice — as payloadJson
    // and under the primaryKey extraction. Materializing it as an attribute
    // evaluates the merge once per row; inlined, each use would carry its
    // own copy of both from_json calls.
    cdc
      .withColumn("_payload", graft.functions.ComputeOnce(payload))
      .select(
        operation.as("operation"),
        col("collection").as("source"),
        col("_payload").as("payloadJson"),
        col("eventTime").cast("timestamp").as("eventTime"),
        clock.cast("timestamp").as("processedTime"),
        lit(null).cast("string").as("traceId"),
        get_json_object(col("_payload"), "$._id").as("primaryKey"),
        map(lit("cdc.db"), col("db")).as("metadata")
      )
  }
}
