package graft.connectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-index sink shape (the Elasticsearch-sink analogue).
  * Reference connector/elasticsearch/ElasticsearchSinkBuilder.java:25-57:
  * document id = traceId (idempotent index), events without a traceId are
  * skipped, flush per action.
  *
  * `prepare` is the engine-grade projection: drop id-less rows, last write
  * per doc id wins (idempotent upsert semantics); `writer` appends the
  * prepared frame per micro-batch (fixture backend — swap for an ES bulk
  * client in `foreachBatch` against a live cluster).
  */
object EsSink {

  def prepare(envelopes: DataFrame): DataFrame =
    envelopes
      .filter(col("traceId").isNotNull)
      .select(
        col("traceId").as("_doc_id"),
        to_json(
          struct(col("operation"), col("source"), col("payloadJson"), col("eventTime"), col("primaryKey"))
        ).as("doc")
      )
      .dropDuplicates("_doc_id")

  def writer(path: String)(batch: DataFrame, batchId: Long): Unit =
    prepare(batch).write.mode("append").parquet(path)
}
