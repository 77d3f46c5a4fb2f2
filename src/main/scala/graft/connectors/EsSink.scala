package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search-index sink shape (the Elasticsearch-sink analogue).
  * Reference connector/elasticsearch/ElasticsearchSinkBuilder.java:25-57:
  * document id = traceId (idempotent index), events without a traceId are
  * skipped, flush per action.
  *
  * `prepare` is the engine-grade projection: drop id-less rows, last write
  * per doc id wins; `writer` maintains the index as a keyed last-write-wins
  * merge (same bucketed shape as [[UpsertSink]]) — indexing by id is an
  * overwrite in ES, so a REPLAYED micro-batch converges to byte-identical
  * index state instead of appending duplicate doc ids. Swap the merge for an
  * ES bulk client in `foreachBatch` against a live cluster.
  */
object EsSink {

  def prepare(envelopes: DataFrame): DataFrame = {
    // deterministic last-write-wins: dropDuplicates keeps an ARBITRARY row
    // per key (scan order), which breaks byte-identical replay convergence —
    // order by event time with full-content tie-breaks instead
    // every field serialized into `doc` participates in the ordering:
    // two rows tying on (eventTime, operation, payloadJson) but differing
    // in source or primaryKey would otherwise get an arbitrary winner
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("traceId"))
      .orderBy(
        col("eventTime").desc, col("operation").desc, col("payloadJson").desc_nulls_last,
        col("source").desc_nulls_last, col("primaryKey").desc_nulls_last)
    envelopes
      .filter(col("traceId").isNotNull)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(
        col("traceId").as("_doc_id"),
        to_json(
          struct(col("operation"), col("source"), col("payloadJson"), col("eventTime"), col("primaryKey"))
        ).as("doc")
      )
  }

  def emptyIndex(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("_doc_id", StringType), StructField("doc", StringType)))
    )
  }

  def readIndex(spark: SparkSession, path: String): DataFrame =
    KeyedParquetTable(path, "_doc_id").readOr(spark, emptyIndex(spark))

  def writer(path: String, numBuckets: Int = UpsertSink.DefaultBuckets)(
      batch: DataFrame,
      batchId: Long
  ): Unit = {
    val docs = prepare(batch)
    KeyedParquetTable(path, "_doc_id", numBuckets)
      .mergeBatch(docs, docs.select(col("_doc_id")).limit(0), batchId)
  }
}
