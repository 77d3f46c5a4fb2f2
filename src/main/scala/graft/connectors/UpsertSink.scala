package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert sink (the Mongo-sink analogue, fixture-backed).
  *
  * Reference connector/mongo/MongoSinkBuilder.java:37-230: batches of 500 or
  * a 1 s flush, DELETE → DeleteOneModel(_id), everything else idempotent
  * `replaceOne(_id, doc, upsert=true)`, unordered bulkWrite.
  *
  * Spark mapping: micro-batches ARE the batching (no hand-rolled timer);
  * each `foreachBatch` applies the same replace-or-delete merge to a keyed
  * parquet table. `applyBatch` is the pure merge (unit-tested, engine-grade);
  * `writer` wires it to a directory. Idempotence: replaying a micro-batch
  * converges to the same table state (upsert-by-key), which is what makes
  * checkpointed at-least-once effectively exactly-once end-to-end.
  */
object UpsertSink {

  /** Pure merge: apply `updates` (envelope frame: primaryKey, operation,
    * payloadJson, eventTime, ...) onto `current` keyed by `_id`.
    * Last update per key within the batch wins (ordered by ts, then tie);
    * DELETE removes the key.
    */
  def applyBatch(current: DataFrame, updates: DataFrame, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("primaryKey")).orderBy(col(tsCol).desc, col(tieCol).desc)
    val lastPerKey = updates
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val upserts = lastPerKey
      .filter(upper(col("operation")) =!= "DELETE")
      .select(
        col("primaryKey").as("_id"),
        col("payloadJson").as("doc"),
        col(tsCol).cast("timestamp").as("updated_at")
      )
    val deletes = lastPerKey.filter(upper(col("operation")) === "DELETE").select(col("primaryKey").as("_id"))
    val touched = lastPerKey.select(col("primaryKey").as("_id"))
    current
      .join(touched, Seq("_id"), "left_anti") // untouched rows
      .unionByName(upserts) // replaced/inserted rows
      .join(deletes, Seq("_id"), "left_anti") // minus deletions
  }

  def emptyTable(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("_id", StringType),
        StructField("doc", StringType),
        StructField("updated_at", TimestampType)
      ))
    )
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path) else emptyTable(spark)

  /** foreachBatch writer maintaining the keyed table at `path`. */
  def writer(path: String, tsCol: String = "eventTime", tieCol: String = "traceId")(
      batch: DataFrame,
      batchId: Long
  ): Unit = {
    val spark = batch.sparkSession
    val merged = applyBatch(readTable(spark, path), batch, tsCol, tieCol).cache()
    merged.count() // materialize before overwrite (source is the target dir)
    val tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    merged.unpersist()
    val dst = new java.io.File(path)
    if (dst.exists()) {
      val old = new java.io.File(path + ".old")
      if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
      dst.renameTo(old)
    }
    new java.io.File(tmp).renameTo(dst)
    val old = new java.io.File(path + ".old")
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
  }
}
