package graft.connectors

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Hash-bucketed keyed parquet table: parquet files under `bucket=K`
  * directories of `path`, bucket = `pmod(hash(key), numBuckets)`.
  *
  * A micro-batch merge rewrites ONLY the buckets its keys hash into and swaps
  * them with Hadoop `FileSystem.rename` — O(touched buckets × bucket size)
  * per batch, never O(table), and no `java.io.File` (works on HDFS;
  * object stores get copy-on-rename, the standard caveat — swap for a
  * table-format MERGE there). This is the scale shape of the reference's
  * idempotent `replaceOne(_id, doc, upsert=true)` bulkWrite
  * (connector/mongo/MongoSinkBuilder.java:105-139).
  */
final case class KeyedParquetTable(path: String, keyCol: String, numBuckets: Int = 64) {

  def bucketOf(key: Column): Column = pmod(hash(key), lit(numBuckets))

  /** Orphaned buckets: `.old-b` directories whose `bucket=b` is missing — a
    * writer died between `rename(dst → old)` and `rename(src → dst)`, so
    * `.old-b` holds that bucket's only copy.
    */
  private def orphanedOldDirs(fs: org.apache.hadoop.fs.FileSystem): Seq[Path] = {
    val root = new Path(path)
    val parent = root.getParent
    if (parent == null || !fs.exists(parent)) return Seq.empty
    val prefix = root.getName + ".old-"
    fs.listStatus(parent).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith(prefix))
      .filter(p => !fs.exists(new Path(root, s"bucket=${p.getName.stripPrefix(prefix)}")))
  }

  /** Crash recovery — WRITE PATH ONLY (single writer; a reader must never
    * rename directories, or it races an in-flight swap and the writer's
    * unchecked rename would drop the staged merge). Restores orphaned
    * `.old-b` dirs; an `.old-b` next to a committed bucket is stale and is
    * deleted.
    */
  private def recoverOrphans(fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val root = new Path(path)
    val parent = root.getParent
    if (parent == null || !fs.exists(parent)) return
    val prefix = root.getName + ".old-"
    fs.listStatus(parent).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(prefix)) {
        val dst = new Path(root, s"bucket=${n.stripPrefix(prefix)}")
        if (!fs.exists(dst)) {
          require(fs.rename(st.getPath, dst), s"orphan recovery rename failed: $n")
        } else fs.delete(st.getPath, true)
      }
    }
  }

  /** Read the table (bucket partition column dropped); `empty` supplies the
    * schema when the table doesn't exist yet. Read-only crash repair: any
    * orphaned `.old-b` (mid-swap crash) is INCLUDED in the view without
    * renaming anything — mutating from the read path would race a
    * concurrent writer's swap window.
    */
  def readOr(spark: SparkSession, empty: => DataFrame): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val orphans = orphanedOldDirs(fs)
    val main =
      if (fs.exists(root) && fs.listStatus(root).nonEmpty)
        Some(spark.read.parquet(path).drop("bucket"))
      else None
    val parts = main.toSeq ++ orphans.map(p => spark.read.parquet(p.toString))
    if (parts.isEmpty) empty else parts.reduce(_.unionByName(_))
  }

  /** Merge one batch: rows in `upserts` replace-or-insert by key, keys in
    * `deleteKeys` are removed. Caller guarantees one row per key in
    * `upserts` and that the two frames' keys are disjoint (last op per key
    * already decided). Untouched buckets are not read, not rewritten, not
    * renamed. Replaying the same batch converges to the same table state
    * (idempotent — what makes checkpointed at-least-once effectively
    * exactly-once end-to-end).
    */
  def mergeBatch(upserts: DataFrame, deleteKeys: DataFrame, batchId: Long): Unit = {
    val spark = upserts.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    recoverOrphans(fs)
    // persist both frames: their lineage (typically the lastOpPerKey window
    // over the micro-batch) would otherwise be evaluated twice — once for
    // the touched-bucket probe, once for the merged write. At 100 TB/batch
    // that is 2× sink-side CPU.
    val up = upserts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val del = deleteKeys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = up.select(bucketOf(col(keyCol)).as("_b"))
        .unionByName(del.select(bucketOf(col(keyCol)).as("_b")))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return
      // current rows of the touched buckets only — the isin filter prunes to
      // the bucket=K directories, untouched buckets are never scanned
      val current =
        if (fs.exists(root) && fs.listStatus(root).nonEmpty)
          spark.read.parquet(path)
            .filter(col("bucket").isin(touched: _*))
            .drop("bucket")
        else up.limit(0)
      val touchedKeys = up.select(col(keyCol))
        .unionByName(del.select(col(keyCol)))
        .distinct()
      // repartition by bucket before the partitioned write: without it every
      // task writes a sliver of every touched bucket (tasks × buckets small
      // files — the classic compaction killer at scale); with it each bucket's
      // rows land in one task (AQE coalesces the tiny ones)
      val merged = current
        .join(touchedKeys, Seq(keyCol), "left_anti")
        .unionByName(up)
        .withColumn("bucket", bucketOf(col(keyCol)))
        .repartition(col("bucket"))
      val stage = new Path(path + s".stage-$batchId")
      merged.write.mode("overwrite").partitionBy("bucket").parquet(stage.toString)
      // per-bucket swap; a bucket whose rows were all deleted has no staged
      // directory and is simply removed. `.old-b` is deleted only AFTER the
      // new bucket directory is committed — if the driver dies mid-swap the
      // bucket's data survives in `.old-b` and recoverOrphans restores it.
      fs.mkdirs(root)
      touched.foreach { b =>
        val dst = new Path(root, s"bucket=$b")
        val src = new Path(stage, s"bucket=$b")
        val old = new Path(path + s".old-$b")
        if (fs.exists(old)) fs.delete(old, true)
        // renames are the commit points — a silent false here would let the
        // stage cleanup below discard the only copy of the merged bucket
        if (fs.exists(dst)) require(fs.rename(dst, old), s"swap-aside rename failed: bucket=$b")
        if (fs.exists(src)) require(fs.rename(src, dst), s"swap-in rename failed: bucket=$b")
        fs.delete(old, true)
      }
      fs.delete(stage, true)
    } finally {
      up.unpersist()
      del.unpersist()
    }
  }
}

/** Keyed upsert sink (the Mongo-sink analogue, fixture-backed).
  *
  * Reference connector/mongo/MongoSinkBuilder.java:37-230: batches of 500 or
  * a 1 s flush, DELETE → DeleteOneModel(_id), everything else idempotent
  * `replaceOne(_id, doc, upsert=true)`, unordered bulkWrite; individual
  * write failures route to the DLQ (:158-191).
  *
  * Spark mapping: micro-batches ARE the batching (no hand-rolled timer);
  * each `foreachBatch` applies the replace-or-delete merge to a
  * [[KeyedParquetTable]] — touched buckets only, Hadoop-FS renames.
  * `applyBatch` is the pure merge (unit-tested, engine-grade);
  * `splitWritable` is the per-row failure channel (rows the store would
  * reject go to a DLQ frame instead of failing the batch or silently
  * merging); `writer` wires both to a directory.
  */
object UpsertSink {

  /** Buckets per table. Sized so a bucket stays a few GB at the target
    * scale; 64 is right for the fixture tables — a 100 TB deployment sizes
    * this as table_size / desired_partition_size.
    */
  val DefaultBuckets = 64

  /** Pure merge: apply `updates` (envelope frame: primaryKey, operation,
    * payloadJson, eventTime, ...) onto `current` keyed by `_id`.
    * Last update per key within the batch wins (ordered by ts, then tie);
    * DELETE removes the key.
    */
  def applyBatch(current: DataFrame, updates: DataFrame, tsCol: String, tieCol: String): DataFrame = {
    val (upserts, deletes) = lastOpPerKey(updates, tsCol, tieCol)
    val touched = upserts.select(col("_id")).unionByName(deletes).distinct()
    current
      .join(touched, Seq("_id"), "left_anti") // untouched rows
      .unionByName(upserts) // replaced/inserted rows
  }

  /** Decide the surviving operation per key within a batch: one upsert row
    * per non-deleted key (projected to the table schema) and the set of
    * deleted keys.
    */
  private def lastOpPerKey(updates: DataFrame, tsCol: String, tieCol: String): (DataFrame, DataFrame) = {
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
    (upserts, deletes)
  }

  /** Per-row failure channel, mirroring the reference's per-write DLQ
    * routing (MongoSinkBuilder.java:158-191): rows the keyed store would
    * reject — null/empty key, or a non-delete whose payload is not a JSON
    * object — split into a rejected frame (with `_reject_reason`) instead
    * of failing the batch or silently merging garbage.
    *
    */
  def splitWritable(batch: DataFrame): (DataFrame, DataFrame) = {
    val isDelete = upper(col("operation")) === "DELETE"
    val payloadObj = from_json(col("payloadJson"), MapType(StringType, StringType))
    val reason = when(col("primaryKey").isNull || length(col("primaryKey")) === 0, "null_key")
      .when(!isDelete && (col("payloadJson").isNull || payloadObj.isNull), "malformed_payload")
    // ComputeOnce pins the probe to one evaluation per row: pushdown would
    // otherwise substitute the whole reason expression (payload parse
    // included) into both split predicates (see EnvelopeParser scaladoc)
    val tagged = batch.withColumn("_reject_reason", graft.functions.ComputeOnce(reason))
    (
      tagged.filter(col("_reject_reason").isNull).drop("_reject_reason"),
      tagged.filter(col("_reject_reason").isNotNull)
    )
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
    KeyedParquetTable(path, "_id").readOr(spark, emptyTable(spark))

  /** foreachBatch writer maintaining the keyed table at `path`: per-row DLQ
    * split, then a touched-buckets-only merge (see [[KeyedParquetTable]]).
    * Rejected rows append to `dlqPath` as DlqEvent frames when set.
    */
  def writer(
      path: String,
      tsCol: String = "eventTime",
      tieCol: String = "traceId",
      numBuckets: Int = DefaultBuckets,
      dlqPath: Option[String] = None
  )(batch: DataFrame, batchId: Long): Unit = {
    val (writable, rejected) = splitWritable(batch)
    dlqPath.foreach { p =>
      graft.core.Dlq
        .toDlq(
          rejected,
          graft.model.ErrorCodes.ConstraintViolation,
          col("_reject_reason"),
          "UpsertSink",
          col("payloadJson"))
        .write.mode("append").parquet(p)
    }
    val (upserts, deletes) = lastOpPerKey(writable, tsCol, tieCol)
    KeyedParquetTable(path, "_id", numBuckets).mergeBatch(upserts, deletes, batchId)
  }
}
