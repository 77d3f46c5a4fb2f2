package graft.connectors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output layout for large corpora: date-partitioned, range-distributed,
  * sorted-within-files parquet.
  *
  * At 100 TB the write layout IS the read performance of every downstream
  * job: `partitionBy` gives partition pruning on the time axis,
  * `repartitionByRange` keeps each output file a contiguous key range
  * (min/max footer stats → row-group skipping on key predicates), and
  * `sortWithinPartitions` makes the ranges tight. `filesPerDay` controls
  * file sizing — target ~1 GB files, not the shuffle-partition count.
  */
object CorpusWriter {

  /** True when `dt` contains a MapType anywhere — such columns cannot feed
    * xxhash64 (Spark disallows map hashing; iteration order is undefined).
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
    case _ => false
  }

  def writeTimePartitioned(
      df: DataFrame,
      path: String,
      tsCol: String,
      keyCol: String,
      filesPerDay: Int
  ): Unit =
    df.withColumn("_date", to_date(col(tsCol)))
      .repartitionByRange(filesPerDay, col("_date"), col(keyCol))
      .sortWithinPartitions(col("_date"), col(keyCol))
      .write
      .mode("overwrite")
      .partitionBy("_date")
      .parquet(path)

  /** Small-file compaction — the maintenance pass every streaming sink
    * needs: micro-batches write a file per trigger per partition, and a
    * week of that turns a table into millions of KB-files whose open/footer
    * overhead dominates every downstream scan. Rewrites `srcPath` into
    * `dstPath` as ceil(totalBytes / targetFileBytes) files.
    *
    * Sizing comes from the FILE MANIFEST (driver-side listing — metadata,
    * not data), so no extra scan of the table. With `keyCols` the rewrite
    * range-partitions + sorts, restoring tight min/max footer stats for
    * row-group skipping (compaction is the natural moment to re-sort:
    * you're rewriting anyway); without, it round-robins rows evenly.
    * Rewrite-to-new-path rather than in-place: the swap is the caller's
    * one atomic rename, and a crashed compaction leaves the source intact.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String,
      dstPath: String,
      targetFileBytes: Long,
      keyCols: Seq[String] = Nil,
      partitionCols: Seq[String] = Nil
  ): Unit = {
    require(targetFileBytes > 0, s"compact: targetFileBytes must be positive, got $targetFileBytes")
    val hadoopPath = new org.apache.hadoop.fs.Path(srcPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hadoopPath, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) totalBytes += f.getLen
    }
    // clamp: a tiny target over a huge table must not overflow Int and
    // hand repartition() a negative count
    val nFiles = math.min(
      math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes),
      Int.MaxValue.toLong).toInt
    val src = spark.read.parquet(srcPath)
    // a partitioned source (writeTimePartitioned's layout) must stay
    // partitioned — compacting it flat would silently destroy the
    // time-axis pruning the layout exists for, so callers pass the
    // partition columns and the rewrite re-emits partitionBy with the
    // partition key leading the range distribution (keeps each output
    // task writing into few partition dirs)
    val orderCols = (partitionCols ++ keyCols).map(col)
    // trailing content-hash tiebreaker in the RANGE distribution (not the
    // sort): with low-cardinality order columns alone, repartitionByRange
    // cannot form nFiles distinct ranges — every row of one (date, key)
    // value collapses into a single task and its file blows past
    // targetFileBytes. The tiebreaker lets ranges split WITHIN a key value,
    // so file sizing holds at any key cardinality, while files still cover
    // contiguous key ranges and the within-file sort (footer min/max stats)
    // is unchanged. xxhash64 over the hashable columns, not
    // monotonically_increasing_id(): the id is a function of (partitionId,
    // row order), so under a task/stage retry a row could re-route to a
    // different reducer across attempts — the duplicate/lost-row hazard
    // SPARK-23207 fixed for round-robin. A content hash routes each row
    // identically on every attempt. MapType columns are excluded (Spark
    // rejects hashing maps — map iteration order is undefined, so their
    // hash would not be content-deterministic anyway). EXACT duplicate rows
    // all share one hash value, so a heavily duplicated pre-dedup corpus
    // can still overfill a file within one hash value — the accepted cost
    // of retry-determinism; compact AFTER dedup, or lead keyCols with a
    // unique id, when that matters.
    val hashable = src.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toSeq
    val laidOut =
      if (orderCols.nonEmpty) {
        val rangeCols =
          if (hashable.nonEmpty) orderCols :+ xxhash64(hashable: _*) else orderCols
        src.repartitionByRange(nFiles, rangeCols: _*)
          .sortWithinPartitions(orderCols: _*)
      } else src.repartition(nFiles)
    val writer = laidOut.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dstPath)
  }
}
