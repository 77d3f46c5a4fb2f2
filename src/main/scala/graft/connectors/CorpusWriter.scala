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
}
