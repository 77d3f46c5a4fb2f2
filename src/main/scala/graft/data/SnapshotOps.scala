package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-corpus operators: snapshot diffing and delta-vs-index dedup.
  *
  * A production training corpus is never rebuilt from zero — each crawl
  * ships a delta, and the pipeline must answer "what changed?" and "which
  * of the new docs are already in the corpus?" WITHOUT rereading the
  * 100 TB it already ingested. Both operators therefore work on content
  * FINGERPRINTS: the text collapses to a 16-byte md5 at the scan, and
  * everything after — the diff join, the dedup window, the index probe —
  * moves (id, hash) pairs only. At 100 TB of text that is a ~0.05%-of-bytes
  * shuffle, the same never-move-the-payload rule as [[Dedup.exactDedup]].
  */
object SnapshotOps {

  /** Classify every document across two corpus snapshots as
    * `added` (in curr only), `removed` (in prev only), `changed` (both,
    * different content) or `unchanged`.
    *
    * Scale shape: each side reduces to (id, md5) at its scan — column
    * pruning drops the text before the exchange — then ONE full-outer
    * hash join on id. Ids are unique per snapshot, so the join is 1:1
    * with no fan-out; AQE handles the (rare) skewed id range. The status
    * verdict is a pure function of the two hashes, reproducible across
    * partitionings.
    */
  def snapshotDiff(
      prev: DataFrame,
      curr: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    // explicit presence flags: inferring presence from hash nullness would
    // misclassify a doc whose TEXT is null (md5(null) = null) as
    // added/removed even when the id exists on both sides
    val p = prev.select(
      col(idCol).as("_id"), md5(col(textCol)).as("prev_hash"), lit(true).as("_in_prev"))
    val c = curr.select(
      col(idCol).as("_id"), md5(col(textCol)).as("curr_hash"), lit(true).as("_in_curr"))
    p.join(c, Seq("_id"), "full_outer")
      .select(
        col("_id").as(idCol),
        when(col("_in_prev").isNull, lit("added"))
          .when(col("_in_curr").isNull, lit("removed"))
          .when(col("prev_hash") <=> col("curr_hash"), lit("unchanged"))
          .otherwise(lit("changed"))
          .as("status"))
  }

  /** Dedup a delta batch against an already-ingested corpus: each delta row
    * gets a verdict — `dup_corpus` (content already in the index),
    * `dup_delta` (a duplicate within the batch; the lowest id is the keeper)
    * or `new` (survives both gates).
    *
    * `corpusIndex` is any frame with a `textCol` column representing the
    * ingested corpus (in production: the persisted hash manifest, passed as
    * a frame of hashes via [[incrementalDedupByHash]]). Scale shape: the
    * index collapses to DISTINCT hashes (bounded by unique-content count,
    * not corpus bytes); the delta joins it on the 16-byte hash — for a
    * typical delta ≪ corpus, broadcast the DELTA-side hash set or
    * bloom-prune the index probe exactly as
    * [[Decontaminate.decontaminateBloom]] does; the equi-join form below
    * lets AQE pick. The within-batch window shares the same
    * hash-partitioning as the join, so the whole verdict costs one
    * exchange of (hash, id) pairs.
    */
  def incrementalDedup(
      corpusIndex: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame =
    incrementalDedupByHash(
      corpusIndex.select(md5(col(textCol)).as("content_hash")),
      delta,
      idCol,
      textCol)

  /** [[incrementalDedup]] against a pre-built hash manifest — the shape a
    * real pipeline runs, where the corpus index is maintained as a compact
    * (content_hash) table and never recomputed from text.
    */
  def incrementalDedupByHash(
      hashIndex: DataFrame,
      delta: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val idx = hashIndex.select(col("content_hash")).distinct()
      .withColumn("_in_corpus", lit(true))
    val w = Window.partitionBy(col("content_hash"))
    delta
      .select(col(idCol), md5(col(textCol)).as("content_hash"))
      .join(idx, Seq("content_hash"), "left")
      .withColumn("_keep_id", min(col(idCol)).over(w))
      .select(
        col(idCol),
        col("content_hash"),
        when(col("_in_corpus"), lit("dup_corpus"))
          .when(col(idCol) =!= col("_keep_id"), lit("dup_delta"))
          .otherwise(lit("new"))
          .as("verdict"))
  }
}
