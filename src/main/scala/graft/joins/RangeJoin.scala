package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows with a point column joined to right
  * rows carrying [start, end] intervals, on optional equi-keys plus
  * `start <= point <= end` (inclusive both ends). N:M — overlapping
  * intervals each match.
  *
  * Not in the reference engine; added for the training-pipeline surface
  * (events-into-campaign-windows, spans-over-timelines, token-offset
  * containment).
  *
  * Spark-first shape: Catalyst plans a raw `BETWEEN` predicate as a
  * broadcast-nested-loop (or worse, a cartesian) — O(|left| x |right|)
  * per key, the classic 100 TB scale killer. This operator BUCKETIZES the
  * dimension instead: a point falls in exactly one fixed-width bucket, an
  * interval is exploded into the few buckets it covers, and the join
  * becomes a plain shuffled equi-join on (keys, bucket) followed by the
  * exact range filter. Cost is linear in |left| + |right| x avgSpan/width,
  * with full shuffle parallelism on the bucket axis even when the equi-key
  * is low-cardinality (the bucket id fans every key across partitions —
  * time-skew inside one key redistributes for free).
  *
  * No pair is emitted twice: the left row owns ONE bucket, so each
  * (left, right) pair meets in exactly that bucket. Pick `bucketWidth`
  * near the typical interval length — much smaller multiplies the explode
  * factor, much larger piles unrelated rows into each bucket and shifts
  * work onto the post-join filter.
  */
object RangeJoin {

  /** @param left        point side
    * @param pointCol    numeric point column on `left` (e.g. micros since
    *                    epoch — compare as integers, never as timestamps)
    * @param right       interval side
    * @param startCol    inclusive lower bound on `right`
    * @param endCol      inclusive upper bound on `right`
    * @param keys        optional equi-key columns present on both sides
    * @param bucketWidth bucket size in the point column's units
    */
  def intervalJoin(
      left: DataFrame,
      pointCol: String,
      right: DataFrame,
      startCol: String,
      endCol: String,
      keys: Seq[String],
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // floor-division in LONG arithmetic (see CorpusOps banding): negative
    // points (pre-epoch micros) must land in the floor bucket, and a double
    // round-trip would mis-bucket |v| > 2^53 — hence SQL DIV, not `/`
    def bucketOf(c: String): Column =
      expr(s"CAST((CAST(`$c` AS BIGINT) - pmod(CAST(`$c` AS BIGINT), ${bucketWidth}L)) DIV ${bucketWidth}L AS BIGINT)")
    val l = left.withColumn("_rj_bucket", bucketOf(pointCol))
    val r = right.withColumn(
      "_rj_bucket",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    l.join(r, keys :+ "_rj_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_rj_bucket")
  }
}
