package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Release helper for `localCheckpoint()`ed frames.
  *
  * `Dataset.unpersist` routes through the CacheManager, which tracks only
  * `persist()`/`cache()` entries — a checkpoint-backed Dataset is a
  * `LogicalRDD` over a directly-persisted RDD, so `ds.unpersist()` on one
  * is a SILENT NO-OP (measured: `graft.CkProbe`-style storage counts stay
  * flat through `ds.unpersist(blocking = true)` and drop only when the
  * underlying `LogicalRDD.rdd` is unpersisted). Every iterative loop that
  * re-checkpoints per round (connected components, the distributed Lloyd
  * trainer, the fence-pricing pass) must release through THIS helper or it
  * accumulates one dead edge-list/sample copy per round for the life of
  * the session — block-count regression pinned in ScaleMechanicsSpec.
  */
object Checkpoints {

  /** Unpersist the RDD(s) behind a checkpoint-backed frame. Safe on any
    * Dataset: frames with no `LogicalRDD` leaf are left untouched.
    */
  def release(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
