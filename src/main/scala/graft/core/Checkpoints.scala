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

  /** Unpersist the RDD(s) behind a checkpoint-backed frame.
    *
    * Scope contract: this releases EVERY `LogicalRDD` leaf reachable in the
    * analyzed plan — not just "the" checkpoint. Call it on the checkpoint
    * ROOT you own (the frame `localCheckpoint()` returned, or a projection
    * of exactly that one checkpoint), as every current call site does. On a
    * frame DERIVED from several checkpoints (e.g. a join of two
    * checkpointed inputs) it would release upstream checkpoints that may
    * still be shared with other live consumers — release each input
    * individually instead. Frames with no `LogicalRDD` leaf are left
    * untouched (a no-op, never an error).
    */
  def release(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking)
      case _ => ()
    }
}
