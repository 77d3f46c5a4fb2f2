package org.apache.spark.sql.execution.streaming.state

/** Forwarder for the package-private [[StateStore.unloadAll]]: bench and
  * query-harness hygiene needs to drop the RocksDB state-store providers a
  * STOPPED streaming query leaves loaded (native memory + maintenance
  * threads measurably tax unrelated queries later in a bench pass). Spark
  * exposes no public API for this; a one-line forwarder scoped into the
  * owning package is the narrowest possible bridge.
  */
object GraftStateStoreAccess {
  def unloadAll(): Unit = StateStore.unloadAll()
}
