package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model.StreamEnvelop
import graft.stateful.Processors

/** transformWithState (Spark 4 StatefulProcessor) operator faces.
  * Requires the RocksDB state store provider — set per-query via the
  * session conf before starting the stream.
  */
class ProcessorsSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def mkEnv(op: String, pk: String, payload: String, tsSec: Long): StreamEnvelop =
    StreamEnvelop(op, "src", payload, new Timestamp(tsSec * 1000), new Timestamp(tsSec * 1000), s"t-$pk-$tsSec", pk, Map.empty)

  test("Processors.dedup (transformWithState): first-seen-wins across micro-batches") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[StreamEnvelop]
      val out = Processors.dedup(mem.toDS(), _.primaryKey, ttlMs = 0)
      val q = out.writeStream.format("memory").queryName("tws_dedup").outputMode("append").start()
      try {
        mem.addData(mkEnv("i", "a", "{}", 1), mkEnv("i", "a", "{}", 2), mkEnv("i", "b", "{}", 3))
        q.processAllAvailable()
        mem.addData(mkEnv("i", "a", "{}", 4), mkEnv("i", "c", "{}", 5))
        q.processAllAvailable()
        val got = spark.table("tws_dedup").select("primaryKey").as[String].collect().sorted
        assert(got === Array("a", "b", "c"))
      } finally q.stop()
    }
  }

  test("Processors.cdcPipeline: DELETE after a payload-equal update is not suppressed") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[StreamEnvelop]
      val out = Processors.cdcPipeline(mem.toDS(), ttlMs = 0, Set("updatedAt"))
      val q = out.writeStream.format("memory").queryName("tws_cdc_op").outputMode("append").start()
      try {
        // update canonicalizes to {"_id": 1} after exclusion — equal to the
        // delete's documentKey payload; __op in the composite keeps the
        // DELETE flowing (ADVICE r1 high)
        mem.addData(
          mkEnv("update", "1", """{"_id": 1, "updatedAt": 100}""", 1),
          mkEnv("delete", "1", """{"_id": 1}""", 2))
        q.processAllAvailable()
        val got = spark.table("tws_cdc_op").select("operation").as[String].collect().sorted
        assert(got === Array("delete", "update"))
      } finally q.stop()
    }
  }

  test("Processors.materialize (transformWithState): changelog with delete reset") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[StreamEnvelop]
      val out = Processors.materialize(mem.toDS(), _.operation == "delete", ttlMs = 0)
      val q = out.writeStream.format("memory").queryName("tws_mat").outputMode("append").start()
      try {
        mem.addData(mkEnv("insert", "a", """{"v":1}""", 1))
        q.processAllAvailable()
        mem.addData(mkEnv("update", "a", """{"v":2}""", 2), mkEnv("delete", "a", null, 3))
        q.processAllAvailable()
        mem.addData(mkEnv("insert", "a", """{"v":3}""", 4))
        q.processAllAvailable()
        val got = spark.table("tws_mat").as[graft.model.ChangelogEvent].collect().sortBy(_.timestamp.getTime)
        assert(got.map(_.changeType).toSeq === Seq("INSERT", "UPDATE", "DELETE", "INSERT"))
        assert(got(1).before === Some("""{"v":1}"""))
        assert(got(3).before === None)
      } finally q.stop()
    }
  }

  test("Processors.flowDisruption (transformWithState): timer fires DISRUPTED, next event RECOVERED") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[StreamEnvelop]
      val out = Processors.flowDisruption(mem.toDS(), _.source, timeoutMs = 1500)
      val q = out.writeStream.format("memory").queryName("tws_flow").outputMode("append").start()
      try {
        // NOTE: no processAllAvailable here — in processing-time mode the
        // engine runs continuous timer batches which starve it; poll instead.
        mem.addData(mkEnv("i", "a", "{}", 1))
        val deadline = System.currentTimeMillis() + 30000
        def signals() = spark.table("tws_flow").select("kind").as[String].collect().toSeq
        while (!signals().contains("DISRUPTED") && System.currentTimeMillis() < deadline)
          Thread.sleep(250)
        assert(signals().contains("DISRUPTED"), s"timer never fired: ${signals()}")
        mem.addData(mkEnv("i", "a", "{}", 2))
        val deadline2 = System.currentTimeMillis() + 30000
        while (!signals().contains("RECOVERED") && System.currentTimeMillis() < deadline2)
          Thread.sleep(250)
        assert(signals().contains("RECOVERED"), s"no recovery: ${signals()}")
      } finally q.stop()
    }
  }
}
