package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.StreamEnvelop
import graft.stateful._

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def mkEnv(op: String, pk: String, payload: String, tsSec: Long): StreamEnvelop =
    StreamEnvelop(op, "src", payload, new Timestamp(tsSec * 1000), new Timestamp(tsSec * 1000), s"t-$pk-$tsSec", pk, Map.empty)

  // ------------------------------------------------------------ batch faces

  test("Deduplicator.batch keeps first row per key by (ts, tie)") {
    val df = Seq(
      ("k1", 10L, 1L, "a"),
      ("k1", 5L, 2L, "b"),
      ("k2", 7L, 3L, "c"),
      ("k1", 5L, 0L, "d") // same ts as 'b', lower tie -> wins over b
    ).toDF("k", "ts", "tie", "v")
      .withColumn("ts", timestamp_seconds($"ts"))
    val out = Deduplicator(Seq("k")).batch(df, "ts", "tie")
    assert(out.select("v").as[String].collect().sorted === Array("c", "d"))
  }

  test("Deduplicator.batchWithin: same survivors as batch, windowed by the parent key only") {
    // deterministic frame with duplicate (k, ts) groups and distinct ties
    val rows = for {
      k <- Seq("a", "b", "c")
      ts <- 1L to 5L
      rep <- 0L until (ts % 3 + 1)
    } yield (k, ts, s"payload-${(ts * 7 + rep * 13) % 11}")
    val df = rows.toDF("k", "tsRaw", "payload")
      .withColumn("ts", timestamp_seconds($"tsRaw"))
    val viaBatch = Deduplicator(Seq("k", "ts")).batch(df, "ts", "payload")
      .select("k", "tsRaw", "payload").as[(String, Long, String)].collect().sorted
    val viaWithin = Deduplicator(Seq("k", "ts"))
      .batchWithin(df, Seq("k"), Seq("ts"), "ts", "payload")
      .select("k", "tsRaw", "payload").as[(String, Long, String)].collect().sorted
    assert(viaWithin === viaBatch)
    // and the plan shuffles on the PARENT key only (what lets a downstream
    // pk-window reuse the exchange)
    val plan = Deduplicator(Seq("k", "ts"))
      .batchWithin(df, Seq("k"), Seq("ts"), "ts", "payload")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k#"), "expected a k-only exchange")
    assert("hashpartitioning\\(k#\\d+, ts".r.findFirstIn(plan).isEmpty,
      "unexpected composite-key exchange")
  }

  test("StatefulMerger.batch suppresses unchanged payloads, ignores excluded fields") {
    val df = Seq(
      ("k1", 1L, """{"a": 1, "updatedAt": 100}"""),
      ("k1", 2L, """{"updatedAt": 200, "a": 1}"""), // same after exclusion + key order
      ("k1", 3L, """{"a": 2, "updatedAt": 300}"""), // changed
      ("k1", 4L, """{"a": 2}""") // unchanged (updatedAt excluded anyway)
    ).toDF("k", "tie", "payload")
      .withColumn("ts", timestamp_seconds($"tie"))
    val out = StatefulMerger(Seq("k"), "payload", Seq("updatedAt")).batch(df, "ts", "tie")
    assert(out.select("tie").as[Long].collect().sorted === Array(1L, 3L))
  }

  test("StatefulMerger with opCol: a DELETE after a payload-equal update still flows") {
    // the reference hashes __op + payload: an update touching only excluded
    // fields canonicalizes to {"_id": X}, equal to the delete's documentKey
    // payload — without the op in the composite the DELETE is suppressed and
    // downstream stores keep deleted documents (ADVICE r1, high)
    val df = Seq(
      ("1", 1L, "insert", """{"_id": 1, "updatedAt": 100}"""),
      ("1", 2L, "update", """{"_id": 1, "updatedAt": 200}"""), // canon equal, op differs -> emitted
      ("1", 3L, "update", """{"_id": 1, "updatedAt": 300}"""), // canon AND op equal -> suppressed
      ("1", 4L, "delete", """{"_id": 1}""") // canon equal to prior, op differs -> MUST emit
    ).toDF("k", "tie", "operation", "payload")
      .withColumn("ts", timestamp_seconds($"tie"))
    val withOp = StatefulMerger(Seq("k"), "payload", Seq("updatedAt"), opCol = Some("operation"))
      .batch(df, "ts", "tie")
    assert(withOp.select("tie").as[Long].collect().sorted === Array(1L, 2L, 4L))
    // without opCol the delete IS suppressed — pins why opCol exists
    val withoutOp = StatefulMerger(Seq("k"), "payload", Seq("updatedAt")).batch(df, "ts", "tie")
    assert(withoutOp.select("tie").as[Long].collect().sorted === Array(1L))
  }

  test("Materializer.batchChangelog: INSERT/UPDATE/DELETE lifecycle with state reset") {
    val df = Seq(
      ("k1", 1L, "ins", """{"v": 1}"""),
      ("k1", 2L, "upd", """{"v": 2}"""),
      ("k1", 3L, "del", null.asInstanceOf[String]),
      ("k1", 4L, "del", null.asInstanceOf[String]), // delete w/o state: skipped
      ("k1", 5L, "ins", """{"v": 3}""") // re-insert after delete
    ).toDF("k", "tie", "op", "payload")
      .withColumn("ts", timestamp_seconds($"tie"))
    val out = Materializer("k", "payload", col("op") === "del")
      .batchChangelog(df, "ts", "tie")
      .orderBy("ts")
      .select("change_type", "before", "after")
      .as[(String, Option[String], Option[String])]
      .collect()
    assert(out.map(_._1).toSeq === Seq("INSERT", "UPDATE", "DELETE", "INSERT"))
    assert(out(1)._2 === Some("""{"v": 1}""") && out(1)._3 === Some("""{"v": 2}"""))
    assert(out(2)._2 === Some("""{"v": 2}""") && out(2)._3 === None)
    assert(out(3)._2 === None && out(3)._3 === Some("""{"v": 3}"""))
  }

  test("SessionAnalyzer batch: gap splits sessions, end = last event + gap") {
    val df = Seq(
      ("u1", 0L, 1L, "login"),
      ("u1", 60L, 2L, "click"),
      ("u1", 4000L, 3L, "buy"), // > 30min gap -> new session
      ("u2", 0L, 4L, "view")
    ).toDF("user", "sec", "tie", "action")
      .withColumn("ts", timestamp_seconds($"sec"))
    val out = SessionAnalyzer("user", "ts", "30 minutes")
      .analyze(df, "action", "tie")
      .orderBy("key", "session_start_us")
      .collect()
    assert(out.length === 3)
    val s1 = out(0)
    assert(s1.getAs[String]("key") === "u1")
    assert(s1.getAs[Long]("event_count") === 2)
    assert(s1.getAs[String]("actions") === "login,click")
    // end = last event (60s) + 30min
    assert(s1.getAs[Long]("session_end_us") === (60L + 1800L) * 1000000L)
    assert(out(1).getAs[String]("actions") === "buy")
  }

  // -------------------------------------------------------- streaming faces

  test("Deduplicator.streamingExact drops duplicates across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamEnvelop]
    val out = Deduplicator(Seq.empty, ttlMs = 0)
      .streamingExact(mem.toDS(), e => e.primaryKey)
    val q = out.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(mkEnv("insert", "a", "{}", 1), mkEnv("insert", "a", "{}", 2), mkEnv("insert", "b", "{}", 3))
      q.processAllAvailable()
      mem.addData(mkEnv("insert", "a", "{}", 4), mkEnv("insert", "c", "{}", 5))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("primaryKey").as[String].collect().sorted
      assert(got === Array("a", "b", "c"))
    } finally q.stop()
  }

  test("StatefulMerger.streaming suppresses per-key unchanged payloads across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamEnvelop]
    val out = StatefulMerger(Seq("primaryKey"), "payloadJson", Seq("updatedAt"), ttlMs = 0)
      .streaming(mem.toDS(), _.primaryKey)
    val q = out.writeStream.format("memory").queryName("merger_out").outputMode("append").start()
    try {
      mem.addData(
        mkEnv("u", "a", """{"x": 1, "updatedAt": 1}""", 1),
        mkEnv("u", "a", """{"x": 1, "updatedAt": 2}""", 2)
      )
      q.processAllAvailable()
      mem.addData(
        mkEnv("u", "a", """{"updatedAt": 3, "x": 1}""", 3), // still unchanged
        mkEnv("u", "a", """{"x": 2}""", 4) // changed
      )
      q.processAllAvailable()
      val got = spark.table("merger_out").select("traceId").as[String].collect().sorted
      assert(got === Array("t-a-1", "t-a-4"))
    } finally q.stop()
  }

  test("Materializer.streaming emits changelog across batches with delete reset") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamEnvelop]
    val out = Materializer("primaryKey", "payloadJson", lit(true), ttlMs = 0)
      .streaming(mem.toDS(), _.operation == "delete")
    val q = out.writeStream.format("memory").queryName("mat_out").outputMode("append").start()
    try {
      mem.addData(mkEnv("insert", "a", """{"v":1}""", 1))
      q.processAllAvailable()
      mem.addData(mkEnv("update", "a", """{"v":2}""", 2), mkEnv("delete", "a", null, 3))
      q.processAllAvailable()
      mem.addData(mkEnv("insert", "a", """{"v":3}""", 4))
      q.processAllAvailable()
      val got = spark.table("mat_out").as[graft.model.ChangelogEvent].collect().sortBy(_.timestamp.getTime)
      assert(got.map(_.changeType).toSeq === Seq("INSERT", "UPDATE", "DELETE", "INSERT"))
      assert(got(2).before === Some("""{"v":2}"""))
    } finally q.stop()
  }

  test("SessionAnalyzer streaming: sessions close once watermark passes gap") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamEnvelop]
    val out = SessionAnalyzer("primaryKey", "eventTime", "10 seconds")
      .analyze(mem.toDS().toDF(), actionCol = "operation", tieCol = "traceId")
    val q = out.writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      mem.addData(mkEnv("a1", "u1", "{}", 100), mkEnv("a2", "u1", "{}", 105))
      q.processAllAvailable()
      // advance watermark far past the session end
      mem.addData(mkEnv("a3", "u1", "{}", 1000))
      q.processAllAvailable()
      mem.addData(mkEnv("a4", "u1", "{}", 2000))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .select("event_count", "actions").as[(Long, String)].collect()
      assert(got.contains((2L, "a1,a2")))
    } finally q.stop()
  }

  // ------------------------------------------------- GroupState TTL contract
  //
  // Spark clears a stored timeout whenever the function runs for a key
  // without re-setting it (FlatMapGroupsWithStateExec writes NO_TIMESTAMP),
  // so a duplicate-only invocation that skips setTimeoutDuration silently
  // cancels the pending TTL: state never expires, the key never re-emits
  // (ADVICE r2, high ×2). Pinned with TestGroupState.

  import org.apache.spark.api.java.Optional
  import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

  private def mkState[S](init: Option[S], nowMs: Long, timedOut: Boolean = false): TestGroupState[S] =
    TestGroupState.create[S](
      init.map(Optional.of[S]).getOrElse(Optional.empty[S]()),
      GroupStateTimeout.ProcessingTimeTimeout,
      nowMs,
      Optional.empty[Long](),
      timedOut)

  test("Deduplicator TTL: duplicate-only invocation re-arms timeout without moving the deadline") {
    val d = Deduplicator(Seq("k"), ttlMs = 10000)
    // first sight at t=1000 -> emit, deadline 11000, timer armed
    val s1 = mkState[Long](None, 1000)
    assert(d.stateFunc("k", Iterator(mkEnv("i", "k", "{}", 1)), s1).size === 1)
    assert(s1.get === 11000L)
    assert(s1.getTimeoutTimestampMs.get === 11000L)
    // duplicate at t=5000 -> suppressed, but timer MUST be re-armed to the
    // same deadline (the bug: skipping this cancels the TTL outright)
    val s2 = mkState[Long](Some(s1.get), 5000)
    assert(d.stateFunc("k", Iterator(mkEnv("i", "k", "{}", 2)), s2).isEmpty)
    assert(s2.getTimeoutTimestampMs.isPresent, "duplicate-only invocation cancelled the TTL")
    assert(s2.getTimeoutTimestampMs.get === 11000L, "duplicate postponed the expiry deadline")
    // timer fires -> state removed; the key then re-emits as fresh
    val s3 = mkState[Long](Some(s1.get), 12000, timedOut = true)
    assert(d.stateFunc("k", Iterator.empty, s3).isEmpty && s3.isRemoved)
    val s4 = mkState[Long](None, 13000)
    assert(d.stateFunc("k", Iterator(mkEnv("i", "k", "{}", 3)), s4).size === 1)
  }

  test("StatefulMerger TTL: suppressed batch re-arms; accepted write re-anchors the deadline") {
    val m = StatefulMerger(Seq("k"), "payloadJson", ttlMs = 10000)
    // accepted write at t=1000 -> deadline 11000
    val s1 = mkState[(Long, Long)](None, 1000)
    assert(m.stateFunc("k", Iterator(mkEnv("u", "k", """{"x":1}""", 1)), s1).size === 1)
    assert(s1.get._2 === 11000L && s1.getTimeoutTimestampMs.get === 11000L)
    // all-suppressed batch at t=5000 -> out.isEmpty, but the pending TTL
    // keeps running from the stored deadline instead of being cleared
    val s2 = mkState[(Long, Long)](Some(s1.get), 5000)
    assert(m.stateFunc("k", Iterator(mkEnv("u", "k", """{"x":1}""", 2)), s2).isEmpty)
    assert(s2.getTimeoutTimestampMs.isPresent, "suppressed-only batch cancelled the 24h TTL")
    assert(s2.getTimeoutTimestampMs.get === 11000L)
    // a CHANGED payload at t=7000 is an accepted write -> OnCreateAndWrite
    // re-anchors the deadline to now+ttl
    val s3 = mkState[(Long, Long)](Some(s1.get), 7000)
    assert(m.stateFunc("k", Iterator(mkEnv("u", "k", """{"x":2}""", 3)), s3).size === 1)
    assert(s3.getTimeoutTimestampMs.get === 17000L)
    // expiry removes state; the same payload then re-emits
    val s4 = mkState[(Long, Long)](Some(s3.get), 18000, timedOut = true)
    assert(m.stateFunc("k", Iterator.empty, s4).isEmpty && s4.isRemoved)
    val s5 = mkState[(Long, Long)](None, 19000)
    assert(m.stateFunc("k", Iterator(mkEnv("u", "k", """{"x":2}""", 4)), s5).size === 1)
  }

  test("StatefulMerger.batch with opCol: null operation does not null-suppress the row") {
    // concat(null) nulls _canon, and `null =!= null` is null -> filter drops
    // the row unconditionally (ADVICE r2, low); coalesce to "∅" keeps the
    // payload comparison live
    val df = Seq(
      ("k", 1L, null.asInstanceOf[String], """{"a": 1}"""),
      ("k", 2L, null.asInstanceOf[String], """{"a": 1}"""), // same payload -> suppressed
      ("k", 3L, null.asInstanceOf[String], """{"a": 2}""") // changed payload -> MUST emit
    ).toDF("k", "tie", "operation", "payload")
      .withColumn("ts", timestamp_seconds($"tie"))
    val out = StatefulMerger(Seq("k"), "payload", opCol = Some("operation")).batch(df, "ts", "tie")
    assert(out.select("tie").as[Long].collect().sorted === Array(1L, 3L))
  }

  test("FlowDisruptionDetector.streaming: no signals while flow is healthy") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamEnvelop]
    val out = FlowDisruptionDetector.streaming(mem.toDS(), _.source, timeoutMs = 0)
    val q = out.writeStream.format("memory").queryName("flow_out").outputMode("append").start()
    try {
      mem.addData(mkEnv("i", "a", "{}", 1), mkEnv("i", "b", "{}", 2))
      q.processAllAvailable()
      assert(spark.table("flow_out").count() === 0)
    } finally q.stop()
  }
}
