package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.joins.{DynamicJoiner, StaticJoiner}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("StaticJoiner.enrich: broadcast left join with miss passthrough") {
    val main = Seq((1, "a"), (2, "b"), (3, null.asInstanceOf[String])).toDF("id", "k")
    val ref = Seq(("a", "A1")).toDF("rk", "v")
    val out = StaticJoiner("k", "rk").enrich(main, ref, Seq("v"))
    val got = out.select("id", "v").as[(Int, Option[String])].collect().toMap
    assert(got === Map(1 -> Some("A1"), 2 -> None, 3 -> None))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("StaticJoiner.latestPerKey is last-write-wins") {
    val ref = Seq(
      ("a", 1L, 1L, "old"),
      ("a", 5L, 2L, "new"),
      ("b", 3L, 3L, "only")
    ).toDF("rk", "sec", "tie", "v")
      .withColumn("ts", timestamp_seconds($"sec"))
    val out = StaticJoiner("k", "rk").latestPerKey(ref, "ts", "tie")
    val got = out.select("rk", "v").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "new", "b" -> "only"))
  }

  test("DynamicJoiner.batch: N:M within TTL, left outer emits unmatched") {
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq(("k", 1, ts(100)), ("k", 2, ts(500)), ("x", 3, ts(100)))
      .toDF("l_key", "l_id", "l_ts")
    val right = Seq(("k", 10, ts(110)), ("k", 11, ts(120)), ("y", 12, ts(100)))
      .toDF("r_key", "r_id", "r_ts")
    val out = DynamicJoiner("l_key", "r_key", "l_ts", "r_ts", ttlMs = 60 * 1000, joinType = "left_outer")
      .batch(left, right)
      .select("l_id", "r_id").as[(Int, Option[Int])].collect().toSet
    // l1 matches both rights (N:M); l2 out of window; l3 no key match
    assert(out === Set((1, Some(10)), (1, Some(11)), (2, None), (3, None)))
  }

  test("DynamicJoiner.streaming left outer: unmatched left emits once watermark expires its window") {
    implicit val sc = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000)
    val lMem = MemoryStream[(String, Int, Timestamp)]
    val rMem = MemoryStream[(String, Int, Timestamp)]
    val joined = DynamicJoiner("l_key", "r_key", "l_ts", "r_ts", ttlMs = 10 * 1000, joinType = "left_outer")
      .streaming(
        lMem.toDF().toDF("l_key", "l_id", "l_ts"),
        rMem.toDF().toDF("r_key", "r_id", "r_ts"),
        delay = "10 seconds")
      .select("l_id", "r_id")
    val q = joined.writeStream.format("memory").queryName("ss_outer").outputMode("append").start()
    try {
      lMem.addData(("k", 1, ts(100))) // never matched
      rMem.addData(("x", 99, ts(100)))
      q.processAllAvailable()
      // no emission yet: watermark hasn't passed the join window
      assert(spark.table("ss_outer").count() === 0)
      // advance watermark on BOTH inputs far past 100s+ttl+delay
      lMem.addData(("k2", 2, ts(1000)))
      rMem.addData(("x2", 98, ts(1000)))
      q.processAllAvailable()
      lMem.addData(("k3", 3, ts(1100)))
      rMem.addData(("x3", 97, ts(1100)))
      q.processAllAvailable()
      val got = spark.table("ss_outer").as[(Int, Option[Int])].collect().toSet
      assert(got.contains((1, None)), s"unmatched left not emitted: $got")
    } finally q.stop()
  }

  test("DynamicJoiner.streaming: watermarked stream-stream inner join matches within window") {
    implicit val sc = spark.sqlContext
    def ts(s: Long) = new Timestamp(s * 1000)
    val lMem = MemoryStream[(String, Int, Timestamp)]
    val rMem = MemoryStream[(String, Int, Timestamp)]
    val left = lMem.toDF().toDF("l_key", "l_id", "l_ts")
    val right = rMem.toDF().toDF("r_key", "r_id", "r_ts")
    val joined = DynamicJoiner("l_key", "r_key", "l_ts", "r_ts", ttlMs = 60 * 1000)
      .streaming(left, right, delay = "2 minutes")
      .select("l_id", "r_id")
    val q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try {
      lMem.addData(("k", 1, ts(100)))
      rMem.addData(("k", 10, ts(130)), ("k", 11, ts(300)))
      q.processAllAvailable()
      val got = spark.table("ss_join").as[(Int, Int)].collect().toSet
      assert(got === Set((1, 10))) // 300s is outside +-60s of 100s
    } finally q.stop()
  }
}
