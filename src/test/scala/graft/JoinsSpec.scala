package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.joins.{AsOfJoin, DynamicJoiner, RangeJoin, StaticJoiner}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("AsOfJoin.latestAsOf: latest version at-or-before each event, nulls before first") {
    val left = Seq(
      (1L, "k", 50L),   // before any version -> null
      (2L, "k", 100L),  // exactly at v1 -> inclusive match
      (3L, "k", 150L),  // between v1 and v2 -> v1
      (4L, "k", 200L),  // at v2 -> v2
      (5L, "k", 999L),  // far after -> v2
      (6L, "z", 500L)   // key with no versions at all -> null
    ).toDF("id", "k", "sec").withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    val right = Seq(
      ("k", 100L, 1L, "cfg1"),
      ("k", 200L, 2L, null.asInstanceOf[String]) // null FIELD must still win
    ).toDF("k", "sec", "ver", "tag")
      .withColumn("vts", timestamp_seconds($"sec")).drop("sec")
    val out = AsOfJoin.latestAsOf(left, right, Seq("k"), "ts", "vts", Seq("ver", "tag"))
    val got = out
      .select($"id", $"asof_ver", $"asof_tag")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (id, v, t) => id -> ((v, t)) }.toMap
    assert(out.columns.toSeq === Seq("id", "k", "ts", "asof_ts", "asof_ver", "asof_tag"))
    assert(got(1L) === ((None, None)))
    assert(got(2L) === ((Some(1L), Some("cfg1"))))
    assert(got(3L) === ((Some(1L), Some("cfg1"))))
    // v2's tag is a legitimate null: the running last() must NOT skip back
    // to v1's non-null tag (the whole-struct carry pins this)
    assert(got(4L) === ((Some(2L), None)))
    assert(got(5L) === ((Some(2L), None)))
    assert(got(6L) === ((None, None)))
    // plan shape: one exchange on the key, no join node at all
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan.take(1500))
  }

  test("j4_asof_join benched entry: window face fans out past the 5-type regime") {
    // r5 benched the window face keyed on event_type (5 distinct values), so
    // the whole union sorted in 5 tasks — its own scaladoc's worst case. The
    // entry is now keyed on user_id; pin that the single hash exchange
    // actually spreads rows across more than 5 partitions.
    // the shared test session runs 4 shuffle partitions + AQE coalescing —
    // widen the shuffle and pin partitioning for the duration of this probe,
    // restoring whatever values the session actually had (not hardcoded
    // defaults, which would clobber config if SparkSpec ever changes)
    val prevParts = spark.conf.getOption("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    def restore(key: String, v: Option[String]): Unit = v match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = graft.queries.JoinQueries.j4AsOfJoin(spark, sf)
      val partsWithRows = out.rdd
        .mapPartitionsWithIndex((i, it) => if (it.hasNext) Iterator(i) else Iterator.empty)
        .distinct().count()
      assert(partsWithRows > 5, s"window-face as-of concentrated into $partsWithRows partitions")
      // and the plan stays join-free (the whole point of the union+window face)
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("join"), plan.take(1500))
    } finally {
      restore("spark.sql.shuffle.partitions", prevParts)
      restore("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("AsOfJoin.latestAsOfBroadcast: same answers as the window face, broadcast plan") {
    val left = Seq(
      (1L, "k", 50L), (2L, "k", 100L), (3L, "k", 150L),
      (4L, "k", 200L), (5L, "k", 999L), (6L, "z", 500L)
    ).toDF("id", "k", "sec").withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    val right = Seq(
      ("k", 100L, 1L, "cfg1"),
      ("k", 200L, 2L, null.asInstanceOf[String])
    ).toDF("k", "sec", "ver", "tag")
      .withColumn("vts", timestamp_seconds($"sec")).drop("sec")
    val windowed = AsOfJoin.latestAsOf(left, right, Seq("k"), "ts", "vts", Seq("ver", "tag"))
    val broadcasted = AsOfJoin.latestAsOfBroadcast(left, right, Seq("k"), "ts", "vts", Seq("ver", "tag"))
    assert(broadcasted.columns.toSeq === windowed.columns.toSeq)
    val a = windowed.orderBy($"id").collect().toSeq
    val b = broadcasted.orderBy($"id").collect().toSeq
    assert(b === a)
    val plan = broadcasted.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("AsOfPick: generated code compiles under CODEGEN_ONLY (no silent interpreted fallback)") {
    // a Janino failure normally degrades to interpreted evaluation with no
    // plan marker (r4 lesson) — force codegen so it would throw instead
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val left = Seq((1L, "k", 50L), (2L, "k", 150L))
        .toDF("id", "k", "sec").withColumn("ts", timestamp_seconds($"sec")).drop("sec")
      val right = Seq(("k", 100L, 7L)).toDF("k", "sec", "ver")
        .withColumn("vts", timestamp_seconds($"sec")).drop("sec")
      val got = AsOfJoin.latestAsOfBroadcast(left, right, Seq("k"), "ts", "vts", Seq("ver"))
        .select($"id", $"asof_ver").as[(Long, Option[Long])].collect().toMap
      assert(got === Map(1L -> None, 2L -> Some(7L)))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("RangeJoin.intervalJoin: inclusive bounds, overlapping N:M, no duplicate pairs") {
    val pts = Seq((1L, "k", 5L), (2L, "k", 10L), (3L, "k", 25L), (4L, "x", 10L))
      .toDF("pid", "k", "p")
    val ivs = Seq(
      ("k", 10L, 20L, "a"),  // pid 2 at the inclusive start
      ("k", 0L, 10L, "b"),   // overlaps: pid 1 and pid 2 (inclusive end)
      ("k", 21L, 30L, "c"),  // pid 3
      ("x", 0L, 100L, "d")   // other key: only pid 4
    ).toDF("k", "s", "e", "w")
    // bucketWidth smaller than spans: intervals explode across buckets,
    // which is exactly where accidental duplicate emission would show up
    val out = RangeJoin.intervalJoin(pts, "p", ivs, "s", "e", Seq("k"), bucketWidth = 4L)
    val got = out.select($"pid", $"w").as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((1L, "b"), (2L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // negative points: floor bucketing, not truncation toward zero
    val negPts = Seq((9L, "k", -5L)).toDF("pid", "k", "p")
    val negIvs = Seq(("k", -7L, -4L, "n"), ("k", -3L, 0L, "m")).toDF("k", "s", "e", "w")
    val neg = RangeJoin.intervalJoin(negPts, "p", negIvs, "s", "e", Seq("k"), 4L)
      .select($"w").as[String].collect().toSeq
    assert(neg === Seq("n"))
    // plan shape: a shuffled equi-join, never a nested-loop/cartesian
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("nestedloop") && !plan.contains("cartesian"), plan.take(1500))
  }


  test("RangeJoin.intervalJoin: streaming points against static intervals (ingest-gate shape)") {
    implicit val sc = spark.sqlContext
    val ivs = Seq(("k", 0L, 10L, "w1"), ("k", 20L, 30L, "w2")).toDF("k", "s", "e", "w")
    val mem = MemoryStream[(Long, String, Long)]
    val joined = RangeJoin.intervalJoin(
      mem.toDS().toDF("pid", "k", "p"), "p", ivs, "s", "e", Seq("k"), bucketWidth = 8L)
    val q = joined.writeStream.format("memory").queryName("rj_stream").outputMode("append").start()
    try {
      mem.addData((1L, "k", 5L), (2L, "k", 15L), (3L, "k", 25L))
      q.processAllAvailable()
      val got = spark.table("rj_stream").select($"pid", $"w").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "w1"), (3L, "w2"))) // 15 falls in no window
      // later micro-batch joins against the same static side
      mem.addData((4L, "k", 10L)) // inclusive end of w1
      q.processAllAvailable()
      val got2 = spark.table("rj_stream").select($"pid", $"w").as[(Long, String)].collect().toSet
      assert(got2 === Set((1L, "w1"), (3L, "w2"), (4L, "w1")))
    } finally q.stop()
  }

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
