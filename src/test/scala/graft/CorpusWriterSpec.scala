package graft

import org.apache.spark.sql.functions._
import graft.connectors.CorpusWriter
import graft.joins.StaticJoiner

class CorpusWriterSpec extends SparkSpec {
  import spark.implicits._

  test("time-partitioned write: partition pruning reaches the scan") {
    val out = java.nio.file.Files.createTempDirectory("corpus").toString + "/events"
    CorpusWriter.writeTimePartitioned(
      graft.core.Tables.events(spark, sf), out, tsCol = "ts", keyCol = "user_id", filesPerDay = 4)
    val back = spark.read.parquet(out)
    assert(back.count() === graft.core.Tables.events(spark, sf).count())
    // partition pruning: a date filter must prune partitions at planning time
    val pruned = back.filter($"_date" === "2024-01-15")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(_date"), plan.take(1200))
    assert(pruned.count() > 0)
  }

  test("stream-static enrichment: StaticJoiner works inside a streaming query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val ref = Seq(("u1", "gold"), ("u2", "silver")).toDF("r_key", "tier")
    val mem = MemoryStream[(String, Int)]
    val enriched = StaticJoiner("user", "r_key")
      .enrich(mem.toDF().toDF("user", "amount"), ref, Seq("tier"))
    val q = enriched.writeStream.format("memory").queryName("ss_enrich").outputMode("append").start()
    try {
      mem.addData(("u1", 10), ("u3", 30))
      q.processAllAvailable()
      val got = spark.table("ss_enrich").select("user", "tier")
        .as[(String, Option[String])].collect().toMap
      assert(got === Map("u1" -> Some("gold"), "u3" -> None)) // miss passes through
    } finally q.stop()
  }
}
