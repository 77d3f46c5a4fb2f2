package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class CdcV2Spec extends SparkSpec {
  import spark.implicits._

  private def writeLog(dir: String, name: String, rows: Seq[String]): Unit =
    Files.writeString(Paths.get(s"$dir/$name"), rows.mkString("\n"))

  private def ev(op: String, id: Int, v: Int, ts: String): String =
    s"""{"op":"$op","db":"d","collection":"c","documentKey":"{\\"_id\\": $id}","fullDocument":"{\\"_id\\": $id, \\"v\\": $v}","updatedFields":null,"eventTime":"$ts"}"""

  test("graft-cdc batch read: all splits union to the full log, split filter partitions") {
    val dir = Files.createTempDirectory("cdcv2").toString
    writeLog(dir, "000001.json", (1 to 10).map(i => ev("insert", i, i, "2024-01-01T00:00:00Z")))
    val df = spark.read.format("graft-cdc").option("path", dir).option("numSplits", "3").load()
    assert(df.count() === 10)
    assert(df.select(get_json_object($"documentKey", "$._id").cast("int")).as[Int].collect().sorted === (1 to 10).toArray)
    assert(df.schema === graft.connectors.CdcSource.cdcSchema)
  }

  test("graft-cdc micro-batch: resume-token offsets deliver each event exactly once across batches") {
    val dir = Files.createTempDirectory("cdcv2s").toString
    val ckpt = Files.createTempDirectory("cdcv2ck").toString
    val out = Files.createTempDirectory("cdcv2out").toString + "/sink"
    writeLog(dir, "000001.json", Seq(ev("insert", 1, 10, "2024-01-01T00:00:00Z")))
    val stream = spark.readStream.format("graft-cdc")
      .option("path", dir).option("numSplits", "2").load()
    def sink() = stream.writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .outputMode("append").start()
    def readOut() = spark.read.parquet(out)
    val q = sink()
    try {
      q.processAllAvailable()
      assert(readOut().count() === 1)
      // new log segment arrives -> only the delta is read
      writeLog(dir, "000002.json", Seq(
        ev("update", 1, 20, "2024-01-01T00:01:00Z"),
        ev("delete", 2, 0, "2024-01-01T00:02:00Z")))
      q.processAllAvailable()
      val got = readOut()
        .select($"op", get_json_object($"documentKey", "$._id").cast("int"))
        .as[(String, Int)].collect().sorted
      assert(got === Array(("delete", 2), ("insert", 1), ("update", 1)))
    } finally q.stop()

    // restart with the SAME checkpoint: nothing re-emitted (token resume)
    val q2 = sink()
    try {
      q2.processAllAvailable()
      assert(readOut().count() === 3)
      // and a fresh segment after restart flows
      writeLog(dir, "000003.json", Seq(ev("insert", 3, 30, "2024-01-01T00:03:00Z")))
      q2.processAllAvailable()
      assert(readOut().count() === 4)
    } finally q2.stop()
  }

  test("graft-cdc feeds the CDC parser end-to-end") {
    val dir = Files.createTempDirectory("cdcv2p").toString
    writeLog(dir, "000001.json", Seq(ev("u", 7, 70, "2024-01-01T00:00:00Z")))
    val df = spark.read.format("graft-cdc").option("path", dir).load()
    val parsed = graft.parsers.CdcParser.parse(df, clock = lit("2024-07-01").cast("timestamp"))
    val row = parsed.select($"operation", $"primaryKey", get_json_object($"payloadJson", "$.v")).head()
    assert(row.getString(0) === "update")
    assert(row.getString(1) === "7")
    assert(row.getString(2) === "70")
  }
}
