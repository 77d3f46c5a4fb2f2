package graft.connectors

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional append log: the exactly-once TOPIC sink analogue of the
  * reference's transactional Kafka mode
  * (connector/kafka/KafkaSinkBuilder.java:87-109 — producer transactions
  * fenced by `transactional.id`, consumers reading `read_committed`).
  *
  * Spark's Kafka sink has no producer transactions, so the keyed sinks get
  * exactly-once from idempotent writes + compaction. This sink closes the
  * remaining gap — exactly-once APPENDS (no key required) — with the
  * mechanism every table format uses: a two-phase manifest commit.
  *
  *  - Data files for (queryId, batchId) are written under `data/` with
  *    names only their manifest knows — uncommitted or orphaned files are
  *    invisible to readers ("read_committed").
  *  - The commit is ONE atomic rename of the manifest
  *    `commits/<queryId>-<batchId>.json` listing those files. A manifest
  *    either exists entirely or not at all; there is no torn state.
  *  - A replayed micro-batch (failure/restart re-runs the last epoch) finds
  *    its manifest already committed and SKIPS — the transactional fence
  *    that makes checkpointed at-least-once delivery exactly-once. A zombie
  *    writer racing the replay loses the manifest rename and its data files
  *    stay orphaned (never read).
  *
  * Scale shape: data files are written by executors in parallel (plain
  * parquet write); only the final rename is driver-side, O(1) per batch.
  * `read` unions committed files in (queryId, batchId) order — the log's
  * offset order.
  */
final case class TxnLogSink(topicDir: String) {

  private def commitsDir = new Path(topicDir, "commits")
  private def dataDir(queryId: String, batchId: Long) =
    new Path(topicDir, s"data/$queryId-$batchId")
  private def manifest(queryId: String, batchId: Long) =
    new Path(commitsDir, s"$queryId-$batchId.json")

  /** foreachBatch writer. `queryId` is the transactional fence id — stable
    * across restarts of the same logical query (the reference's
    * `transactional.id`).
    */
  def writer(queryId: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(topicDir).getFileSystem(spark.sessionState.newHadoopConf())
    val committed = manifest(queryId, batchId)
    if (fs.exists(committed)) return // replayed epoch: already committed, skip
    val dir = dataDir(queryId, batchId)
    if (fs.exists(dir)) fs.delete(dir, true) // zombie leftovers from a crash
    batch.write.mode("overwrite").parquet(dir.toString)
    // two-phase commit: stage the manifest, then one atomic rename publishes
    val files = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted
    val body = files.map(f => s"""    "$f"""").mkString(
      s"""{\n  "queryId": "$queryId",\n  "batchId": $batchId,\n  "files": [\n""",
      ",\n",
      "\n  ]\n}\n")
    fs.mkdirs(commitsDir)
    val stage = new Path(commitsDir, s".$queryId-$batchId.staging")
    val out = fs.create(stage, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(stage, committed)) {
      fs.delete(stage, true) // lost the race to a concurrent committer — fine
    }
  }

  /** Committed view of the log, in (queryId, batchId) commit order —
    * uncommitted/orphaned data files are never read.
    */
  def read(spark: SparkSession): DataFrame = {
    val fs = new Path(topicDir).getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(commitsDir)) return spark.emptyDataFrame
    val committed = fs.listStatus(commitsDir)
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .sorted
      .map { n =>
        val base = n.stripSuffix(".json")
        val i = base.lastIndexOf('-')
        (base.substring(0, i), base.substring(i + 1).toLong)
      }
    if (committed.isEmpty) return spark.emptyDataFrame
    committed.zipWithIndex
      .map { case ((q, b), off) =>
        spark.read.parquet(dataDir(q, b).toString).withColumn("_commit_order", lit(off.toLong))
      }
      .reduce(_.unionByName(_))
  }
}
