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
  *  - Each write ATTEMPT gets its own data directory
  *    `data/<queryId>-<batchId>-<attemptUuid>/`; attempts never share or
  *    clobber files, so a zombie writer racing a replay can only produce an
  *    orphaned attempt directory, never corrupt a committed one.
  *  - The commit is ONE atomic rename of the manifest
  *    `commits/<queryId>-<batchId>.json` naming the attempt's files. A
  *    manifest either exists entirely or not at all; whichever attempt's
  *    rename lands first wins, the loser deletes its own orphan.
  *  - A replayed micro-batch (failure/restart re-runs the last epoch) finds
  *    its manifest already committed and SKIPS — the transactional fence
  *    that makes checkpointed at-least-once delivery exactly-once.
  *  - `read` consumes ONLY the files the manifests name ("read_committed"):
  *    uncommitted and orphaned attempts are invisible. All committed files
  *    are read in ONE parquet relation (flat plan regardless of batch
  *    count); the per-batch commit order joins in via a broadcast
  *    file→offset map on `input_file_name`, ordered by parsed
  *    (queryId, numeric batchId) — not file-name lexicography.
  *
  * Scale shape: data files are written by executors in parallel (plain
  * parquet write); only the manifest rename is driver-side, O(1) per batch.
  */
final case class TxnLogSink(topicDir: String) {

  private def commitsDir = new Path(topicDir, "commits")
  private def manifest(queryId: String, batchId: Long) =
    new Path(commitsDir, s"$queryId-$batchId.json")

  /** foreachBatch writer. `queryId` is the transactional fence id — stable
    * across restarts of the same logical query (the reference's
    * `transactional.id`).
    */
  def writer(queryId: String)(batch: DataFrame, batchId: Long): Unit = {
    require(!queryId.contains("-") && !queryId.contains("/"),
      s"queryId must not contain '-' or '/': $queryId")
    val spark = batch.sparkSession
    val fs = new Path(topicDir).getFileSystem(spark.sessionState.newHadoopConf())
    val committed = manifest(queryId, batchId)
    if (fs.exists(committed)) return // replayed epoch: already committed, skip
    // per-attempt directory: concurrent attempts (zombie + replacement)
    // each write their own files; only the manifest race picks the winner
    val attempt = s"$queryId-$batchId-${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val dir = new Path(topicDir, s"data/$attempt")
    batch.write.mode("overwrite").parquet(dir.toString)
    val files = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted
    val body = files.map(f => s"""    "$f"""").mkString(
      s"""{\n  "queryId": "$queryId",\n  "batchId": $batchId,\n  "attempt": "$attempt",\n  "files": [\n""",
      ",\n",
      "\n  ]\n}\n")
    fs.mkdirs(commitsDir)
    val stage = new Path(commitsDir, s".$attempt.staging")
    val out = fs.create(stage, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    val won = fs.rename(stage, committed) && fs.exists(committed)
    if (!won) {
      // lost the race to a concurrent committer: discard our attempt entirely
      fs.delete(stage, true)
      fs.delete(dir, true)
    }
  }

  private case class Commit(queryId: String, batchId: Long, attempt: String, files: Seq[String])

  private def committedManifests(fs: org.apache.hadoop.fs.FileSystem): Seq[Commit] = {
    if (!fs.exists(commitsDir)) return Seq.empty
    fs.listStatus(commitsDir)
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".json") && !p.getName.startsWith("."))
      .map { p =>
        val body = {
          val in = fs.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        import scala.jdk.CollectionConverters._
        Commit(
          node.get("queryId").asText(),
          node.get("batchId").asLong(),
          node.get("attempt").asText(),
          node.get("files").elements().asScala.map(_.asText()).toSeq)
      }
      .sortBy(c => (c.queryId, c.batchId)) // numeric batch order, never lexicographic
      .toSeq
  }

  /** Committed view of the log: only manifest-named files, in
    * (queryId, numeric batchId) commit order via `_commit_order`.
    */
  def read(spark: SparkSession): DataFrame = {
    val fs = new Path(topicDir).getFileSystem(spark.sessionState.newHadoopConf())
    val commits = committedManifests(fs)
    if (commits.isEmpty) return spark.emptyDataFrame
    // one flat relation over every committed file + a broadcast
    // (attempt/file -> offset) map; attempt dirs make the suffix unique
    val fileToOffset = for {
      (c, off) <- commits.zipWithIndex
      f <- c.files
    } yield (s"${c.attempt}/$f", off.toLong)
    val paths = fileToOffset.map { case (suffix, _) => s"$topicDir/data/$suffix" }
    import spark.implicits._
    val offsets = broadcast(fileToOffset.toDF("_suffix", "_commit_order"))
    val tail2 = regexp_extract(input_file_name(), "([^/]+/[^/]+)$", 1)
    spark.read.parquet(paths: _*)
      .withColumn("_suffix", url_decode(tail2))
      .join(offsets, Seq("_suffix"))
      .drop("_suffix")
  }
}
