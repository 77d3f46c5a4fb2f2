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
  *  - The commit is ONE rename-without-overwrite of the manifest
  *    `commits/<queryId>-<batchId>.json` naming the attempt's files, via
  *    `FileContext.rename(.., Options.Rename.NONE)` — the Hadoop primitive
  *    whose CONTRACT forbids replacing an existing destination on every
  *    implementation (plain `FileSystem.rename` on RawLocalFileSystem
  *    delegates to POSIX rename, which overwrites — a zombie could replace
  *    an already-committed manifest). After the rename the committer
  *    re-reads the manifest and only treats the commit as won if the
  *    attempt id inside is its own — committed-wins, like the reference's
  *    `transactional.id` fencing.
  *  - A replayed micro-batch (failure/restart re-runs the last epoch) finds
  *    its manifest already committed and SKIPS — the transactional fence
  *    that makes checkpointed at-least-once delivery exactly-once.
  *  - `read` consumes ONLY the files the manifests name ("read_committed"):
  *    uncommitted and orphaned attempts are invisible. All committed files
  *    are read in ONE parquet relation (flat plan regardless of batch
  *    count); the per-batch commit order joins in via a broadcast
  *    file→offset map on `input_file_name`, ordered by parsed
  *    (queryId, numeric batchId) — not file-name lexicography.
  *  - Every `checkpointEvery` commits the writer rolls all committed
  *    manifests into `commits/_ckpt-<n>.json` (table-format checkpointing):
  *    `read` then parses ONE checkpoint file plus only the manifests that
  *    landed after it — O(1) driver I/O + tail instead of O(batches).
  *    Individual manifests are kept (they are the replay fence and the
  *    recovery source if a checkpoint is lost); name-derived batch ids
  *    decide coverage, so uncovered manifests are found without parsing.
  *
  * Scale shape: data files are written by executors in parallel (plain
  * parquet write); only the manifest rename is driver-side, O(1) per batch.
  */
final case class TxnLogSink(topicDir: String, checkpointEvery: Int = 100) {

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
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(topicDir).getFileSystem(conf)
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
    // publish WITHOUT overwrite. On the local FS the atomic primitive is a
    // HARD LINK (kernel-level EEXIST): the Hadoop local layers are
    // ChecksumFileSystem, whose rename moves the data file and its .crc
    // sidecar as TWO operations — concurrent committers can tear them,
    // leaving a manifest whose checksum mismatches and is unreadable by
    // every reader (measured under an 8-thread race). On non-local
    // filesystems FileContext.rename with Options.Rename.NONE is the
    // single-metadata-op no-overwrite rename (HDFS-style).
    val renamed =
      if (fs.getScheme == "file") {
        // the link target is the staged data file only; the committed
        // manifest carries no .crc sidecar, which ChecksumFileSystem reads
        // happily (checksum verification is skipped when no crc exists)
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(committed.toUri.getPath),
            java.nio.file.Paths.get(stage.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException | _: java.io.IOException => false }
      } else
        try {
          org.apache.hadoop.fs.FileContext.getFileContext(committed.toUri, conf)
            .rename(stage, committed, org.apache.hadoop.fs.Options.Rename.NONE)
          true
        } catch { case _: java.io.IOException => false }
    // committed-wins verification: the commit is ours only if the manifest
    // on disk names OUR attempt — belt-and-braces against any FS whose
    // no-overwrite rename is check-then-act rather than atomic.
    // Loss-vs-unknown matters in BOTH directions. Deleting our data on a
    // TRANSIENT read failure after a successful rename would leave a
    // committed manifest pointing at deleted files; deleting it on a
    // transient RENAME failure with no winning manifest on disk would let
    // Spark mark the epoch committed with its data gone — silent loss from
    // an exactly-once sink. So the attempt dir is deleted ONLY on the one
    // POSITIVE loss signal (a READABLE committed manifest naming another
    // attempt); a failed rename with no such proof FAILS the micro-batch so
    // Spark replays the epoch, and an unreadable manifest after a
    // successful rename keeps the data (worst case: an orphaned, invisible
    // attempt dir).
    val verdict = scala.util.Try(parseManifest(fs, committed))
    fs.delete(stage, true) // staged copy is dead on every outcome
    TxnLogSink.commitOutcome(renamed, verdict.map(_.attempt), attempt) match {
      case TxnLogSink.CommitOutcome.Lost =>
        // lost the race to a concurrent committer: discard our attempt entirely
        fs.delete(dir, true)
      case TxnLogSink.CommitOutcome.Unconfirmed =>
        // rename failed and nothing on disk proves another committer won:
        // a transient IO failure must replay the epoch, never drop it
        throw new java.io.IOException(
          s"txn-log commit of $committed could not be confirmed " +
            "(rename failed, no readable committed manifest); failing the batch for replay")
      case TxnLogSink.CommitOutcome.Won =>
        if (checkpointEvery > 0 && (batchId + 1) % checkpointEvery == 0) compact(spark)
      case TxnLogSink.CommitOutcome.CommittedUnverified =>
        () // the epoch is durably committed; only compaction eligibility is unknown
    }
  }

  private case class Commit(queryId: String, batchId: Long, attempt: String, files: Seq[String])

  /** One JsonNode → Commit mapping shared by manifest and checkpoint
    * parsing (and mirrored by the two writers); a missing field means a
    * corrupt file and throws with the offending path.
    */
  private def nodeToCommit(
      node: com.fasterxml.jackson.databind.JsonNode, p: Path): Commit = {
    import scala.jdk.CollectionConverters._
    def field(n: String): com.fasterxml.jackson.databind.JsonNode = {
      val f = node.get(n)
      if (f == null) throw new java.io.IOException(s"corrupt commit file $p: missing field '$n'")
      f
    }
    Commit(
      field("queryId").asText(),
      field("batchId").asLong(),
      field("attempt").asText(),
      field("files").elements().asScala.map(_.asText()).toSeq)
  }

  /** Strict parse — corruption THROWS (the read path must fail loudly:
    * silently skipping an unreadable manifest would make its batch vanish
    * from every read while the replay fence still blocks re-committing it).
    */
  private def parseManifest(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Commit = {
    val body = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    nodeToCommit(new com.fasterxml.jackson.databind.ObjectMapper().readTree(body), p)
  }

  /** Checkpoint files sort by the count of commits they cover. */
  private def ckptName(n: Int) = f"_ckpt-$n%012d.json"
  private val CkptRe = "_ckpt-(\\d+)\\.json".r

  private def latestCheckpoint(
      fs: org.apache.hadoop.fs.FileSystem): Option[Path] = {
    if (!fs.exists(commitsDir)) return None
    fs.listStatus(commitsDir).map(_.getPath)
      .filter(p => CkptRe.pattern.matcher(p.getName).matches())
      .sortBy(_.getName).lastOption
  }

  private def parseCheckpoint(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[Commit] = {
    val body = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    import scala.jdk.CollectionConverters._
    val commits = node.get("commits")
    if (commits == null) throw new java.io.IOException(s"corrupt checkpoint $p: missing 'commits'")
    commits.elements().asScala.map(nodeToCommit(_, p)).toSeq
  }

  /** Full committed view: one checkpoint parse + only the manifests the
    * checkpoint does not cover (coverage decided from the
    * `<queryId>-<batchId>.json` NAME — no parse needed for covered ones).
    */
  private def committedManifests(fs: org.apache.hadoop.fs.FileSystem): Seq[Commit] = {
    if (!fs.exists(commitsDir)) return Seq.empty
    // a checkpoint retired by a concurrent compaction mid-read degrades to
    // the full manifest scan — never to an error or a partial view
    val base = latestCheckpoint(fs)
      .flatMap(p => scala.util.Try(parseCheckpoint(fs, p)).toOption)
      .getOrElse(Seq.empty)
    val covered = base.map(c => (c.queryId, c.batchId)).toSet
    val tail = fs.listStatus(commitsDir)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.endsWith(".json") && !n.startsWith(".") && !n.startsWith("_")
      }
      .filter { p =>
        val stem = p.getName.stripSuffix(".json")
        val cut = stem.lastIndexOf('-') // queryId never contains '-'
        cut < 0 || !scala.util.Try(stem.substring(cut + 1).toLong).toOption
          .exists(b => covered.contains((stem.substring(0, cut), b)))
      }
      .map(parseManifest(fs, _)) // corrupt manifest → loud failure, never a silent gap
    (base ++ tail)
      .sortBy(c => (c.queryId, c.batchId)) // numeric batch order, never lexicographic
      .toSeq
  }

  /** Roll every committed manifest into one checkpoint file. Individual
    * manifests stay in place (replay fence + recovery); reads just stop
    * parsing them. Idempotent and safe to run concurrently with writers:
    * a commit landing mid-compaction is simply not covered yet and remains
    * part of the read tail.
    */
  def compact(spark: SparkSession): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(topicDir).getFileSystem(conf)
    val commits = committedManifests(fs)
    if (commits.isEmpty) return
    val body = commits.map { c =>
      val fl = c.files.map(f => s""""$f"""").mkString("[", ", ", "]")
      s"""    {"queryId": "${c.queryId}", "batchId": ${c.batchId}, "attempt": "${c.attempt}", "files": $fl}"""
    }.mkString("{\n  \"commits\": [\n", ",\n", "\n  ]\n}\n")
    val target = new Path(commitsDir, ckptName(commits.size))
    if (fs.exists(target)) return // same coverage already checkpointed
    val stage = new Path(commitsDir, s".${target.getName}.staging")
    val out = fs.create(stage, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    // overwrite-tolerant rename: two racing compactions of the same count
    // write identical content, either winning is correct
    if (!fs.rename(stage, target)) fs.delete(stage, true)
    // retire superseded checkpoints — ONLY once the new one is actually on
    // disk (a failed rename must not leave the log with zero checkpoints)
    if (fs.exists(target)) {
      fs.listStatus(commitsDir).map(_.getPath)
        .filter(p => CkptRe.pattern.matcher(p.getName).matches() && p.getName < target.getName)
        .foreach(fs.delete(_, false))
    }
  }

  /** Committed (queryId, batchId) pairs — the multi-writer high-water view
    * ([[MultiWriterIndex]] derives its fold fence from this). Driver cost
    * is the [[read]] envelope: one checkpoint parse plus only the
    * manifests the checkpoint does not cover.
    */
  def committedEpochs(spark: SparkSession): Seq[(String, Long)] = {
    val fs = new Path(topicDir).getFileSystem(spark.sessionState.newHadoopConf())
    committedManifests(fs).map(c => (c.queryId, c.batchId))
  }

  /** Committed rows from epochs in `(above(writer), upTo(writer)]` — the
    * [[MultiWriterIndex]] fold/serve slice. A commit `(w, b)` is included
    * iff `b > above.getOrElse(w, -1)` and, when `upTo` is given,
    * `b <= upTo(w)` (a writer absent from `upTo` contributes nothing).
    * The commit list is captured EAGERLY at call time — the returned
    * frame's file set cannot drift if another writer commits while a
    * downstream fence evaluates it (the fold-vs-live-writer race). `None`
    * when no commit falls in the range (an empty parquet relation has no
    * schema to offer); data columns only.
    */
  def readSlice(
      spark: SparkSession,
      above: Map[String, Long] = Map.empty,
      upTo: Option[Map[String, Long]] = None
  ): Option[DataFrame] = {
    val fs = new Path(topicDir).getFileSystem(spark.sessionState.newHadoopConf())
    val commits = committedManifests(fs).filter { c =>
      c.batchId > above.getOrElse(c.queryId, -1L) &&
        upTo.forall(m => c.batchId <= m.getOrElse(c.queryId, -1L))
    }
    if (commits.isEmpty) None
    else {
      val paths = for { c <- commits; f <- c.files } yield s"$topicDir/data/${c.attempt}/$f"
      Some(spark.read.parquet(paths: _*))
    }
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

object TxnLogSink {

  /** Outcome of one manifest-commit attempt. Exposed (graft-private) so
    * the decision table is unit-testable without injecting FS failures.
    */
  private[graft] sealed trait CommitOutcome
  private[graft] object CommitOutcome {
    /** Our rename landed and the manifest readably names us. */
    case object Won extends CommitOutcome
    /** A readable committed manifest names ANOTHER attempt — the only
      * positive proof of loss; our attempt data may be deleted.
      */
    case object Lost extends CommitOutcome
    /** The manifest readably names us (or our rename landed but the
      * read-back failed transiently): the epoch is durably committed, but
      * we skip compaction rather than act on an unverified state.
      */
    case object CommittedUnverified extends CommitOutcome
    /** Rename failed AND no readable manifest proves a winner: the batch
      * must FAIL so Spark replays the epoch — deleting here would lose it.
      */
    case object Unconfirmed extends CommitOutcome
  }

  private[graft] def commitOutcome(
      renamed: Boolean,
      manifestAttempt: scala.util.Try[String],
      attempt: String): CommitOutcome = manifestAttempt match {
    case scala.util.Success(a) if a == attempt =>
      // the manifest names us even if our rename call THREW post-success
      // (e.g. a timeout after the metadata op landed): committed either way
      if (renamed) CommitOutcome.Won else CommitOutcome.CommittedUnverified
    case scala.util.Success(_) => CommitOutcome.Lost
    case scala.util.Failure(_) =>
      if (renamed) CommitOutcome.CommittedUnverified else CommitOutcome.Unconfirmed
  }
}
