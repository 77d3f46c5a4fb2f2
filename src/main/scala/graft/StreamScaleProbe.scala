package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** sf0.1 → sf1 scale probe for the STREAMING stateful faces under the
  * RocksDB state store provider — the batch-face [[ScaleProbe]] never
  * exercises per-key state growth, micro-batch scheduling, or the RocksDB
  * native layer under data that exceeds heap comfort (VERDICT r7 #6).
  *
  * Faces (all file-stream driven — no driver-side MemoryStream staging,
  * the corpus streams from parquet exactly as a production file/CDC source
  * would):
  *  - `cdc_pipeline`: the flagship MongoToKafka streaming composition
  *    (fused dedup + change-suppression in ONE transformWithState pass,
  *    schema gate, per-epoch sinks)
  *  - `neardup_gate`: the banded-MinHash streaming near-dup candidate gate
  *    over `documents` (keyed bucket-owner state)
  *  - `asof_nolag` / `asof_lag`: the streaming as-of joiner with version
  *    history kept forever vs compacted behind the probe high-water mark
  *    (`compactLagUs`) — the knob's effect on state size, measured at both
  *    scales
  *
  * Prints wall seconds, total state rows, and state bytes (RocksDB SST +
  * in-memory) per (face, scale), plus the sf1/sf0.1 ratios. Expects the
  * scaled tables to exist (run [[ScaleProbe]] first — it writes them).
  *
  * usage: runMain graft.StreamScaleProbe [srcDir] [scaledDir] [face...]
  */
object StreamScaleProbe {

  private def stateMetrics(q: StreamingQuery): (Long, Long) = {
    val ops = Option(q.lastProgress).map(_.stateOperators.toSeq).getOrElse(Seq.empty)
    val rows = ops.map(_.numRowsTotal).sum
    val bytes = ops.map { op =>
      val custom = op.customMetrics
      op.memoryUsedBytes +
        Seq("rocksdbSstFileSize", "rocksdbTotalMemoryUsage")
          .map(k => Option(custom.get(k)).map(_.longValue()).getOrElse(0L))
          .sum
    }.sum
    (rows, bytes)
  }

  /** Run a started query to completion of all available data, then return
    * (wall seconds, state rows, state bytes). Faces start with
    * Trigger.AvailableNow; the TimeMode.None faces (neardup, asof)
    * self-terminate once the planned offsets commit. The TTL'd cdc face
    * NEVER self-terminates — a processing-time TTL keeps
    * TransformWithStateExec.shouldRunAnotherBatch true, so the engine runs
    * no-data batches back-to-back even under AvailableNow (and
    * processAllAvailable never unblocks: noNewData is never set). For that
    * face the caller passes `expectedRows`, and the drive counts committed
    * input rows via a listener (registered BEFORE start so the first
    * batch's progress can't be missed) and stops the query once every
    * fixture row is through — wall then measures data processing, not the
    * TTL-eviction idle loop. Unloads the JVM-global state store providers
    * afterwards so faces don't tax each other (the r7 dirty-pass lesson).
    */
  private def drive(spark: SparkSession, expectedRows: Long = -1L)(
      start: String => StreamingQuery): (Double, Long, Long) = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sprobe-ckpt").toString
    val seenByQuery = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        seenByQuery.merge(e.progress.id, java.lang.Long.valueOf(e.progress.numInputRows),
          (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
        ()
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    if (expectedRows >= 0) spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val q = start(ckpt)
    try {
      if (expectedRows < 0) q.awaitTermination()
      else
        while (!q.awaitTermination(200) &&
          seenByQuery.getOrDefault(q.id, java.lang.Long.valueOf(0L)).longValue() < expectedRows) ()
      val wall = (System.nanoTime() - t0) / 1e9
      val (rows, bytes) = stateMetrics(q)
      (wall, rows, bytes)
    } finally {
      if (expectedRows >= 0) spark.streams.removeListener(listener)
      q.stop()
      if (spark.streams.active.isEmpty)
        org.apache.spark.sql.execution.streaming.state.GraftStateStoreAccess.unloadAll()
    }
  }

  private def outTmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sprobe-$tag").toString

  /** TTL-eviction steady-state probe (VERDICT r8 #5): drive the full cdc
    * fixture through the pipeline with a SHORT processing-time TTL, then —
    * input drained — let the engine's no-data batches run the eviction
    * path and sample state rows/bytes each second until three consecutive
    * samples agree (the plateau) or a 90 s cap. The r8 probe measured
    * state GROWTH under TTL; this measures the other half of the 100 TB
    * claim: that eviction actually drains a saturated store back to its
    * steady state once keys go quiet.
    */
  private def cdcEviction(spark: SparkSession, dir: String, ttlMs: Long): Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val path = graft.jobs.JobFixtures.cdcFixturePath(spark, dir)
    val fixture = spark.read.parquet(path)
    val expected = fixture.count()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sprobe-evict-ckpt").toString
    val out = outTmp("cdc-evict")
    val seenByQuery = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        seenByQuery.merge(e.progress.id, java.lang.Long.valueOf(e.progress.numInputRows),
          (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
        ()
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val q = graft.jobs.MongoToKafkaJob.startStreaming(
      spark.readStream.schema(fixture.schema).option("maxFilesPerTrigger", "8").parquet(path),
      s"$out/data", s"$out/dlq", ckpt, ttlMs = ttlMs,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      while (!q.awaitTermination(200) &&
        seenByQuery.getOrDefault(q.id, java.lang.Long.valueOf(0L)).longValue() < expected) ()
      val (rows0, bytes0) = stateMetrics(q)
      println(f"cdc_eviction   drained  ttl=${ttlMs / 1000}%ds state rows=$rows0%d MB=${bytes0 / 1e6}%.1f")
      val t0 = System.nanoTime()
      var samples = List.empty[(Double, Long, Long)]
      var plateau = false
      while (!plateau && (System.nanoTime() - t0) / 1e9 < 90 && !q.awaitTermination(1000)) {
        val (r, b) = stateMetrics(q)
        samples ::= (((System.nanoTime() - t0) / 1e9), r, b)
        plateau = samples.take(3).map(_._2).distinct.size == 1 && samples.size >= 3
      }
      samples.reverse.foreach { case (t, r, b) =>
        println(f"cdc_eviction   t=$t%5.1fs state rows=$r%d MB=${b / 1e6}%.1f")
      }
      samples.headOption.foreach { case (t, r, b) =>
        // only claim a plateau when three samples actually agreed — a 90 s
        // cap expiry is a DIFFERENT finding and must not read as steady state
        if (plateau)
          println(f"cdc_eviction   PLATEAU at t=$t%.1fs: $rows0%d -> $r%d rows (${bytes0 / 1e6}%.1f -> ${b / 1e6}%.1f MB)")
        else
          println(f"cdc_eviction   NO PLATEAU within cap: still at $r%d rows (${b / 1e6}%.1f MB) at t=$t%.1fs")
      }
    } finally {
      spark.streams.removeListener(listener)
      q.stop()
      if (spark.streams.active.isEmpty)
        org.apache.spark.sql.execution.streaming.state.GraftStateStoreAccess.unloadAll()
    }
  }

  /** CDC fixture parquet → MongoToKafkaJob.startStreaming. maxFilesPerTrigger
    * slices the fixture into several micro-batches so keyed state actually
    * accumulates across batches instead of one mega-batch.
    */
  private def cdcPipeline(spark: SparkSession, dir: String): (Double, Long, Long) = {
    val path = graft.jobs.JobFixtures.cdcFixturePath(spark, dir)
    val fixture = spark.read.parquet(path)
    val schema = fixture.schema
    val expected = fixture.count()
    val out = outTmp("cdc-out")
    drive(spark, expectedRows = expected) { ckpt =>
      val stream = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(path)
      graft.jobs.MongoToKafkaJob.startStreaming(
        stream, s"$out/data", s"$out/dlq", ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    }
  }

  /** documents staged into a multi-file directory: FileStreamSource needs a
    * directory (the raw sf0.1 table is a single parquet FILE), and 10 files
    * with maxFilesPerTrigger=8 gives at least two micro-batches so keyed
    * state actually carries across batches. Written once per source dir.
    */
  private def docsStage(spark: SparkSession, dir: String): String = {
    val base = s"/tmp/graft-sprobe-docs-${math.abs(dir.hashCode)}"
    if (!new java.io.File(s"$base/_DONE").exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .repartition(10).write.mode("overwrite").parquet(s"$base/data")
      new java.io.File(s"$base/_DONE").createNewFile()
      ()
    }
    s"$base/data"
  }

  /** documents parquet → streaming near-dup candidate gate. */
  private def neardupGate(spark: SparkSession, dir: String): (Double, Long, Long) = {
    val path = docsStage(spark, dir)
    val schema = spark.read.parquet(path).schema
    val out = outTmp("neardup-out")
    drive(spark) { ckpt =>
      val stream = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(path)
      graft.data.Dedup
        .streamingNearDupCandidates(stream, "doc_id", "text")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet")
        .option("path", s"$out/hits")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    }
  }

  /** Scored-arrival stage for the streaming quality gate: (sid, source,
    * score) rows — the gate's input is an already-scored stream, so the
    * hashed quality score is computed once at stage time. 10 files with
    * maxFilesPerTrigger=3 gives several micro-batches, so the running
    * histograms genuinely carry across batches.
    */
  private def qualityStage(spark: SparkSession, dir: String): String = {
    val base = s"/tmp/graft-sprobe-qgate-${math.abs(dir.hashCode)}"
    if (!new java.io.File(s"$base/_DONE").exists()) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      graft.data.TextAnalysis.qualityModelScore(docs, "doc_id", "text", dims = 64)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id").as("sid"), col("source"), col("score_e6").as("score"))
        .repartition(10).write.mode("overwrite").parquet(s"$base/data")
      new java.io.File(s"$base/_DONE").createNewFile()
      ()
    }
    s"$base/data"
  }

  /** scored documents → streaming quality gate. The 100 TB claim under
    * measurement: state rows track the SOURCE count (one bounded histogram
    * per source), NOT the arrival count — 10× the input rows over the same
    * source set must hold state rows flat.
    */
  private def qualityGateFace(spark: SparkSession, dir: String): (Double, Long, Long) = {
    import spark.implicits._
    val path = qualityStage(spark, dir)
    val schema = spark.read.parquet(path).schema
    val out = outTmp("qgate-out")
    drive(spark) { ckpt =>
      graft.stateful.Processors.qualityGate(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "3").parquet(path)
            .as[graft.model.ScoredDoc],
          keepPpm = 300000L, binLo = -250000L, binWidth = 4096L, nBins = 128)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet")
        .option("path", s"$out/verdicts")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    }
  }

  /** Version/event parquet stages for the as-of faces: every event is a
    * version row (history IS the state axis), a 1-in-10 slice probes.
    * Written once per dir, several files each so both file sources
    * interleave across micro-batches and compaction horizons advance.
    */
  private def asofStage(spark: SparkSession, dir: String): (String, String) = {
    val base = s"/tmp/graft-sprobe-asof-${math.abs(dir.hashCode)}"
    val vDir = s"$base/versions"
    val eDir = s"$base/events"
    if (!new java.io.File(s"$base/_DONE").exists()) {
      val e = graft.core.Tables.events(spark, dir)
      e.select(
        col("user_id").cast("string").as("key"),
        unix_micros(col("ts")).as("tsUs"),
        round(col("value") * 100).cast("long").cast("string").as("value"))
        .repartition(10).write.mode("overwrite").parquet(vDir)
      e.filter(col("event_id") % 10 === 0)
        .select(
          col("user_id").cast("string").as("key"),
          unix_micros(col("ts")).as("tsUs"),
          col("event_id").cast("string").as("payload"))
        .repartition(10).write.mode("overwrite").parquet(eDir)
      new java.io.File(s"$base/_DONE").createNewFile()
      ()
    }
    (vDir, eDir)
  }

  private def asof(spark: SparkSession, dir: String, compactLagUs: Long): (Double, Long, Long) = {
    import spark.implicits._
    import graft.joins.StreamingAsOfJoiner.{AsOfEvent, AsOfVersion}
    val (vDir, eDir) = asofStage(spark, dir)
    val out = outTmp("asof-out")
    drive(spark) { ckpt =>
      def src(path: String) = spark.readStream
        .schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(path)
      graft.joins.StreamingAsOfJoiner
        .enrich(
          src(eDir).as[AsOfEvent],
          src(vDir).as[AsOfVersion],
          ttlMs = 0,
          compactLagUs = compactLagUs)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet")
        .option("path", s"$out/enriched")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scaledDir = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false") // GraftSession scaladoc: hang in checksum stream close
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // compaction horizon: a tenth of the event-time span, so the lag face
    // actually trims history while staying data-derived and deterministic
    def lagFor(dir: String): Long = {
      val mm = graft.core.Tables.events(spark, dir)
        .select(unix_micros(min(col("ts"))), unix_micros(max(col("ts")))).head()
      (mm.getLong(1) - mm.getLong(0)) / 10
    }

    val faces: Seq[(String, String => (Double, Long, Long))] = Seq(
      "cdc_pipeline" -> (d => cdcPipeline(spark, d)),
      "neardup_gate" -> (d => neardupGate(spark, d)),
      "asof_nolag" -> (d => asof(spark, d, -1L)),
      "asof_lag" -> (d => asof(spark, d, lagFor(d))),
      "quality_gate" -> (d => qualityGateFace(spark, d))
    )
    val selected =
      if (args.length > 2) faces.filter(f => args.drop(2).contains(f._1)) else faces
    val wantEviction = args.drop(2).contains("cdc_eviction")

    // build the scaled tables the SELECTED faces consume if absent — only
    // those (a sf10/factor-100 run must not replicate lineitem 100×).
    // SPARK_GRAFT_SCALE_FACTOR names the replication factor (default 10 =
    // the sf1 decade; 100 = sf10), so one probe binary walks any decade.
    val needed = selected.map {
      case ("neardup_gate", _) | ("quality_gate", _) => "documents"
      case _ => "events"
    }.toSet
    if (needed.nonEmpty) {
      // ALWAYS route through buildScaled: its _GRAFT_FACTOR_<n> marker is
      // the idempotence/validity check — a bare existence test here would
      // silently reuse a partial build or a different-factor layout
      val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
      ScaleProbe.buildScaled(spark, srcDir, scaledDir, factor, only = needed)
    }
    val scaledTag = new java.io.File(scaledDir).getName.stripPrefix("graft-")

    println(f"${"face"}%-14s ${"scale"}%-8s ${"wall(s)"}%9s ${"stateRows"}%12s ${"stateMB"}%9s")
    // "warm" pass at sf0.01 first: the first measured drive otherwise absorbs
    // JVM/codegen/RocksDB-JNI warmup and deflates the sf1/sf0.1 wall ratio
    // (cdc measured 0.8x at 10x rows before this — warmup artifact, not magic)
    val results = for {
      (name, run) <- selected
      (tag, dir) <- Seq(
        "warm" -> "/root/testdata/sf0.01", "sf0.1" -> srcDir, scaledTag -> scaledDir)
    } yield {
      val (wall, rows, bytes) =
        try run(dir)
        catch {
          case e: Throwable =>
            System.err.println(s"[streamprobe] $name failed in $dir: ${e.getMessage}")
            (Double.NaN, -1L, -1L)
        }
      println(f"$name%-14s $tag%-8s $wall%9.2f $rows%12d ${bytes / 1e6}%9.1f")
      (name, tag, wall, rows, bytes)
    }
    results.groupBy(_._1).foreach { case (name, rs) =>
      (rs.find(_._2 == "sf0.1"), rs.find(_._2 == scaledTag)) match {
        case (Some(s), Some(b)) if !s._3.isNaN && !b._3.isNaN =>
          println(f"RATIO $name%-14s wall ${b._3 / s._3}%5.1fx  stateRows ${
            if (s._4 > 0) b._4.toDouble / s._4 else Double.NaN}%5.1fx")
        case _ => ()
      }
    }
    // eviction plateau runs last (it leaves no providers loaded either)
    if (wantEviction) cdcEviction(spark, srcDir, ttlMs = 5000)
    spark.stop()
  }
}

/** Streaming ingest-capstone SOAK (VERDICT r12 #6): hundreds of
  * micro-batches through [[graft.data.CorpusIngest.ingest]] under a
  * duplicate-heavy, junk-heavy feed, with per-batch state-store telemetry
  * — the one streaming-state claim previously verified only at small
  * batch counts: that near-dup gate state grows with ACCEPTED DISTINCT
  * content, not feed volume (rejected docs never reach state; re-sent
  * duplicates re-probe existing band buckets without creating new ones).
  *
  * The final pin is EXACT, not a bound: the gate's state is keyed by band
  * bucket, so final state rows must equal the distinct band buckets of
  * the distinct accepted texts — computed independently here by the BATCH
  * signature path over the accepted corpus. Feed shape per batch:
  * `fresh` unique docs + `dup` re-sends of a 10-doc core + `junk`
  * too-short docs (batch order is whatever the file source lists, which
  * only permutes WHICH copy is first-seen — the bucket set is
  * order-independent).
  *
  * `mode=media` (VERDICT r13 #5) runs the IMAGE capstone instead —
  * [[graft.data.Multimodal.ingest]]: fresh PRNG payloads + a re-sent
  * 10-image core + junk split between too-small payloads and
  * valid-size/disallowed-mime images (the latter carry DISTINCT
  * fingerprints, so a rejected image leaking into the perceptual band
  * state breaks the equality pin loudly). The media gate runs
  * bandBits=16 — the billion-image MIH configuration, soaked in
  * streaming for the first time; expectation = distinct `p{b}_{value}`
  * buckets of the ACCEPTED images through the batch fingerprint path.
  *
  * usage: runMain graft.IngestSoakProbe [batches] [fresh] [dup] [junk] [mode]
  */
object IngestSoakProbe {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 300
    val fresh = if (args.length > 1) args(1).toInt else 10
    val dup = if (args.length > 2) args(2).toInt else 100
    val junk = if (args.length > 3) args(3).toInt else 90
    val mode = if (args.length > 4) args(4) else "text"
    require(mode == "text" || mode == "media", s"mode must be text|media, got $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.data.{CorpusIngest, Dedup, Multimodal, TextAnalysis}

    val feedDir = java.nio.file.Files.createTempDirectory(s"graft-ingest-soak-$mode").toString
    // (expectedBuckets, mkHits) per mode; the drive below is shared
    val (expectedBuckets, mkHits): (Long, DataFrame => org.apache.spark.sql.Dataset[graft.model.NearDupHit]) =
      if (mode == "text") {
        // deterministic feed: fresh docs are seeded word soups over a common-
        // English vocabulary (diverse shingles — near-dup collisions between
        // DIFFERENT fresh docs would blur the state-per-accepted-doc pin),
        // dups re-send a fixed 10-doc core verbatim, junk fails the token gate
        val vocab = ("the of and to in is you that it he was for on are as with his they at be this " +
          "have from or one had by word but not what all were we when your can said there use an each " +
          "which she do how their if will up other about out many then them these so some her would " +
          "make like him into time has look two more write go see number no way could people my than " +
          "first water been call who oil its now find long down day did get come made may part over").split(" ")
        val core = (0 until 10).map(i =>
          s"the quick brown fox number core$i jumps over the lazy dog while rain keeps falling " +
            "on the quiet green field near the old stone bridge")
        def soup(b: Int, i: Int): String = {
          val r = new scala.util.Random(b * 100003L + i * 7919L + 5)
          Seq.fill(30)(vocab(r.nextInt(vocab.length))).mkString(" ")
        }
        val rows = for {
          b <- 0 until batches
          (text, off) <- (0 until fresh).map(i => (soup(b, i), i.toLong)) ++
            (0 until dup).map(j => (core(j % 10), 1000L + j)) ++
            (0 until junk).map(j => ("zz", 5000L + j))
        } yield (b * 10000L + off, text, b)
        rows.toDF("doc_id", "text", "batch")
          .repartition(batches, col("batch"))
          .write.mode("overwrite").partitionBy("batch").parquet(feedDir)

        val minTokens = 8
        val langs = Seq("en")
        val feed = spark.read.parquet(feedDir)
        val verdictB = CorpusIngest.verdict(feed, "text", langs, minTokens)
        val acceptedB = verdictB.filter(col("reject_reason").isNull).cache()
        val nAccepted = acceptedB.count()
        // independent expectation: distinct band buckets of distinct accepted
        // texts through the BATCH signature path (n=3, k=16, 2-row bands — the
        // streamingNearDupCandidates defaults)
        val distinctTexts = acceptedB.select(col("text")).distinct()
          .withColumn("tid", monotonically_increasing_id())
          .withColumn("_t", graft.functions.ComputeOnce(TextAnalysis.tokens(col("text"))))
          .filter(size(col("_t")) >= 3)
        val sig = Dedup.minhashSignaturesFromTokens(distinctTexts, "tid", col("_t"), 3, 16)
        val bandArr = array((0 until 8).map { b =>
          concat_ws("_", lit(b) +: (0 until 2).map(r => col(s"h${b * 2 + r}")): _*)
        }: _*)
        val expected = sig.select(explode(bandArr).as("bucket")).distinct().count()
        println(s"[soak] mode=text feed=${feed.count()} accepted=$nAccepted " +
          s"distinctAcceptedTexts=${distinctTexts.count()} expectedBuckets=$expected")
        (expected, (stream: DataFrame) =>
          CorpusIngest.ingest(stream, "doc_id", "text", langs, minTokens)._2)
      } else {
        // media feed: fresh PRNG payloads (distinct fingerprints), a
        // re-sent 10-image core, junk half too-small / half valid-size
        // with a disallowed mime — the latter's DISTINCT fingerprints
        // make any rejected-media state leak break the equality pin
        val minBytes = 64
        val maxBytes = 100000L
        val allowed = Seq("image/png", "image/jpeg")
        val mediaBandBits = 16
        def img(seed: Long): Array[Byte] = {
          val r = new scala.util.Random(seed)
          Array.fill(144)(r.nextInt(256).toByte)
        }
        val core = (0 until 10).map(i => img(900000L + i))
        val rows = for {
          b <- 0 until batches
          (media, mime, off) <- (0 until fresh).map(i =>
              (img(b * 100003L + i * 7919L + 11), "image/png", i.toLong)) ++
            (0 until dup).map(j => (core(j % 10), "image/jpeg", 1000L + j)) ++
            (0 until junk).map(j =>
              if (j % 2 == 0) (Array.fill(16)(j.toByte), "image/png", 5000L + j)
              else (img(b * 999983L + j * 104729L + 13), "image/gif", 5000L + j))
        } yield (b * 10000L + off, media, mime, b)
        rows.toDF("doc_id", "media", "mime", "batch")
          .repartition(batches, col("batch"))
          .write.mode("overwrite").partitionBy("batch").parquet(feedDir)

        val feed = spark.read.parquet(feedDir)
        val acceptedB = Multimodal
          .mediaVerdict(feed, "media", "mime", allowed, minBytes, maxBytes)
          .filter(col("reject_reason").isNull).cache()
        val nAccepted = acceptedB.count()
        // independent expectation: distinct p-namespaced (band, value)
        // buckets of the accepted images through the batch fingerprint
        // path — the exact strings Processors.nearDupBands keys state by
        val nBands = 64 / mediaBandBits
        val mask = (1L << mediaBandBits) - 1
        val fp = acceptedB.select(
          graft.functions.ComputeOnce(Multimodal.perceptualHash(col("media"))).as("_fp"))
        val bandArr = array((0 until nBands).map { b =>
          concat_ws("_",
            lit(s"p$b"),
            shiftright(col("_fp"), b * mediaBandBits).bitwiseAND(lit(mask)).cast("string"))
        }: _*)
        val expected = fp.select(explode(bandArr).as("bucket")).distinct().count()
        println(s"[soak] mode=media feed=${feed.count()} accepted=$nAccepted " +
          s"distinctAcceptedFps=${fp.distinct().count()} expectedBuckets=$expected " +
          s"(bandBits=$mediaBandBits)")
        (expected, (stream: DataFrame) =>
          Multimodal.ingest(stream, "doc_id", "media", "mime", allowed,
            minBytes, maxBytes, bandBits = mediaBandBits)._2)
      }
    val feed = spark.read.parquet(feedDir)
    val nFeed = feed.count()

    val series = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val st = e.progress.stateOperators.toSeq.map(_.numRowsTotal).sum
        series.add((e.progress.batchId, e.progress.numInputRows, st))
        ()
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-soak-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-soak-out").toString
    val stream = spark.readStream
      .schema(feed.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(feedDir)
    val hits = mkHits(stream)
    val t0 = System.nanoTime()
    val q = hits.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", s"$out/hits")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)
    val snaps = series.toArray(Array.empty[(Long, Long, Long)]).sortBy(_._1)
    println(f"${"batch"}%7s ${"inRows"}%8s ${"stateRows"}%10s")
    snaps.zipWithIndex.foreach { case ((bid, in, st), i) =>
      if (i % 25 == 0 || i == snaps.length - 1) println(f"$bid%7d $in%8d $st%10d")
    }
    val finalState = snaps.lastOption.map(_._3).getOrElse(-1L)
    val nBatches = snaps.length
    println(f"[soak] batches=$nBatches wall=$wall%.1fs finalStateRows=$finalState " +
      f"expected=$expectedBuckets feedRows=$nFeed " +
      f"stateOverFeed=${finalState.toDouble / nFeed}%.3f")
    require(nBatches >= batches,
      s"soak ran $nBatches micro-batches, wanted >= $batches (maxFilesPerTrigger honored?)")
    require(finalState == expectedBuckets,
      s"state rows $finalState != expected distinct accepted band buckets $expectedBuckets " +
        "— state is NOT tracking accepted distinct content")
    if (spark.streams.active.isEmpty)
      org.apache.spark.sql.execution.streaming.state.GraftStateStoreAccess.unloadAll()
    spark.stop()
  }
}
