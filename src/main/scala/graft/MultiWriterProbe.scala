package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.connectors.MultiWriterIndex]] (r20): times the
  * multi-writer growth path of a near-dup band index — N writers × E
  * epochs of exactly-once delta-log commits, the fold into the bucketed
  * base, and the steady-state serve — against the one-shot single-writer
  * `ensureBucketed` build of the same rows. The interesting numbers at
  * scale are the STEADY-STATE ones: a replayed append (the manifest-fence
  * skip), a replayed fold (the marker no-op), and the served read — those
  * are what a production cadence pays per batch; the cold build amortizes.
  * Evidence for SCALE.md; re-run after touching MultiWriterIndex or
  * TxnLogSink.
  *
  * usage: runMain graft.MultiWriterProbe <sfDir> [writers] [epochs]
  */
object MultiWriterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val writers = if (args.length > 1) args(1).toInt else 2
    val epochs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.connectors.{Bucketing, MultiWriterIndex}
    import graft.data.SnapshotOps
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.core.Tables.documents(spark, dir)
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_")
    val stamp = Bucketing.cachedStamp(s"$dir/documents.parquet")
    val identity = s"${SnapshotOps.bandStamp(3, 16, 2)}|$stamp"
    def bands(df: org.apache.spark.sql.DataFrame) =
      SnapshotOps.nearDupBandIndex(df, "doc_id", "text")
    // fresh dirs per run: the probe measures COLD appends/folds, so stale
    // logs from a prior invocation must not turn them into fence skips
    val runTag = sys.env.getOrElse("MW_PROBE_TAG",
      java.util.UUID.randomUUID().toString.take(8))
    val idxDir = s"${Bucketing.indexRoot}/$slug/mwprobe_$runTag"
    val mwTable = s"graft_mwprobe_$runTag"
    val swDir = s"${Bucketing.indexRoot}/$slug/mwprobe_sw_$runTag"
    val swTable = s"graft_mwprobe_sw_$runTag"
    val total = writers * epochs
    def slice(w: Int, e: Int) =
      docs.filter(pmod(col("doc_id"), lit(total)) === lit(w * epochs + e))
    // writer side, cold: every (writer, epoch) commits its manifest
    val appendCold = timed {
      for (w <- 0 until writers; e <- 0 until epochs)
        MultiWriterIndex.appendDelta(bands(slice(w, e)), idxDir, s"w$w", e.toLong)
    }
    // writer side, replay: the per-batch at-least-once window — pure fence
    val appendReplay = timed {
      for (w <- 0 until writers; e <- 0 until epochs)
        MultiWriterIndex.appendDelta(bands(slice(w, e)), idxDir, s"w$w", e.toLong)
    }
    val foldCold = timed {
      MultiWriterIndex.fold(spark, idxDir, mwTable, "bucket", 64, stampSuffix = identity)
        .write.mode("overwrite").format("noop").save()
    }
    val foldReplay = timed {
      MultiWriterIndex.fold(spark, idxDir, mwTable, "bucket", 64, stampSuffix = identity)
        .write.mode("overwrite").format("noop").save()
    }
    def serveOnce(): Double = timed {
      MultiWriterIndex.read(spark, idxDir, mwTable, "bucket", 64, stampSuffix = identity)
        .write.mode("overwrite").format("noop").save()
    }
    val serve = { serveOnce(); Seq(serveOnce(), serveOnce()).min }
    // reference: the one-shot single-writer build + serve of the SAME rows
    val swBuild = timed {
      Bucketing.ensureBucketed(
        spark, bands(docs), swTable, swDir, "bucket", 64, sourceStamp = identity)
        .write.mode("overwrite").format("noop").save()
    }
    def swServeOnce(): Double = timed {
      Bucketing.ensureBucketed(
        spark, bands(docs), swTable, swDir, "bucket", 64, sourceStamp = identity)
        .write.mode("overwrite").format("noop").save()
    }
    val swServe = Seq(swServeOnce(), swServeOnce()).min
    val mwRows = MultiWriterIndex.read(spark, idxDir, mwTable, "bucket", 64,
      stampSuffix = identity).count()
    val swRows = spark.table(swTable).count()
    require(mwRows == swRows, s"multi-writer union drifted: $mwRows vs $swRows")
    println(f"[mw-probe] $writers writers x $epochs epochs over ${docs.count()} docs " +
      f"($mwRows band rows, parity with one-shot build OK)")
    println(f"[mw-probe] append cold ${appendCold}%.2f s (all $total deltas), " +
      f"replay ${appendReplay}%.2f s (fence-only)")
    println(f"[mw-probe] fold cold ${foldCold}%.2f s, replay ${foldReplay}%.2f s (no-op); " +
      f"serve ${serve}%.2f s vs single-writer build ${swBuild}%.2f s / serve ${swServe}%.2f s")
    spark.stop()
  }
}
