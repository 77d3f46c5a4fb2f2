package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files probe for [[graft.connectors.Bucketing.compactBucketed]]
  * (r18): grows a near-dup band index the way a production ingest does —
  * one bootstrap + N-1 fenced appends, each landing ~one file per bucket —
  * then measures what the accumulated file count costs a reader (raw index
  * scan + the `d_neardup_indexed`-shaped serve query), compacts, and
  * measures again. The DATA never changes across the compaction (stamp and
  * spec preserved, spec-pinned in ScaleMechanicsSpec); the delta is pure
  * file-open/footer/split overhead — the term that grows linearly with
  * batch count at production cadence (a batch every few minutes for months
  * = tens of thousands of files per bucket) while the answer stays fixed.
  *
  * r19 adds the ONE-HOT arm for the bucket-incremental compact: after the
  * full compact, `batches` skewed appends each grow a SINGLE bucket (every
  * appended row shares one band-bucket value), and the second compact must
  * touch only that bucket — its cost tracks touched buckets, not table
  * size (VERDICT r18 #2: the previous compact was O(table)).
  * Evidence for SCALE.md; re-run after touching the compaction path.
  *
  * usage: runMain graft.CompactProbe <sfDir> [batches] [reps]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.connectors.Bucketing
    import graft.data.SnapshotOps
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.core.Tables.documents(spark, dir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    // fresh path per run: the probe measures GROWTH, a reused layout would skip it
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft_compact_probe")
    val path = tmpRoot.toString + "/bands"
    val table = "graft_compact_probe_bands"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      def slice(i: Int) = corpus.filter(pmod(col("doc_id"), lit(batches)) === i)
      def bands(df: org.apache.spark.sql.DataFrame) =
        SnapshotOps.nearDupBandIndex(df, "doc_id", "text")
      val stamp = s"${SnapshotOps.bandStamp(3, 16, 2)}|probe"
      val tBuild = timed {
        Bucketing.ensureBucketed(spark, bands(slice(0)), table, path, "bucket", 64, stamp)
        (1 until batches).foreach(i =>
          Bucketing.appendBucketed(spark, bands(slice(i)), table, path, "bucket", 64, s"$stamp|$i"))
      }
      def fileCount: Int =
        Option(new java.io.File(path).listFiles()).getOrElse(Array.empty).count(f =>
          f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      val delta = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(3000000L))
      def scan(): Unit = { spark.table(table).agg(count(lit(1))).collect(): Unit }
      def serve(): Unit = SnapshotOps.incrementalNearDupIndexed(
        spark.table(table), corpus, delta, "doc_id", "text",
        indexStamp = Bucketing.readStamp(path))
        .write.mode("overwrite").format("noop").save()
      println(f"[compact] $batches batches appended in $tBuild%.1f s -> $fileCount files")
      val scanFrag = (1 to reps).map(_ => timed(scan())).min
      val serveFrag = (1 to reps).map(_ => timed(serve())).min
      val tCompact = timed(Bucketing.compactBucketed(spark, table, path, "bucket", 64))
      println(f"[compact] full compaction: $tCompact%.2f s -> $fileCount files " +
        f"(stamp preserved: ${Bucketing.readStamp(path).isDefined})")
      val scanComp = (1 to reps).map(_ => timed(scan())).min
      val serveComp = (1 to reps).map(_ => timed(serve())).min
      println(f"[compact] raw index scan: fragmented $scanFrag%.2f s, " +
        f"compacted $scanComp%.2f s (${scanFrag / scanComp}%.2fx)")
      println(f"[compact] indexed near-dup serve: fragmented $serveFrag%.2f s, " +
        f"compacted $serveComp%.2f s (${serveFrag / serveComp}%.2fx)")

      // ONE-HOT arm: the same number of appends, but every row of every
      // append shares ONE band-bucket value — the skewed-ingest shape that
      // fragments a single bucket while the other 63 stay at one file. The
      // bucket-incremental compact must rewrite only that bucket; compare
      // its cost to the full compact above, which rewrote all 64.
      val hotVal = spark.table(table).select("bucket").limit(1).collect()(0).getString(0)
      val hot = bands(corpus).filter(col("bucket") === hotVal)
      val filesBeforeHot = fileCount
      val tHotGrow = timed {
        (0 until batches).foreach(i =>
          Bucketing.appendBucketed(spark, hot, table, path, "bucket", 64, s"$stamp|hot$i"))
      }
      val filesGrown = fileCount
      val tHotCompact = timed(Bucketing.compactBucketed(spark, table, path, "bucket", 64))
      println(f"[compact] one-hot: $batches single-bucket appends in $tHotGrow%.1f s " +
        f"($filesBeforeHot -> $filesGrown files), incremental compaction $tHotCompact%.2f s " +
        f"-> $fileCount files (vs $tCompact%.2f s full — cost tracks touched buckets)")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      // the grown index is probe scratch — delete it or every invocation
      // leaks batches × buckets files of temp parquet (ADVICE r18)
      def deleteTree(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteTree)
        f.delete(): Unit
      }
      deleteTree(tmpRoot.toFile)
      spark.stop()
    }
  }
}
