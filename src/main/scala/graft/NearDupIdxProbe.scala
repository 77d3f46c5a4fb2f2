package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crossover probe for the persisted near-dup band index (r17): times
  * [[graft.data.SnapshotOps.incrementalNearDup]] (inline — re-derives the
  * corpus band frame from text per call) against
  * [[graft.data.SnapshotOps.incrementalNearDupIndexed]] (corpus side
  * served from the bucketed index table) at several delta sizes over the
  * same corpus. The index's win is the corpus-side signature scan it
  * skips, so it GROWS as the delta shrinks relative to the corpus — the
  * production grain (a nightly batch ≪ the ingested corpus). Evidence for
  * SCALE.md; re-run after touching the near-dup index path.
  *
  * usage: runMain graft.NearDupIdxProbe <sfDir> [reps]
  */
object NearDupIdxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.core.Tables.documents(spark, dir)
    val corpusText = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_")
    val idxPath = s"${graft.connectors.Bucketing.indexRoot}/$slug/neardup_bands" // ONE copy of the shared-table path
    def index() = graft.connectors.Bucketing.ensureBucketed(
      spark,
      graft.data.SnapshotOps.nearDupBandIndex(corpusText, "doc_id", "text"),
      s"graft_neardup_bands$slug", idxPath, "bucket", 64,
      // SAME stamp format as the d_neardup_indexed face (bandStamp prefix) —
      // a differing format would ping-pong rebuilds of the shared table
      sourceStamp = s"${graft.data.SnapshotOps.bandStamp(3, 16, 2)}|" +
        graft.connectors.Bucketing.cachedStamp(s"$dir/documents.parquet"))
    val buildS = timed(index())
    println(f"[neardup-idx] index build/register: $buildS%.2f s (amortized across all batches)")
    // pass the persisted stamp exactly as the shipping face does: without it
    // every timed rep pays the fallback max-band full index scan the stamp
    // path removed, understating the index's win (code-review r18). A None
    // here would silently re-enter that fallback — refuse to measure it.
    val stamp = graft.connectors.Bucketing.readStamp(idxPath)
    require(stamp.isDefined,
      s"no build stamp at $idxPath — the probe would silently time the max-band fallback scan")
    // delta grains: the bench fixture's 1-in-3 (delta ≈ half the corpus —
    // adversarial for the index), then 1-in-30 and 1-in-300 (the
    // production-shaped small batches)
    Seq(("delta=1/3 of docs", 3L), ("delta=1/30", 30L), ("delta=1/300", 300L)).foreach {
      case (tag, mod) =>
        val delta = docs.filter(pmod(col("doc_id"), lit(mod)) === 0)
        val n = delta.count()
        val inline = (1 to reps).map(_ => timed(
          graft.data.SnapshotOps.incrementalNearDup(corpusText, delta, "doc_id", "text")
            .write.mode("overwrite").format("noop").save())).min
        val indexed = (1 to reps).map(_ => timed(
          graft.data.SnapshotOps.incrementalNearDupIndexed(
            index(), corpusText, delta, "doc_id", "text", indexStamp = stamp)
            .write.mode("overwrite").format("noop").save())).min
        println(f"[neardup-idx] $tag ($n rows): inline $inline%.2f s, indexed $indexed%.2f s " +
          f"(${inline / indexed}%.2fx)")
    }
    spark.stop()
  }
}
