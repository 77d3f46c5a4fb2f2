package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crossover probe for the persisted pHash MIH band index (r18): times the
  * inline faces ([[graft.data.Multimodal.perceptualPairs]] and the
  * clusters composition — both re-fingerprint the BINARY column per call)
  * against the indexed faces ([[graft.data.Multimodal.perceptualPairsIndexed]]
  * — both join sides from the skinny persisted table, media bytes never
  * touched). The removed term is the 64-sample fingerprint scan over the
  * media payload; at billion-image scale that scan IS the query cost, so
  * the win grows with payload size — the fixture's "images" are text
  * bytes, the honest lower bound. Evidence for SCALE.md; re-run after
  * touching the pHash index path.
  *
  * Geometry is SCALE-DERIVED by default (VERDICT r19 #1,
  * [[graft.data.Multimodal.phashGeometry]]): the probe counts the corpus
  * and runs whatever band width / probe radius / hamming threshold the
  * faces themselves would derive — no hand-set geometry anywhere in the
  * organic sf1 → sf10 decade (the r19 decade needed a hand-passed
  * (16, 7, 1) to clear the 8-bit duplicity flood at 500k docs; the
  * derivation now lands that configuration itself). The optional
  * (bandBits, maxHamming, probeRadius) overrides remain for probing a
  * NON-derived geometry (e.g. measuring the flood boundary itself).
  *
  * usage: runMain graft.PhashIdxProbe <sfDir> [reps] [bandBits] [maxHamming] [probeRadius]
  */
object PhashIdxProbe {
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
      .withColumn("bin", col("text").cast("binary"))
    // scale-derived defaults — the same derivation the m_phash_* faces run
    val derived = graft.data.Multimodal.phashGeometry(docs.count())
    val bandBits = if (args.length > 2) args(2).toInt else derived.bandBits
    val probeRadius = if (args.length > 4) args(4).toInt else derived.probeRadius
    // default maxHamming derives from the (possibly overridden) geometry:
    // the pigeonhole bound (nBands·(radius+1) − 1) is the widest exact
    // threshold the banded join guarantees — a fixed default of 15 would
    // crash a bandBits=16 invocation before measuring anything (r19)
    val maxHamming = if (args.length > 3) args(3).toInt
      else (64 / bandBits) * (probeRadius + 1) - 1
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_")
    // band geometry is part of the index identity: an overridden geometry
    // gets its own path/table so the probe never invalidates the faces'
    // shared derived-geometry layout (and vice versa)
    val geo = if (bandBits == derived.bandBits) "" else s"_b$bandBits"
    val path = s"${graft.connectors.Bucketing.indexRoot}/$slug/phash_bands$geo"
    def index() = graft.connectors.Bucketing.ensureBucketed(
      spark,
      graft.data.Multimodal.phashBandIndex(docs, "doc_id", "bin", bandBits = bandBits),
      s"graft_phash_bands$slug$geo", path, "bucket", 64,
      // SAME stamp format as the m_phash_indexed face — shared table
      sourceStamp = s"${graft.data.Multimodal.phashStamp(bandBits)}|" +
        graft.connectors.Bucketing.cachedStamp(s"$dir/documents.parquet"))
    val buildS = timed(index())
    println(f"[phash-idx] index build/register: $buildS%.2f s (amortized across all queries) " +
      f"[bandBits=$bandBits maxHamming=$maxHamming radius=$probeRadius]")
    val stamp = graft.connectors.Bucketing.readStamp(path)
    def pairsInline() = graft.data.Multimodal.perceptualPairs(
      docs, "doc_id", "bin", maxHamming = maxHamming, bandBits = bandBits,
      probeRadius = probeRadius)
    def pairsIndexed() = graft.data.Multimodal.perceptualPairsIndexed(
      index(), maxHamming = maxHamming, bandBits = bandBits, probeRadius = probeRadius,
      indexStamp = stamp)
    def run(tag: String, inline: () => org.apache.spark.sql.DataFrame,
            indexed: () => org.apache.spark.sql.DataFrame): Unit = {
      val ti = (1 to reps).map(_ =>
        timed(inline().write.mode("overwrite").format("noop").save())).min
      val tx = (1 to reps).map(_ =>
        timed(indexed().write.mode("overwrite").format("noop").save())).min
      println(f"[phash-idx] $tag: inline $ti%.2f s, indexed $tx%.2f s (${ti / tx}%.2fx)")
    }
    run("pairs", () => pairsInline(), () => pairsIndexed())
    run("clusters",
      () => graft.data.Dedup.duplicateClusters(
        pairsInline().select(col("a_id").as("i"), col("b_id").as("j"))),
      () => graft.data.Dedup.duplicateClusters(
        pairsIndexed().select(col("a_id").as("i"), col("b_id").as("j"))))
    spark.stop()
  }
}
