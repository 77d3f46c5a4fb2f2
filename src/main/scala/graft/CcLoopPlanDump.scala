package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan receipt for the connected-components min-label LOOP BODY (VERDICT
  * r21 #1): the clusters faces' static explain is just the final checkpoint
  * leaf (the loop runs eagerly during construction), so this main dumps the
  * formatted plan of ITERATION 2's frame — the steady-state round, reading
  * a cached label generation — for both shapes:
  *
  *  - `r21`: an inline replica of the round-21 loop body (neighbor-min
  *    groupBy + a second left-join of labels against it; edges a bare
  *    checkpoint leaf, re-shuffled by dst every round), labeled as such.
  *  - `r22`: [[graft.data.Dedup.minLabelNext]] — THE shipped body (shared
  *    definition, so this receipt cannot drift) over the pinned
  *    (repartition + persist) edge cache.
  *
  * usage: runMain graft.CcLoopPlanDump <outDir> [sfDir]
  * writes <outDir>/cc_loop_body_r21.txt and <outDir>/cc_loop_body_r22.txt
  */
object CcLoopPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CcLoopPlanDump <outDir> [sfDir]")
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    new java.io.File(outDir).mkdirs()
    import graft.data.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.minhashPairsForClustering(docs, "doc_id", "text")

    def dump(name: String, frame: DataFrame): Unit = {
      val plan = frame.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), plan.getBytes("UTF-8"))
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(s"[cc-plandump] $name: $exchanges Exchange mentions, wrote $outDir/$name.txt")
    }

    val edgesCk = pairs
      .select(col("i").as("src"), col("j").as("dst"))
      .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
      .localCheckpoint()

    // ---- r21 shape (inline replica of the round-21 loop body) ----
    {
      val labels0 = edgesCk.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint()
      def oldNext(labels: DataFrame): DataFrame = {
        val neighborMin = edgesCk
          .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nlabel"),
            Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min(col("nlabel")).as("nmin"))
        labels
          .join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
            (col("label") =!= least(col("label"), coalesce(col("nmin"), col("label")))).as("_chg"))
      }
      val l1 = oldNext(labels0).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l1.write.mode("overwrite").format("noop").save()
      dump("cc_loop_body_r21", oldNext(l1.select(col("id"), col("label"))))
      l1.unpersist()
    }

    // ---- r22 shape (the shipped minLabelNext over the pinned edge cache) ----
    {
      val sconf = spark.sessionState.conf
      val advisory = sconf.getConf(
        org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
      val edgeParts = math.max(1L, math.min(
        sconf.numShufflePartitions.toLong,
        edgesCk.count() * 32L / math.max(1L, advisory) + 1L)).toInt
      val edges = edgesCk.repartition(edgeParts, col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val labels0 = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint()
      val l1 = Dedup.minLabelNext(edges, labels0, edgeParts, sconf.numShufflePartitions)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l1.write.mode("overwrite").format("noop").save()
      dump("cc_loop_body_r22",
        Dedup.minLabelNext(edges, l1.select(col("id"), col("label")),
          edgeParts, sconf.numShufflePartitions))
      l1.unpersist()
      edges.unpersist()
    }
    // ---- alternating-CC star round: r21 shape (groupBy + join back) vs
    // ---- r22 shape (the shipped window-based largeStar/smallStar) ----
    {
      val canon = pairs
        .select(greatest(col("i"), col("j")).as("src"), least(col("i"), col("j")).as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      def oldLargeStar(e: DataFrame): DataFrame = {
        val nbrs = e.select(col("src"), col("dst"))
          .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        val mins = nbrs.groupBy("src").agg(min(col("dst")).as("_mn"))
          .select(col("src"), least(col("src"), col("_mn")).as("_m"))
        nbrs.join(mins, Seq("src"))
          .where(col("dst") > col("src"))
          .select(col("dst").as("src"), col("_m").as("dst"))
          .where(col("src") =!= col("dst"))
          .distinct()
      }
      def oldSmallStar(e: DataFrame): DataFrame = {
        val oriented = e.select(
            greatest(col("src"), col("dst")).as("src"),
            least(col("src"), col("dst")).as("dst"))
          .where(col("src") =!= col("dst"))
        val mins = oriented.groupBy("src").agg(min(col("dst")).as("_m"))
        oriented.join(mins, Seq("src"))
          .select(col("dst").as("v"), col("_m").as("m"))
          .unionByName(mins.select(col("src").as("v"), col("_m").as("m")))
          .where(col("v") =!= col("m"))
          .select(col("v").as("src"), col("m").as("dst"))
          .distinct()
      }
      dump("cc_star_round_r21", oldSmallStar(oldLargeStar(canon)))
      dump("cc_star_round_r22", Dedup.smallStar(Dedup.largeStar(canon)))
      graft.core.Checkpoints.release(canon)
    }
    graft.core.Checkpoints.release(edgesCk)
    spark.stop()
  }
}
