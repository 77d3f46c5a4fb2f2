package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic harness for the dirty-pass pathology: a query measuring
  * 1.2 s in a clean JVM has measured 15-20 s late in a full bench pass
  * (r5/r6 `bench_full.json`). This bisects the poison by PREFIX: it times
  * the target query fresh, then replays the bench query list in groups,
  * re-timing the target after every group. The group whose replay first
  * inflates the target is the one carrying the state.
  *
  * Usage: runMain graft.BisectBench [target=v1_schema_dlq] [groupSize=10]
  *        runMain graft.BisectBench <target> <poisonQueryName>   — pairwise
  *        mode: alternate poison/target to test one suspect directly.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — same as [[Bench]].
  */
object BisectBench {
  def main(args: Array[String]): Unit = {
    val target = if (args.nonEmpty) args(0) else "v1_schema_dlq"
    val group = if (args.length > 1) args(1).toIntOption.getOrElse(10) else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false") // GraftSession scaladoc: hang in checksum stream close
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.jobs.JobFixtures.warm(spark, sfDir)
    graft.queries.SourceQueries.warm(spark, sfDir)
    graft.queries.JoinQueries.warm(spark, sfDir)
    // keep in sync with Bench's oracleOnly set: the quadratic ground-truth
    // faces would dominate a bisect sweep without measuring anything the
    // production paths exercise
    val oracleOnly = Set("d_ngram_jaccard", "s_ann_pq", "s_ann_int8")
    val benched = SparkEntry.queries.toSeq
      .filterNot { case (n, _) => oracleOnly(n) || n == target }
    val targetFn = SparkEntry.queries(target)
    var i = 0
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bisect] $name failed: ${e.getMessage}") }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      i += 1
      if (i % 20 == 0) System.gc()
      t
    }
    def fmt(v: Double) = f"$v%.2f"
    println(s"[bisect] target=$target fresh-cold=${fmt(run(target, targetFn))} fresh-warm=${fmt(run(target, targetFn))}")
    val poison = if (args.length > 1) SparkEntry.queries.get(args(1)) else None
    poison match {
      case Some(pfn) =>
        (1 to 4).foreach { r =>
          val pt = run(args(1), pfn)
          val t = run(target, targetFn)
          println(s"[bisect] round $r poison(${args(1)})=${fmt(pt)} target=${fmt(t)}")
        }
      case None =>
        benched.grouped(group).zipWithIndex.foreach { case (g, gi) =>
          g.foreach { case (n, f) => run(n, f) }
          val t = run(target, targetFn)
          println(s"[bisect] after g$gi (${g.map(_._1).mkString(",")}) target=${fmt(t)}")
        }
    }
    spark.stop()
  }
}
