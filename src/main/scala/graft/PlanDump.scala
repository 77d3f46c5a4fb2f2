package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under `plans/`.
  *
  * usage: runMain graft.PlanDump <outDir> <suffix> <sfDir> <query...>
  * writes <outDir>/<query>_<suffix>.txt
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <outDir> <suffix> <sfDir> <query...>")
    val Array(outDir, suffix, sfDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.jobs.JobFixtures.warm(spark, sfDir)
    graft.queries.SourceQueries.warm(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { q =>
      val plan =
        try SparkEntry.queries(q)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"<failed to plan: ${e.getMessage}>" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${q}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
