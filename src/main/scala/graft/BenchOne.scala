package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench harness for perf iteration: runs one SparkEntry query
  * N times in a warm JVM and prints per-rep seconds (rep 1 includes codegen
  * compile; later reps are the steady-state number that matters).
  *
  * usage: runMain graft.BenchOne <query> [sfDir] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: BenchOne <query> [sfDir] [reps]; queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
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
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[benchone] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
