package graft

import org.apache.spark.sql.SparkSession

/** Native-scale bench slice (VERDICT r17 #6): times a set of faces against
  * TWO corpus dirs — the driver's sf0.1 fixture and an ORGANIC larger
  * generation ([[GenCorpus]]) — under the real bench discipline (1 codegen
  * rep + min-of-3 warm, Bench's in-pass cache hygiene). Unlike ScaleProbe's
  * replicated tables, the organic corpus has fresh content, so the
  * content-addressed faces (dedup, LSH, pHash, decontamination) see
  * realistic bucket distributions and dup rates instead of every row
  * having factor−1 exact copies.
  *
  * usage: runMain graft.NativeSliceProbe <smallDir> <bigDir> <query> [query ...]
  */
object NativeSliceProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: NativeSliceProbe <smallDir> <bigDir> <query> [query ...]")
    val (small, big) = (args(0), args(1))
    val queries = args.drop(2).toSeq
    val unknown = queries.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(small, big).foreach { d =>
      graft.jobs.JobFixtures.warm(spark, d)
      graft.queries.SourceQueries.warm(spark, d)
    }
    def timeWarm(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      try { once(); Seq(once(), once(), once()).min }
      catch {
        case e: Throwable =>
          System.err.println(s"[native-slice] $name failed in $dir: ${e.getMessage}")
          Double.NaN
      } finally { spark.catalog.clearCache(); System.gc() }
    }
    println(f"${"query"}%-26s ${"small(s)"}%10s ${"big(s)"}%10s ${"ratio"}%8s")
    queries.foreach { q =>
      val s = timeWarm(q, small)
      val b = timeWarm(q, big)
      println(f"$q%-26s $s%10.2f $b%10.2f ${b / s}%8.1f")
    }
    spark.stop()
  }
}
