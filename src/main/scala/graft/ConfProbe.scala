package graft

import org.apache.spark.sql.SparkSession

/** A/B probe for RUNTIME-settable SQL confs (guide §1: measure first).
  * Runs each named query alternating between two conf settings in ONE warm
  * JVM, printing per-rep seconds — isolates a conf's effect from JIT and
  * host noise in a way two separate full-bench runs cannot.
  *
  * usage: runMain graft.ConfProbe <conf=valA|valB> <reps> <query...>
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ConfProbe <conf=valA|valB> <reps> <query...>")
    // validate the split shapes up front: a malformed first arg must print
    // the usage contract, not throw MatchError out of the destructure
    val confVals = args(0).split("=", 2)
    require(confVals.length == 2 && confVals(1).contains("|"),
      s"ConfProbe: first arg '${args(0)}' must be <conf=valA|valB>")
    val Array(conf, vals) = confVals
    val Array(valA, valB) = vals.split("\\|", 2)
    val reps = args(1).toInt
    val sfDir = "/root/testdata/sf0.1"
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
    args.drop(2).foreach { name =>
      val fn = SparkEntry.queries(name)
      // one throwaway rep to absorb codegen, then alternate A/B
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val times = scala.collection.mutable.Map("A" -> List.empty[Double], "B" -> List.empty[Double])
      (1 to reps).foreach { rep =>
        // alternate the A/B ORDER per rep: a fixed A-then-B order lets B
        // systematically ride A's immediately-preceding warm-up of the
        // same query (JIT/page-cache ordering bias)
        val order = if (rep % 2 == 1) Seq("A" -> valA, "B" -> valB)
                    else Seq("B" -> valB, "A" -> valA)
        order.foreach { case (tag, v) =>
          spark.conf.set(conf, v)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val t = (System.nanoTime() - t0) / 1e9
          times(tag) = times(tag) :+ t
        }
      }
      spark.conf.set(conf, valA)
      def fmt(l: List[Double]) = l.map(t => f"$t%.2f").mkString(",") + f" min ${l.min}%.3f"
      println(s"[confprobe] $name  A($valA): ${fmt(times("A"))}  B($valB): ${fmt(times("B"))}")
    }
    spark.stop()
  }
}
