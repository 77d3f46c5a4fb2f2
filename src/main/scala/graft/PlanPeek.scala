package graft

import org.apache.spark.sql.SparkSession

/** Scratch: print executed plans for named SparkEntry queries.
  * usage: runMain graft.PlanPeek <sfDir> <query...>
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, args(0)).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
