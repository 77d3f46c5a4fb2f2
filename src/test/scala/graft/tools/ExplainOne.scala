package graft.tools

/** Debug harness: print the executed plan of one SparkEntry query.
  * usage: Test/runMain graft.tools.ExplainOne <query> [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("explain", cores = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    println(s"=== from_json occurrences: ${"from_json".r.findAllIn(plan).length}")
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
