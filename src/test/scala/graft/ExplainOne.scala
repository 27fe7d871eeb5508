package graft

/** Dev probe: formatted plan + exchange count of any SparkEntry query.
  *
  * sbt> Test/runMain graft.ExplainOne sim_knn_join /root/testdata/sf0.01
  *
  * The exchange count printed is the same executed-plan-string regex
  * ShuffleBudgetSpec audits, so a budget can be read off directly.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("sim_knn_join")
    val dataDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder("local[4]", "4", "graft-explain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dataDir)
    df.explain("formatted")
    val plan = df.queryExecution.executedPlan.toString
    val n = "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).size
    println(s"EXCHANGES $name $n")
    spark.stop()
  }
}
