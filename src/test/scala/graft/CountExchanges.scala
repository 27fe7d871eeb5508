package graft

/** Dev tool: print the textual ShuffleExchange count of named queries
  * (ShuffleBudgetSpec's regex over the executed-plan string), so
  * budget tightening after an operator rewrite uses measured counts.
  *
  *   sbt> Test/runMain graft.CountExchanges sf0.001 q1 q2 ...
  */
object CountExchanges {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf0.001")
    val sfDir = s"/root/testdata/$sfName"
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("local[4]", "4", "graft-count")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val r = scala.util.Try {
        val plan = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan.toString
        "Exchange (hash|range|SinglePartition)".r.findAllIn(plan).size
      }
      println(s"XCOUNT $n ${r.getOrElse(-1)}")
    }
    spark.stop()
  }
}
