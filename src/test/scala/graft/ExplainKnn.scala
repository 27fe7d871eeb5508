package graft

/** Dev probe: formatted plan of sim_knn_join —
  * `sbt> Test/runMain graft.ExplainKnn sf0.01`. */
object ExplainKnn {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "sf0.01"
    val spark = GraftSession.builder("local[4]", "4", "graft-explain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.PipelineQueries
      .queries("sim_knn_join")(spark, s"/root/testdata/$sf")
    df.explain("formatted")
    spark.stop()
  }
}
