package graft

/** Dev micro-bench: time named queries without running the full Bench.
  *
  * sbt> Test/runMain graft.TimeQuery sf0.1 dedup_components dedup_minhash_lsh
  *
  * Each query runs `runs` times (SPARK_GRAFT_BENCH_RUNS, default 2);
  * prints every run's wall-clock so warm-up vs steady-state is visible.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("dedup_components")
    val sfDir = s"/root/testdata/$sfName"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus, "graft-timequery")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // warm-up: codegen + parquet reader
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"TIME $name%-28s ${times.map(t => f"${t._1}%.2f").mkString(" ")} s  (rows ${times.head._2})")
    }
    spark.stop()
  }
}
