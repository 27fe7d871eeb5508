package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with total + per-query
  * wall-clock seconds. A small warmup action runs first so session/JIT
  * startup isn't attributed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus, "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercises codegen, parquet reader, and the whole operator
    // surface once on the smallest SF so measured times are steady-state.
    SparkEntry.entry(spark).count()

    // Per-query: best of `runs` executions. The first execution of a
    // query pays one-off plan compilation + whole-stage codegen
    // (100-300 ms of driver-side work unrelated to data volume); the
    // minimum reflects the steady-state cost that scales with SF.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
          }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      // A fast crash must not masquerade as a fast query: only successful
      // runs enter the min; -1 is the all-runs-failed sentinel.
      val good = timed.collect { case (true, t) => t }
      (name, if (good.nonEmpty) good.min else -1.0, good.nonEmpty)
    }
    // Millisecond precision keeps the whole line under the driver's
    // stdout tail-capture window (round 2's full-precision line was
    // truncated mid-JSON and failed to parse driver-side).
    // Locale.ROOT: the f-interpolator uses the default locale, which
    // renders a comma decimal separator under e.g. de_DE and breaks the
    // JSON contract.
    def fmt(v: Double) =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Per-query at centisecond precision: the map is the line's bulk
    // and the driver compares totals, not per-query digits.
    def fmtQ(v: Double) =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmtQ(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val errors =
      if (failed.isEmpty) "" else failed.mkString(""","errors":[""", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errors,"sf":"$sfName"}""")
    spark.stop()
  }
}
