package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with the total wall-clock.
  *
  * The driver captures only the TAIL of stdout (~3 KB): rounds 2 and 3
  * emitted the full 126-entry per-query map on the line, pushing the
  * leading `"metric":"total"` outside the capture window, so the driver
  * recorded `parsed: null` both rounds. The stdout line is therefore kept
  * deliberately small — total, errors, and only the slowest N per-query
  * times — and the complete per-query map goes to `bench_full.json` and
  * stderr instead. `BenchSpec` pins the line-size budget so query growth
  * can't silently regress this again.
  */
object Bench {

  /** Max stdout-line bytes. The driver's observed tail window is ~3000
    * bytes; half that leaves room for stray trailing output after the
    * line (e.g. shutdown notices) without pushing the head out.
    */
  val LineBudgetBytes = 1500

  /** How many of the slowest per-query times stay on the stdout line. */
  val SlowestN = 15

  private def fmt(v: Double) =
    if (v < 0) "-1"
    else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def fmtQ(v: Double) =
    if (v < 0) "-1"
    else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  private def qMap(entries: Seq[(String, Double)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + fmtQ(v) }
      .mkString("{", ",", "}")

  /** The short stdout line. `results` is (name, bestSeconds, anyRunOk);
    * only the slowest [[SlowestN]] queries are inlined (failed queries
    * always make the cut via the -1 sentinel plus the errors array, which
    * is itself capped at 10 names + a count so a mass failure can't blow
    * the budget either).
    */
  def stdoutLine(results: Seq[(String, Double, Boolean)], sfName: String): String = {
    val total = results.collect { case (_, v, true) => v }.sum
    val slowest = results.sortBy { case (_, v, ok) => (ok, -v) }
      .take(SlowestN).sortBy(_._1)
      .map { case (k, v, ok) => (k, if (ok) v else -1.0) }
    val failed = results.collect { case (k, _, false) => k }
    val errors =
      if (failed.isEmpty) ""
      else {
        val shown = failed.take(10).map("\"" + _ + "\"").mkString(",")
        s""","errors":[$shown],"nerrors":${failed.length}"""
      }
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfName"""" +
      s""","nqueries":${results.length},"slowest":${qMap(slowest)}$errors}"""
  }

  /** The complete per-query map — file + stderr, never the stdout line. */
  def fullJson(results: Seq[(String, Double, Boolean)], sfName: String): String = {
    val total = results.collect { case (_, v, true) => v }.sum
    val qs = qMap(results.map { case (k, v, ok) => (k, if (ok) v else -1.0) })
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfName","queries":$qs}"""
  }

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
    val sfName = new java.io.File(sfDir).getName
    val full = fullJson(results, sfName)
    System.err.println(full)
    try {
      val p = java.nio.file.Paths.get("bench_full.json")
      java.nio.file.Files.write(p, full.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // best-effort; stdout line is the contract
    spark.stop()
    // Last stdout write, after spark.stop(), so nothing can print behind
    // it and push it out of the driver's tail capture.
    println(stdoutLine(results, sfName))
  }
}
