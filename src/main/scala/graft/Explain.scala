package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for named queries
  * (all queries if no names given).
  *
  * Usage: runMain graft.Explain <sfDir> [-o outDir suffix] [names...]
  *
  * With `-o`, each plan is written to `<outDir>/<name>_<suffix>.txt`
  * instead of stdout — the round's before/after plan evidence
  * (`plans/r<N>/`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val (outDir, suffix, nameArgs) =
      if (args.length > 2 && args(1) == "-o")
        (Some(args(2)), args(3), args.drop(4).toSeq)
      else (None, "", args.drop(1).toSeq)
    val names = if (nameArgs.nonEmpty) nameArgs
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("local[4]", "4", "graft-explain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      outDir match {
        case Some(d) =>
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/${n}_$suffix.txt"), plan)
          println(s"WROTE $d/${n}_$suffix.txt")
        case None =>
          println(s"========== $n ==========")
          df.explain("formatted")
      }
    }
    spark.stop()
  }
}
