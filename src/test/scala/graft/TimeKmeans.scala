package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev micro-bench for the kmeansTrain hot path — which piece of the
  * clustered-curve training is slow: the synthetic cluster transform,
  * the literal-heavy assignment expression, or the means aggregate.
  * Usage: sbt> Test/runMain graft.TimeKmeans sf0.1
  */
object TimeKmeans {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf0.1")
    val sfDir = s"/root/testdata/$sfName"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus, "graft-kmeans")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"KPHASE $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val vecs = Similarity.vectors(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"), col("v"))
      val cvecs = Similarity.vectors(Tables.embeddings(spark, sfDir))
        .selectExpr("vec_id",
          "transform(v, (x, i) -> (CASE WHEN ((label % 8) DIV " +
            "CAST(pow(2, i % 3) AS INT)) % 2 = 1 THEN 1.0D ELSE -1.0D " +
            "END) + 0.1D * x) AS v")
      t("cvecs.count") { cvecs.count() }
      t("cvecs materialize (noop)") {
        cvecs.write.format("noop").mode("overwrite").save()
      }
      t("plain kmeans(8,2)") {
        Similarity.kmeansTrain(vecs, 8, 2).count()
      }
      t("plain kmeans(8,0)") {
        Similarity.kmeansTrain(vecs, 8, 0).count()
      }
      t("clustered kmeans(8,0)") {
        Similarity.kmeansTrain(cvecs, 8, 0).count()
      }
      t("clustered kmeans(8,1)") {
        Similarity.kmeansTrain(cvecs, 8, 1).count()
      }
      t("clustered kmeans(8,2)") {
        Similarity.kmeansTrain(cvecs, 8, 2).count()
      }
      t("clustered trainedCents(8,2)") {
        Similarity.imiTrainedCents(cvecs, 8, 2).foreach(_.count())
      }
    }
    spark.stop()
  }
}
