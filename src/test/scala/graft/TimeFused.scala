package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev micro-bench for the two shuffle-free-signature formulations vs
  * the aggregate path, through the full LSH candidate chain:
  *
  * sbt> Test/runMain graft.TimeFused sf0.1 [numHashes [bands rows]]
  *
  * Prints per-run wall-clock (2 runs: warm-up then steady-state) for
  * (a) exploded-shingle min() aggregate signatures and (b) the fused
  * codegen'd MinHashSigs expression.
  */
object TimeFused {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf0.1")
    val nh = if (args.length > 1) args(1).toInt else Dedup.NumHashes
    val (bands, rows) =
      if (args.length > 3) (args(2).toInt, args(3).toInt)
      else (Dedup.DefaultBands, Dedup.DefaultRowsPerBand)
    val sfDir = s"/root/testdata/$sfName"
    val spark = GraftSession.builder("local[32]", "32", "graft-timefused")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Dedup.augmentCorpus(Tables.documents(spark, sfDir))
    corpus.count() // warm parquet reader
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"TIME $label%-22s ${ts.map(t => f"${t._1}%.2f").mkString(" ")} s" +
        f"  (rows ${ts.head._2})")
    }
    time(s"agg_sig_$nh") {
      Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(Dedup.shingles(corpus), nh), bands, rows)
        .count()
    }
    time(s"fused_sig_$nh") {
      Dedup.lshCandidatePairs(
        Dedup.minhashSignaturesFused(corpus, nh), bands, rows)
        .count()
    }
    time(s"v2_sig_$nh") {
      Dedup.lshCandidatePairs(
        Dedup.minhashSignaturesV2(corpus, nh), bands, rows, sep = "|")
        .count()
    }
    spark.stop()
  }
}
