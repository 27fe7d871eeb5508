package graft

import graft.operators.{ConnectedComponents, Dedup}

/** Dev timing probe: connected components over the v1 (fused md5-per-hash)
  * vs v2 (one-digest) LSH candidate pair sets at a given SF —
  * `sbt> Test/runMain graft.TimeCC sf0.1`. */
object TimeCC {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "sf0.1"
    val spark = GraftSession.builder("local[32]", "32", "graft-timecc")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/root/testdata/$sf"
    def time(label: String)(f: => Long): Unit = {
      val t1 = System.nanoTime(); val r1 = f
      val t2 = System.nanoTime(); val r2 = f
      val t3 = System.nanoTime()
      println(f"TIME $label%-24s ${(t2 - t1) / 1e9}%.2f ${(t3 - t2) / 1e9}%.2f s  (rows $r2)")
    }
    val corpus = Dedup.augmentCorpus(Tables.documents(spark, dir))
    val v1 = Dedup.lshCandidatePairs(Dedup.minhashSignaturesFused(corpus))
    val v2 = Dedup.lshCandidatePairs(Dedup.minhashSignaturesV2(corpus), sep = "|")
    time("pairs_v1")(v1.count())
    time("pairs_v2")(v2.count())
    time("cc_v1")(ConnectedComponents.canonicalize(corpus, v1).count())
    time("cc_v2")(ConnectedComponents.canonicalize(corpus, v2).count())
    spark.stop()
  }
}
