package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, Joins, Multimodal}

/** Property-based invariants for the pipeline operators, evaluated as
  * batched DataFrames (fixed-seed ScalaCheck generators, one Spark job
  * per property — the ExpressionsSpec pattern).
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(7L))

  private val wordGen = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val docGen = Gen.chooseNum(3, 12)
    .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  test("property: exact dedup partitions the corpus (sum of copies = corpus size, keep_id = min)") {
    val docs = samples(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val corpus = docs.toDF("doc_id", "text")
    val out = Dedup.exactDuplicates(corpus).collect()
    assert(out.map(_.getAs[Long]("n_copies")).sum === docs.size)
    val byText = docs.groupBy(_._2).map { case (t, ds) => t -> ds.map(_._1).min }
    val keepIds = out.map(_.getAs[Long]("keep_id")).toSet
    assert(keepIds === byText.values.toSet)
  }

  test("property: jaccard of every candidate pair lies in (0, 1], self-similarity is 1") {
    val docs = samples(docGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val corpus = docs.toDF("doc_id", "text")
    val sh = Dedup.shingles(corpus)
    // all-pairs candidates over a small corpus: jaccard must be bounded
    val ids = corpus.select($"doc_id".as("id_a"))
    val cands = ids.crossJoin(corpus.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b")
    val jac = Dedup.jaccardPairs(sh, cands)
      .select($"jaccard").as[Double].collect()
    // only pairs with nonzero intersection survive the inner join
    assert(jac.forall(j => j > 0.0 && j <= 1.0))
    // identical doc pair → jaccard exactly 1
    val dup = Seq((1L, "one two three four"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val dupJac = Dedup.jaccardPairs(Dedup.shingles(dup),
      Seq((1L, 2L)).toDF("id_a", "id_b")).select($"jaccard").as[Double].head
    assert(dupJac === 1.0)
  }

  test("property: LSH candidates always include every exact-duplicate pair") {
    // duplicates share all shingles → identical signatures → same buckets
    val base = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val withDups = base ++ base.filter(_._1 % 7 == 0)
      .map { case (i, t) => (i + 1000L, t) }
    val corpus = withDups.toDF("doc_id", "text")
    val cands = Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(Dedup.shingles(corpus)))
      .as[(Long, Long)].collect().toSet
    for ((i, t) <- base if i % 7 == 0 && t.split(" ").length >= 3)
      assert(cands.contains((i, i + 1000L)), s"missing dup pair for doc $i")
  }

  test("property: feature histograms are distributions (non-negative, sum 1)") {
    val byteGen = Gen.chooseNum(1, 64)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
    val payloads = samples(byteGen, 100).zipWithIndex
      .map { case (b, i) => (i.toLong, b.toArray) }
    val feats = Multimodal.extractFeatures(payloads.toDF("doc_id", "payload"))
      .select($"features").as[Seq[Double]].collect()
    for (f <- feats) {
      assert(f.length === 8)
      assert(f.forall(_ >= 0.0))
      assert(math.abs(f.sum - 1.0) < 1e-9)
    }
  }

  test("property: salted join equals plain join for random key distributions and salts") {
    for (salt <- Seq(1, 3, 16)) {
      val keys = samples(Gen.chooseNum(0L, 20L), 500)
      val large = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "payload")
      val small = (0L to 20L).map(k => (k, s"d$k")).toDF("k", "dim")
      val plain = large.join(small, Seq("k")).select($"k", $"payload", $"dim")
      val salted = Joins.saltedJoin(large, small, "k", salt)
        .select($"k", $"payload", $"dim")
      assert(salted.except(plain).count() === 0, s"salt=$salt extra rows")
      assert(plain.except(salted).count() === 0, s"salt=$salt missing rows")
      assert(salted.count() === plain.count(), s"salt=$salt cardinality")
    }
  }
}
