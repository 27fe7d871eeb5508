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

  test("property: hashBucketLocal equals the hashBucket expression on arbitrary strings") {
    // The driver-side replica powers the inverted index's static
    // partition filter — a divergence would silently serve BM25 from
    // the WRONG (empty) buckets, so the parity is pinned over mixed
    // ASCII/multi-byte UTF-8 keys (Spark's md5 hashes the UTF-8
    // encoding; the local replica must match byte-for-byte).
    val keyGen = for {
      n <- Gen.chooseNum(0, 12)
      cs <- Gen.listOfN(n, Gen.frequency(8 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('é', '中', 'λ', ' ', ':')))
    } yield cs.mkString
    val keys = samples(keyGen, 300).distinct
    val got = keys.toDF("k")
      .select($"k", graft.operators.Sampling.hashBucket($"k", 64).as("b"))
      .as[(String, Int)].collect().toMap
    keys.foreach { k =>
      assert(got(k) === graft.operators.Sampling.hashBucketLocal(k, 64),
        s"bucket mismatch for key '$k'")
    }
  }

  test("property: phraseMatch equals a sliding-window reference on random docs") {
    // Independent reference: count phrase occurrences by sliding a
    // window over each doc's token list. The positional-leg join must
    // agree on arbitrary corpora, including overlapping matches and
    // absent docs.
    val docGen2 = Gen.chooseNum(1, 15)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val docs = samples(docGen2, 100).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }
    val phraseGen = Gen.chooseNum(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val phrases = samples(phraseGen, 5).distinct
    val corpus = docs.map { case (i, ws) => (i, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    phrases.foreach { ph =>
      val got = graft.operators.TextAnalysis.phraseMatch(corpus, ph)
        .as[(Long, Long)].collect().toMap
      val want = docs.flatMap { case (i, ws) =>
        val n = ws.sliding(ph.length).count(_ == ph)
        if (n > 0 && ws.length >= ph.length) Some(i -> n.toLong) else None
      }.toMap
      assert(got === want, s"phrase $ph mismatch")
    }
  }

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

  test("property: codegen'd fused signatures equal the aggregate path at 6 and 64 hashes") {
    // MinHashSigs computes every slot in one pass over raw digests;
    // it must be bit-identical to the exploded-shingle min() aggregate
    // (hex encoding is monotone in unsigned byte order), including the
    // <3-word null/filter semantics and empty-token split behavior.
    val corpus = Dedup.augmentCorpus(Tables.documents(spark, sfDir))
      .unionByName(Seq(
        (900001L, "one two"),              // <3 words: must drop
        (900002L, "a  b c"),               // double space: empty token
        (900003L, "x y z")).toDF("doc_id", "text"))
    for (nh <- Seq(6, 64)) {
      val agg = Dedup.minhashSignatures(Dedup.shingles(corpus), nh)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val fused = Dedup.minhashSignaturesFused(corpus, nh)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(fused.keySet === agg.keySet, s"doc sets differ at $nh hashes")
      for ((id, sig) <- agg)
        assert(fused(id) === sig, s"signature mismatch for doc $id at $nh hashes")
    }
  }

  test("property: v2 signatures equal an independent reference at 6 and 64 hashes") {
    // MinHashSigsV2 = one md5/shingle, sig_k = unsigned min over
    // shingles of h1 + k*h2 (big-endian digest halves, long
    // wraparound). Reference computed here from scratch (MessageDigest
    // + BigInt), including <3-word null and empty-token semantics.
    def reference(text: String, nh: Int): Option[Seq[Long]] = {
      val words = text.split(" ", -1)
      if (words.length < 3) return None
      val md = java.security.MessageDigest.getInstance("MD5")
      val mins = Array.fill(nh)(BigInt("ffffffffffffffff", 16))
      val M = BigInt(1) << 64
      for (i <- 0 to words.length - 3) {
        val d = md.digest((words(i) + " " + words(i + 1) + " " + words(i + 2))
          .getBytes("UTF-8"))
        val h1 = BigInt(1, d.take(8))
        val h2 = BigInt(1, d.drop(8))
        for (k <- 1 to nh) {
          val v = (h1 + k * h2) mod M
          if (v < mins(k - 1)) mins(k - 1) = v
        }
      }
      Some(mins.toSeq.map(_.toLong)) // BigInt.toLong wraps like the signed view
    }
    val corpus = Dedup.augmentCorpus(Tables.documents(spark, sfDir))
      .unionByName(Seq(
        (900001L, "one two"),              // <3 words: must drop
        (900002L, "a  b c"),               // double space: empty token
        (900003L, "x y z")).toDF("doc_id", "text"))
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (nh <- Seq(6, 64)) {
      val got = Dedup.minhashSignaturesV2(corpus, nh)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail.map(_.asInstanceOf[Long])).toMap
      val want = texts.flatMap { case (id, t) =>
        reference(t, nh).map(id -> _)
      }
      assert(got.keySet === want.keySet, s"doc sets differ at $nh hashes")
      for ((id, sig) <- want)
        assert(got(id) === sig, s"v2 signature mismatch for doc $id at $nh hashes")
    }
  }

  test("property: v2 LSH candidates include every exact-duplicate pair") {
    // identical text → identical digest stream → identical v2
    // signatures → same band buckets (the | separator keeps decimal
    // renderings unambiguous).
    val base = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val withDups = base ++ base.filter(_._1 % 7 == 0)
      .map { case (i, t) => (i + 1000L, t) }
    val corpus = withDups.toDF("doc_id", "text")
    val cands = Dedup.lshCandidatePairs(
      Dedup.minhashSignaturesV2(corpus), sep = "|")
      .as[(Long, Long)].collect().toSet
    for ((i, t) <- base if i % 7 == 0 && t.split(" ").length >= 3)
      assert(cands.contains((i, i + 1000L)), s"missing dup pair for doc $i")
  }

  test("property: skew-guarded LSH equals the plain expansion and bounds every agg group") {
    // Degenerate single-bucket corpus: identical documents, so every
    // band bucket holds the WHOLE corpus. The plain expansion would
    // buffer all n ids in one collect_set; the guard must salt the
    // bucket into ~n/maxBucket bounded sub-groups and still emit
    // exactly the n(n-1)/2 complete pair set.
    val n = 2000
    val maxBucket = 50
    val corpus = (0L until n.toLong).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(Dedup.shingles(corpus))
    val pairs = Dedup.lshCandidatePairsSkewGuarded(sigs, maxBucket = maxBucket)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    // The buffer bound is only real if the salt spreads: recompute the
    // salted group sizes and require no group far above the target
    // (multinomial balance; 4x leaves no flake room at 40 groups of 50).
    val salted = sigs
      .select($"doc_id", Dedup.bandBuckets(3, 2).as("bucket"))
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"bucket")))
      .filter($"bsize" > maxBucket)
      .withColumn("salt", pmod(xxhash64($"doc_id"),
        expr(s"(bsize + ${maxBucket - 1}) div $maxBucket")))
      .groupBy($"bucket", $"salt").count()
    val maxGroup = salted.agg(max($"count")).head.getLong(0)
    assert(maxGroup <= 4L * maxBucket,
      s"salted sub-group of $maxGroup docs exceeds 4x maxBucket=$maxBucket")
  }

  test("property: skew-guarded LSH matches the plain pair set on a mixed corpus") {
    // maxBucket=2 forces the salted path through every 3+-doc bucket of
    // a realistic corpus (dups + near-dups + unrelated docs): guarded
    // and plain operators must produce the identical candidate set.
    val base = samples(docGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val withDups = base ++ base.filter(_._1 % 5 == 0)
      .map { case (i, t) => (i + 1000L, t) }
    val corpus = withDups.toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(Dedup.shingles(corpus))
    val plain = Dedup.lshCandidatePairs(sigs)
      .as[(Long, Long)].collect().toSet
    val guarded = Dedup.lshCandidatePairsSkewGuarded(sigs, maxBucket = 2)
      .as[(Long, Long)].collect().toSet
    assert(plain.nonEmpty && guarded === plain,
      s"guarded (${guarded.size}) must equal plain (${plain.size})")
  }

  test("property: guarded cosine pairs equal the plain label join on a mega-label") {
    // One label holding the whole corpus — the mega-cluster shape the
    // guard exists for. At maxLabel=8 every in-label pair must still
    // appear with the bit-identical rounded cosine the plain blocked
    // self-join computes, and no salted sub-group may hold an
    // unbounded id buffer.
    val rnd = new scala.util.Random(11)
    val n = 120
    val vecs = (0L until n.toLong)
      .map(i => (i, 0, Array.fill(6)(rnd.nextGaussian()).toSeq))
      .toDF("vec_id", "label", "v")
    val plain = graft.operators.Similarity.cosineDupPairs(vecs, -1.0)
      .as[(Long, Long, Double)].collect().toSet
    val guarded = graft.operators.Similarity
      .cosineDupPairsGuarded(vecs, -1.0, maxLabel = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(plain.size === n * (n - 1) / 2)
    assert(guarded === plain,
      s"guarded (${guarded.size}) must equal plain (${plain.size}) bit-for-bit")
  }

  test("property: IMI exhaustive pair probing equals brute force on " +
      "random corpora, odd and even dims") {
    // The multi-index splits at size/2 — the odd-dimension case gives
    // the two halves DIFFERENT widths, exactly where a slice
    // off-by-one would silently drop or duplicate a dimension. With
    // every virtual pair probed the cells partition the corpus, so
    // the serve must equal brute force bit-for-bit regardless of
    // geometry; and the rank-1 pair indexing must place every corpus
    // vector in exactly one cell (no duplicate candidates).
    val rnd = new scala.util.Random(13)
    for (dim <- Seq(5, 8, 13)) {
      val vecs = (0L until 60L)
        .map(i => (i, (i % 4).toInt,
          Array.fill(dim)(rnd.nextGaussian()).toSeq))
        .toDF("vec_id", "label", "v")
      val probes = vecs.filter($"vec_id" < 8)
      val k = 4
      val exact = graft.operators.Similarity
        .bruteForceTopK(vecs.select($"vec_id", $"v"),
          probes.select($"vec_id", $"v"), k)
        .select($"probe_id", $"neighbor_id", $"cos_r", $"rank".as("rnk"))
        .collect().toSet
      val got = graft.operators.Similarity
        .imiTopK(vecs, probes, k, nprobe = 16)
        .select($"probe_id", $"neighbor_id", $"cos_r", $"rnk")
        .collect().toSet
      assert(got === exact,
        s"dim=$dim: exhaustive IMI diverged from brute force")
      val dup = graft.operators.Similarity
        .imiTopK(vecs, probes, Int.MaxValue, nprobe = 16)
        .groupBy($"probe_id", $"neighbor_id").count()
        .filter($"count" > 1).count()
      assert(dup === 0, s"dim=$dim: a vector surfaced from two cells")
    }
  }

  test("property: feature histograms are per-channel distributions " +
      "(non-negative, each channel sums to 1)") {
    import graft.functions.RasterKernel
    val rasterGen = for {
      c <- Gen.chooseNum(1, 4)
      w <- Gen.chooseNum(1, 9)
      h <- Gen.chooseNum(1, 9)
      pix <- Gen.listOfN(w * h * c, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (c, RasterKernel.build(c, w, h, pix.toArray))
    val drawn = samples(rasterGen, 100).zipWithIndex
      .map { case ((c, b), i) => (i.toLong, c, b) }
    val chans = drawn.map(r => r._1 -> r._2).toMap
    val feats = Multimodal.extractFeatures(
      drawn.map(r => (r._1, r._3)).toDF("doc_id", "payload"))
      .select($"doc_id", $"features").as[(Long, Seq[Double])].collect()
    assert(feats.length === drawn.length)
    for ((id, f) <- feats) {
      val c = chans(id)
      assert(f.length === c * 8)
      assert(f.forall(_ >= 0.0))
      for (ch <- 0 until c)
        assert(math.abs(f.slice(ch * 8, ch * 8 + 8).sum - 1.0) < 1e-9,
          s"doc $id channel $ch not a distribution")
    }
  }

  test("property: LSH S-curve — high-Jaccard pairs are candidates w.h.p., low-Jaccard rarely") {
    // Exact-Jaccard construction: each pair p gets its own shingle
    // universe (tokens prefixed p<i>), pair docs (2i, 2i+1) share
    // `shared` shingles out of `per` each.
    //   high: shared 45 of 50 → J = 45/55 ≈ 0.818
    //   low:  shared 23 of 50 → J = 23/77 ≈ 0.299
    // With 16 hashes as 4 bands × 4 rows the S-curve
    // P(candidate) = 1 − (1 − J^4)^4 gives ≈0.91 at J=.818 and ≈0.03
    // at J=.299 — asserted with wide margins (≥75% / ≤15%) so the
    // fixed-seed draw never flakes.
    val nPairs = 120
    val per = 50
    def mkPairs(shared: Int, tag: String): Seq[(Long, String)] =
      (0 until nPairs).flatMap { p =>
        val common = (0 until shared).map(j => s"$tag${p}c$j")
        val aOnly = (0 until per - shared).map(j => s"$tag${p}a$j")
        val bOnly = (0 until per - shared).map(j => s"$tag${p}b$j")
        (common ++ aOnly).map((2L * p, _)) ++
          (common ++ bOnly).map((2L * p + 1, _))
      }
    def candidateRate(shared: Int, tag: String): Double = {
      val sh = mkPairs(shared, tag).toDF("doc_id", "shingle")
      val cand = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(sh, numHashes = 16),
        bands = 4, rowsPerBand = 4)
        .filter($"id_b" === $"id_a" + 1 && $"id_a" % 2 === 0)
        .count()
      cand.toDouble / nPairs
    }
    val hi = candidateRate(45, "h")
    val lo = candidateRate(23, "l")
    info(f"S-curve candidate rate: J≈0.82 → $hi%.3f, J≈0.30 → $lo%.3f")
    assert(hi >= 0.75, s"high-Jaccard pairs should almost all be candidates, got $hi")
    assert(lo <= 0.15, s"low-Jaccard pairs should rarely be candidates, got $lo")
  }

  test("property: simhash pigeonhole banding recovers every pair within maxDist = bands - 1") {
    val bitGen = Gen.listOfN(16, Gen.oneOf("0", "1")).map(_.mkString)
    val flipGen = Gen.pick(3, 0 until 16)
    val base = samples(bitGen, 80)
    val flips = samples(flipGen, 80)
    // doc 2i = random fingerprint; doc 2i+1 = same with exactly 3 bits
    // flipped → Hamming distance 3, recoverable with 4 bands (maxDist 3).
    val sims = base.zip(flips).zipWithIndex.flatMap { case ((s, fl), i) =>
      val flipped = s.zipWithIndex
        .map { case (c, j) => if (fl.contains(j)) (if (c == '0') '1' else '0') else c }
        .mkString
      Seq((2L * i, s), (2L * i + 1, flipped))
    }.toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairs(sims, maxDist = 3, bands = 4)
      .filter($"id_b" === $"id_a" + 1 && $"id_a" % 2 === 0)
    assert(pairs.count() === 80,
      "every distance-3 pair must be recovered by 4-band pigeonhole")
    // the guarantee does NOT hold past bands-1, and the API refuses it
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(sims, maxDist = 2, bands = 2)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(sims, maxDist = 1, bands = 3) // 3 ∤ 16
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

  test("property: compaction plan partitions any file list exactly and closes bins at boundaries") {
    val fileGen = for {
      part <- Gen.oneOf("p0", "p1", "p2")
      bytes <- Gen.frequency(8 -> Gen.chooseNum(1L, 120L),
        2 -> Gen.chooseNum(200L, 900L)) // oversized files included
    } yield (part, bytes)
    val files = samples(fileGen, 120).zipWithIndex
      .map { case ((p, b), i) => (p, i.toLong, b) }
    val target = 250L
    val df = files.toDF("part_key", "file_id", "bytes")
    val plan = graft.operators.Profiling.compactionPlan(df, target)
      .collect()
    // exactness: every file in exactly one bin, bytes conserved
    assert(plan.map(_.getAs[Long]("n_files")).sum == files.length)
    assert(plan.map(_.getAs[Long]("bin_bytes")).sum ==
      files.map(_._3).sum)
    plan.groupBy(_.getString(0)).foreach { case (part, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("bin"))
      var cum = 0L
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          // disjoint ordered id ranges
          assert(x.getAs[Long]("last_file") < y.getAs[Long]("first_file"),
            s"$part: overlapping bins")
          // a bin only closes because the running total crossed the
          // next present bin's byte boundary
          cum += x.getAs[Long]("bin_bytes")
          assert(cum >= y.getAs[Long]("bin") * target,
            s"$part: bin ${x.getAs[Long]("bin")} closed early at $cum")
        case _ =>
      }
    }
  }

  test("property: sharded KMV equals monolithic on random corpora and shardings") {
    val keyGen = Gen.chooseNum(0, 400).map(i => s"k$i")
    for (shards <- Seq(2, 5)) {
      val rows = samples(Gen.zip(keyGen, Gen.oneOf("g1", "g2")), 500)
        .zipWithIndex.map { case ((k, g), i) => (k, g, (i % shards).toLong) }
      val df = rows.toDF("key", "grp", "shard")
      val mono = graft.operators.Sketches
        .kmvDistinct(df, col("key"), col("grp"), k = 16)
      val sharded = graft.operators.Sketches
        .kmvDistinctSharded(df, col("key"), col("grp"), col("shard"),
          k = 16)
      assert(mono.exceptAll(sharded).isEmpty &&
        sharded.exceptAll(mono).isEmpty,
        s"shard-merge mismatch at $shards shards")
    }
  }

  test("property: negativeSample equals a local replay at any corpus " +
      "size — the only draw loss is the self-collision drop") {
    // The occupied-bucket remap's contract: no draw can vanish into an
    // empty bucket, so per-anchor count = kNeg − (draws that hit the
    // anchor's own representative). Verified by replaying the whole
    // derivation locally with the same md5-prefix hash
    // (hashBucketLocal is the byte-for-byte driver-side replica) — at
    // corpus sizes from 2 up, including sizes far below the bucket
    // count (where the old raw-bucket join lost most draws) and
    // non-contiguous id sets.
    import graft.operators.Sampling
    for (n <- Seq(2, 3, 7, 40, 90)) {
      val ids = (0 until n).map(i => i.toLong * 13 + 5)
      val got = Sampling
        .negativeSample(ids.toDF("doc_id"), col("doc_id"), kNeg = 4,
          buckets = 64)
        .as[(Long, Int, Long)].collect().toSet
      val repBySlot = ids.groupBy(id =>
          Sampling.hashBucketLocal(id.toString, 64))
        .map { case (b, xs) => b -> xs.min }
        .toSeq.sortBy(_._1).map(_._2)
      val nOcc = repBySlot.length
      val want = (for {
        id <- ids; j <- 1 to 4
        neg = repBySlot(Sampling.hashBucketLocal(s"$id:$j", nOcc))
        if neg != id
      } yield (id, j, neg)).toSet
      assert(got == want,
        s"n=$n: engine result diverged from the local replay " +
          s"(got ${got.size}, want ${want.size})")
      // Fixture sanity (independent of the equality above): the replay
      // itself must retain draws for most anchors, or the set-equality
      // check would be vacuous on a degenerate corpus.
      assert(want.map(_._1).toSet.size >= n - 1,
        s"n=$n: replay degenerate — ${want.map(_._1).toSet.size} of $n " +
          "anchors retained any draw")
    }
  }

  test("property: sharded quantile sketch equals monolithic on random " +
      "corpora and shardings") {
    val rowGen = for {
      key <- Gen.chooseNum(0L, 100000L)
      v <- Gen.chooseNum(-5000L, 5000L)
      g <- Gen.oneOf("g1", "g2", "g3")
    } yield (key, v, g)
    for (shards <- Seq(2, 7)) {
      // Distinct keys (the sample's row identity), arbitrary values
      // including negatives, arbitrary disjoint sharding.
      val rows = samples(rowGen, 600).zipWithIndex
        .map { case ((k, v, g), i) =>
          (k * 1000 + i, v, g, (i % shards).toLong - 1) } // shard −1..
      val df = rows.toDF("key", "v", "grp", "shard")
      val mono = graft.operators.Sketches
        .quantileSketch(df, col("key"), col("v"), col("grp"), k = 16)
      val sharded = graft.operators.Sketches
        .quantileSketchSharded(df, col("key"), col("v"), col("grp"),
          col("shard"), k = 16)
      assert(mono.exceptAll(sharded).isEmpty &&
        sharded.exceptAll(mono).isEmpty,
        s"quantile shard-merge mismatch at $shards shards")
    }
  }

  test("property: CDC chunks cover arbitrary strings exactly and " +
      "reassemble to the original text") {
    // Coverage invariant on random content: per doc, chunk lengths sum
    // to the text length, chunk numbers are dense from 0, and the
    // chunks' md5s equal the md5s of the substrings they claim —
    // verified by reconstructing boundaries locally from the same
    // window-hash derivation.
    val txtGen = for {
      n <- Gen.chooseNum(0, 120)
      cs <- Gen.listOfN(n, Gen.alphaNumChar)
    } yield cs.mkString
    val docs = samples(txtGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val got = graft.operators.Multimodal
      .cdcChunks(df, window = 8, divisor = 16)
      .collect()
      .groupBy(_.getLong(0))
    docs.foreach { case (id, t) =>
      if (t.isEmpty) assert(!got.contains(id), s"doc $id: empty emits none")
      else {
        val c = got(id).sortBy(_.getInt(1))
        assert(c.map(_.getInt(2)).sum == t.length,
          s"doc $id: chunks must cover ${t.length} chars")
        assert(c.map(_.getInt(1)).toSeq == c.indices.toSeq,
          s"doc $id: chunk numbers must be dense")
        // Each chunk hash matches the md5 of the substring it covers.
        var off = 0
        c.foreach { r =>
          val len = r.getInt(2)
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(t.substring(off, off + len)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          assert(r.getString(3) == digest.map(b => f"$b%02x").mkString,
            s"doc $id: chunk at $off hash mismatch")
          off += len
        }
      }
    }
  }

  test("property: BPE merge fold equals an independent positional scan on random symbol runs") {
    // The fold (aggregate() HOF, bpeTrainLoop's rewrite) against a
    // straight index-walk reference: scan left to right, merge (a,b)
    // when it matches, skip past the pair — the textbook definition of
    // leftmost-first non-overlapping. A tiny alphabet with 'ab'
    // included makes collisions between merged output ('a'||'b') and
    // pre-existing symbols reachable, and heavy repetition exercises
    // the a==b run parity ("aaaa" -> [aa][aa]).
    def refMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val symGen = Gen.oneOf("a", "b", "ab", "c")
    val caseGen = for {
      n <- Gen.chooseNum(0, 10)
      syms <- Gen.listOfN(n, symGen)
      a <- symGen
      b <- symGen
    } yield (syms, a, b)
    val cases = samples(caseGen, 400).zipWithIndex
    val df = cases.map { case ((syms, a, b), id) =>
      (id.toLong, syms, a, b)
    }.toDF("id", "syms", "ma", "mb")
    val got = df
      .withColumn("merged", graft.operators.TextAnalysis.bpeMergeFold)
      .select($"id", $"merged").as[(Long, Seq[String])].collect().toMap
    cases.foreach { case ((syms, a, b), id) =>
      val want = refMerge(syms, a, b)
      assert(got(id.toLong) === want,
        s"fold mismatch on syms=$syms pair=($a,$b): " +
          s"got ${got(id.toLong)}, want $want")
    }
  }

  test("property: KMV set-ops from stored synopses are exact whenever the pair window fits") {
    // Random overlapping sets per group, all smaller than k: every
    // figure kmvSetOps emits must equal the true set algebra computed
    // locally (the n_kept < k branch is EXACT by construction, for any
    // key distribution and any overlap structure — the property the
    // one-fixture PipelineSpec case cannot cover).
    val keyGen = Gen.chooseNum(0, 60).map(i => s"k$i")
    val grpGen = Gen.oneOf("g1", "g2", "g3")
    val rows = samples(Gen.zip(grpGen, keyGen), 150)
    val sets = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).toSet
    }
    withTempDir("graft_syn_prop") { dir =>
      graft.operators.Sketches.writeKmvSynopses(
        rows.toDF("src", "key"), col("key"), col("src"), dir, k = 64)
      val got = graft.operators.Sketches.kmvSetOps(spark, dir, k = 64)
        .select($"ga", $"gb", $"est_a", $"est_b", $"est_union",
          $"est_inter", $"est_only_a")
        .as[(String, String, Long, Long, Long, Long, Long)]
        .collect()
      assert(got.length === sets.size * (sets.size - 1) / 2,
        "one row per unordered group pair expected")
      got.foreach { case (ga, gb, ea, eb, eu, ei, eoa) =>
        val (sa, sb) = (sets(ga), sets(gb))
        assert(ea === sa.size.toLong && eb === sb.size.toLong,
          s"per-side sizes wrong for ($ga,$gb)")
        assert(eu === (sa ++ sb).size.toLong,
          s"union wrong for ($ga,$gb): $eu")
        assert(ei === (sa & sb).size.toLong,
          s"intersection wrong for ($ga,$gb): $ei")
        assert(eoa === (sa -- sb).size.toLong,
          s"difference wrong for ($ga,$gb): $eoa")
      }
    }
  }

  test("property: external CMS lookups stay one-sided (est >= true) including absent keys") {
    // Candidates drawn from a WIDER key space than the build stream:
    // for present keys est_c >= true_c (collisions only inflate), and
    // an absent key with est_c = 0 proves the missing-cell-as-zero
    // lookup semantics (an inner join would have dropped it; taking
    // min over only populated cells would have inflated it).
    val buildKeys = samples(Gen.chooseNum(0, 80).map(i => s"k$i"), 400)
    val candKeys = (0 to 160).map(i => s"k$i")
    val sketch = graft.operators.Sketches.cmsBuild(
      buildKeys.toDF("key"), col("key"), depth = 3, width = 64)
    val trueCounts = buildKeys.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val cand = candKeys.map(k => (k, trueCounts.getOrElse(k, 0L)))
      .toDF("k", "true_c")
    val scored = graft.operators.Sketches.cmsScore(sketch, cand,
      depth = 3, width = 64)
      .as[(String, Long, Long)].collect()
    assert(scored.length === candKeys.length,
      "every candidate must score — absent keys may not vanish")
    scored.foreach { case (k, t, e) =>
      assert(e >= t, s"one-sided bound violated for $k: est $e < true $t")
      if (e == 0L) assert(t == 0L,
        s"est 0 for a key the build saw $t times")
    }
    assert(scored.exists { case (_, t, e) => t == 0L },
      "fixture degenerate: no absent candidate keys")
  }
}
