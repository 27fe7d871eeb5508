package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import graft.functions.{functions => gf}
import graft.operators.FlowLog

/** Custom Catalyst expressions + property-based parser tests (ScalaCheck
  * generators with a fixed seed, evaluated as one batched DataFrame). */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  test("gzip → gunzip round-trips document text") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val bad = docs.select($"doc_id", $"text",
      gf.gunzip(gf.gzip($"text".cast("binary"))).cast("string").as("rt"))
      .filter($"text" =!= $"rt")
    assert(bad.count() === 0)
  }

  test("gunzip decodes JVM-gzipped bytes (reference envelope codec)") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("hello flow logs".getBytes("UTF-8")); gz.close()
    val got = Seq(bos.toByteArray).toDF("b")
      .select(gf.gunzip($"b").cast("string")).as[String].head
    assert(got === "hello flow logs")
  }

  test("bloom_might_contain: no false negatives, bounded false positives") {
    import org.apache.spark.util.sketch.BloomFilter
    val bloom = BloomFilter.create(1000L, 0.01)
    val members = (0L until 1000L).map(_ * 7919L)
    members.foreach(bloom.putLong)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val nonMembers = (0L until 1000L).map(_ * 7919L + 1L)
    val df = (members ++ nonMembers).toDF("h")
      .withColumn("hit", gf.bloom_might_contain($"h", bytes))
    // codegen path (DataFrame filter) — every member must hit
    assert(df.filter($"h" % 7919L === 0 && !$"hit").count() === 0)
    // false-positive rate on non-members stays near the configured 1%
    val fp = df.filter($"h" % 7919L === 1 && $"hit").count()
    assert(fp <= 50, s"false positives $fp out of 1000 at fpp=0.01")
    // interpreted eval agrees with the codegen'd result
    val expr = graft.functions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(members.head), bytes)
    assert(expr.eval(null) === true)
  }

  test("rolling_fingerprint matches a brute-force reference implementation") {
    val window = 8
    def brute(s: String): Long = {
      val b = s.getBytes("UTF-8")
      if (b.isEmpty) return 0L
      if (b.length <= window)
        return b.foldLeft(0L)((h, c) => h * 1000003L + (c & 0xff))
      (0 to b.length - window).map { i =>
        b.slice(i, i + window).foldLeft(0L)((h, c) => h * 1000003L + (c & 0xff))
      }.min
    }
    val samples = Seq("", "abc", "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "key agg row scan slow fast table value part")
    val got = samples.toDF("s")
      .select(gf.rolling_fingerprint($"s", window)).as[Long].collect()
    assert(got.toSeq === samples.map(brute))
  }

  test("rolling_fingerprint is invariant for identical docs, window-stable for dups") {
    val df = Seq(("a", "shared content body here"), ("b", "shared content body here"))
      .toDF("k", "s").select($"k", gf.rolling_fingerprint($"s", 8).as("fp"))
    val fps = df.as[(String, Long)].collect().toMap
    assert(fps("a") === fps("b"))
  }

  test("winnow_fingerprints: hashes match brute force, every winnowW " +
      "run holds a selection, ties pick the rightmost") {
    val w = 16
    val ww = 8
    def windowHash(b: Array[Byte], p: Int, len: Int): Long =
      b.slice(p, p + len).foldLeft(0L)((h, c) => h * 1000003L + (c & 0xff))
    val rnd = new scala.util.Random(7)
    val vocab = "abcdefgh "
    val samples = Seq("", "abc",
      "a" * 64, // constant bytes: all hashes tie → rightmost each window
      Seq.fill(300)(vocab(rnd.nextInt(vocab.length))).mkString,
      Seq.fill(2000)(vocab(rnd.nextInt(vocab.length))).mkString)
    val got = samples.toDF("s")
      .select(gf.winnow_fingerprints($"s", w, ww).as("fps"))
      .as[Seq[(Int, Long)]].collect()
    for ((s, fps) <- samples.zip(got)) {
      val b = s.getBytes("UTF-8")
      if (b.isEmpty) assert(fps.isEmpty, "empty input must select nothing")
      else if (b.length < w)
        assert(fps === Seq((0, windowHash(b, 0, b.length))),
          "short doc must fingerprint as one whole-doc window at pos 0")
      else {
        val nh = b.length - w + 1
        // every selected hash is the true hash of its window
        for ((p, h) <- fps)
          assert(h === windowHash(b, p, w), s"wrong hash at pos $p")
        // positions strictly increase and dedup
        assert(fps.map(_._1) === fps.map(_._1).distinct.sorted)
        // the winnowing guarantee: every full winnowW run of hash
        // positions contains a selection — this is what makes the
        // cross-corpus span join COMPLETE for spans >= w + ww - 1
        val sel = fps.map(_._1).toSet
        val wEff = math.min(ww, nh)
        for (t <- 0 to nh - wEff)
          assert((t until t + wEff).exists(sel.contains),
            s"no selection in window run [$t, ${t + wEff - 1}]")
        // rightmost tie rule: each selection is the argmin of SOME
        // run with ties to the larger position (the oracle's
        // (h ASC, pos DESC) argmin)
        val hs = (0 until nh).map(p => windowHash(b, p, w))
        for (p <- fps.map(_._1)) {
          val anyRun = (math.max(0, p - wEff + 1) to
            math.min(p, nh - wEff)).exists { t =>
            val run = t until t + wEff
            val minH = run.map(hs).min
            hs(p) == minH && run.filter(q => hs(q) == minH).max == p
          }
          assert(anyRun, s"pos $p is not a rightmost-min of any run")
        }
      }
    }
    // constant input: every window's hashes tie, rightmost wins →
    // selections are every position from ww-1 on (density 1 — the
    // documented worst case of the simple tie rule)
    val const = got(2).map(_._1)
    assert(const === (ww - 1 until "a".repeat(64).length - w + 1),
      "constant input must select the rightmost of every run")
  }

  test("custom expressions are callable from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cast(gunzip(gzip(cast('hi' as binary))) as string) AS rt,
        |       rolling_fingerprint('hello world', 4) AS fp,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
        |""".stripMargin).head()
    assert(r.getAs[String]("rt") === "hi")
    assert(r.getAs[Double]("dp") === 11.0)
    val viaColumn = Seq("hello world").toDF("s")
      .select(gf.rolling_fingerprint($"s", 4)).as[Long].head
    assert(r.getAs[Long]("fp") === viaColumn)
  }

  test("SQL-registered functions coerce raw argument types like the Column API") {
    graft.functions.GraftExtensions.register(spark)
    // gzip over a bare STRING and dot_product over array<float>/array<int>
    // must cast (not ClassCastException / silently-wrong getDouble reads).
    val r = spark.sql(
      """SELECT cast(gunzip(gzip('hi')) as string) AS rt,
        |       dot_product(array(cast(1.5 as float), cast(2.0 as float)),
        |                   array(2, 3)) AS dp
        |""".stripMargin).head()
    assert(r.getAs[String]("rt") === "hi")
    assert(r.getAs[Double]("dp") === 9.0)
  }

  test("try_gunzip yields null on corrupt payload instead of throwing") {
    graft.functions.GraftExtensions.register(spark)
    val rows = Seq(Array[Byte](9, 9, 9)).toDF("b")
      .select(gf.try_gunzip($"b").as("a"))
      .union(spark.sql("SELECT try_gunzip(cast('junk' as binary))"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("zorder2 matches a brute-force bit interleave (codegen path)") {
    def brute(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((z, i) =>
        z | ((x >>> i) & 1L) << (2 * i) | ((y >>> i) & 1L) << (2 * i + 1))
    val gen = for {
      x <- Gen.choose(0L, 1023L); y <- Gen.choose(0L, 1023L)
    } yield (x, y)
    val cases = samples(gen, 200) ++ Seq((0L, 0L), (1023L, 1023L), (3L, 2L))
    val got = cases.toDF("x", "y")
      .select(gf.zorder2($"x", $"y", 10)).as[Long].collect()
    assert(got.toSeq === cases.map { case (x, y) => brute(x, y, 10) })
    // known value: x=3 (bits 11), y=2 (bits 10) → z = 1101b = 13
    assert(brute(3L, 2L, 10) === 13L)
  }

  test("zorder2 buckets bound both dimensions (the locality contract)") {
    // Rows sharing a z-prefix tile must lie in a 64×64 rectangle: that
    // envelope is what makes footer min/max pruning work post-layout.
    val df = Tables.lineitem(spark, sfDir)
      .select(pmod($"l_partkey", lit(1024)).cast("long").as("px"),
        pmod($"l_suppkey", lit(1024)).cast("long").as("sx"))
      .withColumn("bucket", shiftright(gf.zorder2($"px", $"sx", 10), 12))
      .groupBy("bucket")
      .agg((max($"px") - min($"px")).as("pspan"),
        (max($"sx") - min($"sx")).as("sspan"))
    val bad = df.filter($"pspan" >= 64 || $"sspan" >= 64).count()
    assert(bad === 0)
  }

  test("property: parser never crashes and routes junk to dead-letter") {
    val lines = samples(Arbitrary.arbitrary[String], 200)
      .map(_.replace('\n', ' ').replace('\r', ' '))
    val out = FlowLog.parseFlowLines(
      lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "line"))
      .select($"line", $"error").as[(String, Boolean)].collect()
    // arbitrary strings essentially never match the 14-field grammar
    for ((line, err) <- out)
      assert(err || line.matches(FlowLog.FlowRegex), line)
  }

  test("property: synthesize∘parse = identity on valid field values") {
    val gen = for {
      eni <- Gen.identifier.suchThat(_.nonEmpty).map("eni-" + _)
      src <- Gen.choose(0, 255)
      port <- Gen.choose(0, 65535)
      act <- Gen.oneOf("ACCEPT", "REJECT")
      st <- Gen.oneOf("OK", "NODATA", "SKIPDATA")
    } yield (eni, src, port, act, st)
    val cases = samples(gen, 100)
    val lines = cases.zipWithIndex.map { case ((eni, src, port, act, st), i) =>
      (i.toLong,
        s"2 123456789012 $eni $src.0.0.1 10.0.0.2 $port 22 6 1 100 1418530010 1418530070 $act $st")
    }
    val out = FlowLog.parseFlowLines(lines.toDF("id", "line"))
      .orderBy("id").collect()
    for (((eni, src, port, act, st), i) <- cases.zipWithIndex) {
      val r = out(i)
      assert(!r.getAs[Boolean]("error"))
      assert(r.getAs[String]("interface_id") === eni)
      assert(r.getAs[Int]("srcport") === port)
      assert(r.getAs[String]("action") === act)
      assert(r.getAs[String]("log_status") === st)
    }
  }
}
