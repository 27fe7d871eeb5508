package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators Spark lacks built-ins
  * for: gzip codec (the reference's envelope decompression,
  * ingestor/index.js:100-110) and a winnowing rolling-hash document
  * fingerprint (charter text-analysis extension).
  *
  * Gzip/Gunzip are interpreted (CodegenFallback) — the cost is the
  * deflate call, not dispatch. The per-byte expressions on hot paths
  * (RollingFingerprint, DotProduct) generate code (doGenCode) so they
  * stay inside whole-stage codegen.
  */

/** gunzip(binary) → binary. Null on input null; throws on corrupt gzip
  * (callers wanting dead-letter semantics should pre-validate, as the
  * reference does with its try/catch at ingestor/index.js:104-108). */
case class Gunzip(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gunzip"
  override def nullSafeEval(input: Any): Any = {
    val in = new GZIPInputStream(
      new ByteArrayInputStream(input.asInstanceOf[Array[Byte]]))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Gunzip = copy(c)
}

/** gzip(binary) → binary (deterministic: fixed deflate settings). */
case class Gzip(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip"
  override def nullSafeEval(input: Any): Any = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(input.asInstanceOf[Array[Byte]])
    gz.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Gzip = copy(c)
}

/** bloom_might_contain(long) → boolean: membership probe against a
  * driver-built Bloom filter carried in the expression as serialized
  * bytes (same shape as Spark's sql-private runtime-filter
  * `BloomFilterMightContain`, which is bound to its injection rule and
  * not user-constructible). Deserialized once per executor via the
  * codegen reference array; the probe itself is a codegen'd call, so a
  * bloom prefilter sits inside the scan's WholeStageCodegen and the
  * definitely-absent fast path never reaches a shuffle. No false
  * negatives by construction — callers combine it with an exact join on
  * the bloom-positive slice for exact semantics (see
  * Dedup.bloomPrefilterNew).
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.util.sketch.BloomFilter
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(filterBytes)
  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/** rolling_fingerprint(string, window) → long: the minimum of all
  * rolling polynomial hashes over byte windows of length `window`
  * (winnowing-style content fingerprint: stable under local edits
  * outside the minimal window, computed in one O(n) pass). Documents
  * shorter than the window hash as a single window.
  *
  * Codegen'd (doGenCode): this runs once per document over every byte,
  * which IS the hot path of corpus-scale fingerprinting — the generated
  * tight loop stays inside whole-stage codegen instead of breaking the
  * pipeline with interpreted eval.
  */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(window > 0, "window must be positive")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  private val Base = 1000003L
  // Base^(window-1) for removing the outgoing byte (wrapping arithmetic)
  private lazy val basePow: Long = {
    var p = 1L
    var i = 1
    while (i < window) { p *= Base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return 0L
    val w = math.min(window, bytes.length)
    var h = 0L
    var i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var minH = h
    var pow = basePow
    if (w < window) return h
    while (i < bytes.length) {
      h = (h - (bytes(i - w) & 0xff) * pow) * Base + (bytes(i) & 0xff)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val minH = ctx.freshName("minH")
      s"""
         |byte[] $b = $in.getBytes();
         |if ($b.length == 0) {
         |  ${ev.value} = 0L;
         |} else {
         |  int $w = java.lang.Math.min($window, $b.length);
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $w; $i++) { $h = $h * ${Base}L + ($b[$i] & 0xff); }
         |  if ($w < $window) {
         |    ${ev.value} = $h;
         |  } else {
         |    long $minH = $h;
         |    for (; $i < $b.length; $i++) {
         |      $h = ($h - ($b[$i - $w] & 0xff) * ${basePow}L) * ${Base}L
         |          + ($b[$i] & 0xff);
         |      if ($h < $minH) $minH = $h;
         |    }
         |    ${ev.value} = $minH;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

/** The O(n) content-defined-chunking cut kernel shared by
  * [[CdcCutPositions]]'s interpreted eval and its generated code (one
  * implementation, so the two paths cannot diverge bit-wise; the
  * generated call is a single static invoke per DOCUMENT — the
  * per-character loop is compiled Scala, not interpreted Catalyst).
  *
  * Boundary definition: position i (1-based, code points) is a cut
  * when H(i) % divisor == 0, with
  *   H(i) = ( Σ_{j=0}^{w-1} cp(i-j) · Base^j ) mod Mod
  * — a windowed polynomial hash (Rabin–Karp shape) maintained by the
  * standard rolling recurrence
  *   H(i+1) = ((H(i) − cp(i−w+1)·Base^{w−1}) · Base + cp(i+1)) mod Mod,
  * O(1) per character instead of the O(window) digest the md5-window
  * scheme paid. The windowed-sum form is what a SQL oracle evaluates
  * per position (w bounded substring/ord terms — no recursive CTE
  * needed), so per-boundary oracle parity survives the kernel swap.
  * Code points (not bytes) are the hash alphabet because both Spark's
  * `substring` and DuckDB's `substr`/`ord` index by code point — the
  * cut positions feed char-addressed slicing on both sides. */
object CdcKernel {
  /** Fixed public constants (69069: the classic Marsaglia LCG
    * multiplier; 1e9+7: the ubiquitous prime modulus). Recorded
    * implicitly in the chunk-store sidecar via the scheme's
    * window/divisor — changing them is a re-chunk, same as changing
    * the window. */
  val Base = 69069L
  val Mod = 1000000007L

  /** Base^(window-1) mod Mod — the outgoing character's coefficient. */
  def topPow(window: Int): Long = {
    var p = 1L
    var i = 1
    while (i < window) { p = p * Base % Mod; i += 1 }
    p
  }

  /** Cut positions (1-based code-point positions, ascending) of `s`
    * under (window, divisor). Positions below `window` never cut (no
    * full window exists yet), matching the oracle's generate_series
    * lower bound. */
  def cuts(s: UTF8String, window: Int, divisor: Int,
      top: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = s.getBytes
    val ring = new Array[Long](window)
    var buf = new Array[Int](8)
    var cnt = 0
    var h = 0L
    var pos = 0 // code points consumed
    var i = 0 // byte cursor
    while (i < b.length) {
      val b0 = b(i) & 0xff
      var cp = 0
      // UTF8String payloads are valid UTF-8 by construction, so the
      // decoder switches on the lead byte only.
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0) {
        cp = ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0) {
        cp = ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) |
          (b(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f); i += 4
      }
      if (pos >= window)
        h = (h - ring(pos % window) * top % Mod + Mod) % Mod
      h = (h * Base + cp) % Mod
      ring(pos % window) = cp
      pos += 1
      if (pos >= window && h % divisor == 0) {
        if (cnt == buf.length) buf = java.util.Arrays.copyOf(buf, cnt * 2)
        buf(cnt) = pos
        cnt += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, cnt))
  }
}

/** cdc_cuts(string, window, divisor) → array<int>: the content-defined
  * chunk cut positions of [[CdcKernel]] — one O(n) pass per document
  * (the md5-window predecessor digested O(window) bytes per position;
  * at 100 TB the difference is the build cost of the whole
  * content-addressed store, cf. operators/Multimodal.cdcSpans). */
case class CdcCutPositions(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(window >= 2 && divisor >= 2,
    s"degenerate CDC shape window=$window divisor=$divisor")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  private lazy val top: Long = CdcKernel.topPow(window)

  override def nullSafeEval(input: Any): Any =
    CdcKernel.cuts(input.asInstanceOf[UTF8String], window, divisor, top)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.CdcKernel.cuts(" +
        s"$in, $window, $divisor, ${top}L);")

  override protected def withNewChildInternal(c: Expression): CdcCutPositions =
    copy(child = c)
}

/** dot_product(array<double>, array<double>) → double, summed in list
  * order (bit-reproducible against DuckDB's list_dot_product). Spark's
  * higher-order `aggregate(zip_with(...))` equivalent is evaluated
  * interpreted with an intermediate array per row; this expression
  * generates a tight fused loop (doGenCode), which matters at N²
  * similarity-join scale.
  */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** zorder2(long, long) → long: interleaves the low `bits` bits of two
  * keys (x on even positions, y on odd) into one Morton/z-order key.
  * Sorting or range-partitioning a table by this key co-locates rows
  * that are close in BOTH dimensions, so min/max footer pruning on
  * either column stays effective after the layout — the standard
  * multi-dimensional clustering trick for 100 TB lakehouse tables
  * (one sort at write time buys 2-D partition pruning forever).
  * Codegen'd: runs once per row at table-rewrite scale. */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(bits > 0 && bits <= 32, "bits must be in [1,32]")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i) | ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      val s = ctx.freshName("s")
      // Simple statements only: janino misparses a parenthesized shift
      // distance followed by `|` ("(2 * i) | ..." reads as a cast).
      s"""
         |long $z = 0L;
         |int $s = 0;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >>> $i) & 1L) << $s;
         |  $s++;
         |  $z |= (($b >>> $i) & 1L) << $s;
         |  $s++;
         |}
         |${ev.value} = $z;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
}

/** trigram_entropy(string) → struct<n_grams:bigint, n_distinct:bigint,
  * entropy_bits:double>: character-trigram Shannon entropy of one
  * document in ONE pass per row. The computation is pure per-document
  * arithmetic, so the declarative explode → groupBy(doc, gram) →
  * groupBy(doc) pipeline (two shuffles, a corpus×(len−2)-row
  * intermediate) was all distribution overhead; this collapses it to a
  * per-row hash count inside whole-stage codegen — zero shuffles at
  * any corpus size. Bit-parity with the declarative/oracle form is
  * preserved by repeating its arithmetic exactly: each per-gram term
  * c·log2(c) is HALF_UP-rounded to 6 dp and accumulated as exact
  * scaled-long micros (= the decimal(18,6) sum), and the final
  * H = log2(n) − s/n combine uses the same double operations in the
  * same order. Trigrams are counted by code point (matching
  * `substring`'s character semantics, not UTF-16 units); three code
  * points (< 2^21 each) pack into one long key. Input shorter than 3
  * characters (or null) yields null.
  */
case class TrigramEntropy(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "trigram_entropy"

  def compute(u: UTF8String): InternalRow = {
    val cp = u.toString.codePoints().toArray
    val n = cp.length
    if (n < 3) return null
    val counts = new java.util.HashMap[java.lang.Long, Array[Int]]()
    var i = 0
    while (i <= n - 3) {
      val key = java.lang.Long.valueOf(
        (cp(i).toLong << 42) | (cp(i + 1).toLong << 21) | cp(i + 2).toLong)
      val h = counts.get(key)
      if (h == null) counts.put(key, Array(1)) else h(0) += 1
      i += 1
    }
    val nGrams = (n - 2).toLong
    // Σ round6(c·log2(c)) as exact micros — identical to summing the
    // declarative form's round(term, 6).cast(decimal(18,6)) terms
    var sMicros = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > 1) {
        // StrictMath, not Math: Spark's Log expression evaluates
        // StrictMath.log, and the intrinsified Math.log can differ by
        // 1 ulp — enough to break bitwise parity with the declarative
        // form in the final combine
        val term = c.toDouble * (StrictMath.log(c.toDouble) / StrictMath.log(2.0))
        sMicros += java.math.BigDecimal.valueOf(term)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
      }
    }
    val sDouble = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(sMicros), 6).doubleValue()
    val entropy = StrictMath.log(nGrams.toDouble) / StrictMath.log(2.0) -
      sDouble / nGrams.toDouble
    new GenericInternalRow(Array[Any](nGrams, counts.size().toLong, entropy))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  // The loop body lives in compute(); codegen emits one call through a
  // codegen-reference so the expression stays inside whole-stage
  // codegen (no interpreter fallback) without janino parsing the loop.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramEntropy", this,
      classOf[TrigramEntropy].getName)
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = $ref.compute($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): TrigramEntropy =
    copy(child = c)
}

/** All `numHashes` MinHash signature slots of a document in ONE pass —
  * h_k = min over word 3-shingles of md5("k:" ++ shingle), exactly the
  * per-key minimum [[graft.operators.Dedup.minhashSignatures]]
  * aggregates after exploding shingles (min over duplicate shingles
  * equals min over distinct, so no dedup is needed here).
  *
  * Why an expression: the shuffle-free signature path
  * ([[graft.operators.Dedup.minhashSignaturesFused]], required by the
  * streaming chain where no aggregation can precede the stateful
  * operator) previously stacked `numHashes` higher-order
  * `array_min(transform(...))` projections, which evaluate INTERPRETED
  * outside whole-stage codegen — at the production 64-hash width that
  * is 64 interpreted array traversals per row. This computes every
  * slot in one fused loop and compares raw 16-byte digests instead of
  * hex strings (hex encoding is monotone in unsigned byte order, so
  * the min digest IS the min hex), hex-encoding only the final K
  * winners. Codegen emits one call through a codegen-reference (the
  * [[TrigramEntropy]] pattern — inside whole-stage codegen, no janino
  * loop parsing).
  *
  * Documents with fewer than 3 words have no shingles and yield null,
  * matching the batch path's `size(w) >= 3` filter semantics. */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  require(numHashes >= 1 && numHashes <= 256,
    s"numHashes in [1,256], got $numHashes")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (1 to numHashes).map(k =>
      s"$k:".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(u: UTF8String): ArrayData = {
    // Replicates split(text, ' ') semantics (empty tokens kept).
    val words = u.toString.split(" ", -1)
    if (words.length < 3) return null
    val mins = new Array[Array[Byte]](numHashes)
    val digest = md5.get()
    var i = 0
    while (i <= words.length - 3) {
      val shingle = (words(i) + " " + words(i + 1) + " " + words(i + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var k = 0
      while (k < numHashes) {
        digest.reset()
        digest.update(prefixes(k))
        digest.update(shingle)
        val d = digest.digest()
        val cur = mins(k)
        if (cur == null || unsignedLess(d, cur)) mins(k) = d
        k += 1
      }
      i += 1
    }
    val hex = new Array[UTF8String](numHashes)
    var k = 0
    while (k < numHashes) {
      hex(k) = UTF8String.fromString(
        org.apache.commons.codec.binary.Hex.encodeHexString(mins(k)))
      k += 1
    }
    new GenericArrayData(hex.asInstanceOf[Array[Any]])
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigs", this,
      classOf[MinHashSigs].getName)
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = $ref.compute($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigs =
    copy(child = c)
}

/** One-digest MinHash signatures (the v2 family): per word-3-shingle a
  * SINGLE md5, split big-endian into two 64-bit halves (h1, h2), then
  * the k-th signature is the unsigned min over shingles of the
  * Kirsch–Mitzenmacher double hash `h1 + k·h2` in Java long wraparound
  * (mod 2⁶⁴). Versus [[MinHashSigs]] (one md5 PER hash per shingle,
  * the `md5('k:'||shingle)` oracle family) this is ~numHashes× cheaper
  * in digest work — at the production width 64 that is 64 md5s/shingle
  * down to 1 — at the cost of pairwise- rather than fully-independent
  * hash functions (the standard trade; Kirsch–Mitzenmacher shows the
  * Bloom/LSH error bounds survive it).
  *
  * Own oracle contract, distinct from v1 (ADVICE round 8): DuckDB
  * replays it exactly as
  * `(CAST('0x'||substr(md5(sh),1,16) AS UBIGINT) + k * CAST('0x'||
  * substr(md5(sh),17,16) AS UBIGINT)) % 2⁶⁴` in HUGEINT, min taken in
  * the unsigned domain, reinterpreted to signed BIGINT at the end —
  * hex-literal casts and HUGEINT mod-2⁶⁴ are the two cross-version
  * DuckDB surfaces already proven by the rolling-fingerprint oracle.
  *
  * Emits `array<long>` (signed reinterpretation of the unsigned mins);
  * null for docs with fewer than 3 words, matching the
  * `size(w) >= 3` shingle filter. */
case class MinHashSigsV2(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  require(numHashes >= 1 && numHashes <= 256,
    s"numHashes in [1,256], got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs_v2"

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(u: UTF8String): ArrayData = {
    val words = u.toString.split(" ", -1)
    if (words.length < 3) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, -1L) // unsigned max
    val digest = md5.get()
    var i = 0
    while (i <= words.length - 3) {
      val shingle = (words(i) + " " + words(i + 1) + " " + words(i + 2))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      digest.reset()
      val d = digest.digest(shingle)
      // Big-endian halves — the same value DuckDB parses from the hex
      // string's first/last 16 chars.
      val bb = java.nio.ByteBuffer.wrap(d)
      val h1 = bb.getLong(0)
      val h2 = bb.getLong(8)
      var k = 0
      var v = h1
      while (k < numHashes) {
        v += h2 // after k increments: h1 + (k+1)·h2, wraps mod 2^64
        if (java.lang.Long.compareUnsigned(v, mins(k)) < 0) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigsV2", this,
      classOf[MinHashSigsV2].getName)
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = $ref.compute($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigsV2 =
    copy(child = c)
}

/** Shared eval/codegen kernel for the GR raster format — the engine's
  * uncompressed interchange raster for multimodal pipelines (the
  * PNG/JPEG/WAV header codecs in operators/Multimodal parse real
  * container headers; GR carries the DECODED pixels, the way a
  * training pipeline stages rasters between transform stages).
  *
  * Layout (7-byte header + pixels):
  * bytes 1-2 magic `GR`; byte 3 channel count (1-4); bytes 4-5
  * width, bytes 6-7 height (both big-endian u16); then
  * width·height·channels pixel bytes, row-major, channels
  * interleaved. All math is exact integer arithmetic, so every
  * transform is replayable by a SQL oracle byte-for-byte.
  *
  * Both expressions call these static methods from nullSafeEval AND
  * doGenCode — one JIT'd method per row, and the two paths cannot
  * diverge. Malformed bytes (wrong magic, truncated, inconsistent
  * length) return null, never throw — the dead-letter discipline of
  * the header decoders (cf. reference's per-record try/catch at
  * decorator/index.js:206-214). */
object RasterKernel {
  val HeaderLen = 7

  private[graft] def writeHeader(out: Array[Byte], channels: Int, w: Int,
      h: Int): Unit = {
    out(0) = 'G'; out(1) = 'R'; out(2) = channels.toByte
    out(3) = (w >>> 8).toByte; out(4) = w.toByte
    out(5) = (h >>> 8).toByte; out(6) = h.toByte
  }

  /** Assemble a raster from decoded pixels (build-side helper for the
    * synthesizers and tests). */
  def build(channels: Int, w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(channels >= 1 && channels <= 4 && w >= 1 && h >= 1 &&
      w <= 0xffff && h <= 0xffff, s"bad raster shape ${channels}x${w}x$h")
    require(pix.length == w * h * channels,
      s"pixel buffer ${pix.length} != $w*$h*$channels")
    val out = new Array[Byte](HeaderLen + pix.length)
    writeHeader(out, channels, w, h)
    System.arraycopy(pix, 0, out, HeaderLen, pix.length)
    out
  }

  /** (channels, width, height) of a valid raster; null otherwise. */
  def dims(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < HeaderLen || b(0) != 'G' || b(1) != 'R')
      return null
    val c = b(2) & 0xff
    val w = ((b(3) & 0xff) << 8) | (b(4) & 0xff)
    val h = ((b(5) & 0xff) << 8) | (b(6) & 0xff)
    // Length check in LONG: w*h*c reaches 65535*65535*4 ≈ 1.7e10, so
    // Int arithmetic wraps mod 2^32 and a crafted header (e.g. c=4,
    // w=65535, h=16385 → wrapped product 196604) could pass with a
    // tiny body, sending the kernels out of bounds. Malformed bytes
    // must return null, never throw (the dead-letter contract).
    if (c < 1 || c > 4 || w < 1 || h < 1 ||
        b.length.toLong != HeaderLen.toLong + w.toLong * h * c) null
    else Array(c, w, h)
  }

  /** Integer box-filter downsample by `f`: output pixel (x2, y2, ch) is
    * the floor-average of the f×f source block at (x2·f, y2·f) —
    * area-average downscaling over full blocks only (a trailing
    * partial row/column of source pixels is dropped, the standard
    * floor-dims convention). Returns a complete GR raster; null for
    * malformed input or when a dimension shrinks below 1. */
  def resize(b: Array[Byte], f: Int): Array[Byte] = {
    val d = dims(b)
    if (d == null) return null
    val c = d(0); val w = d(1); val h = d(2)
    val w2 = w / f; val h2 = h / f
    if (w2 < 1 || h2 < 1) return null
    val out = new Array[Byte](HeaderLen + w2 * h2 * c)
    writeHeader(out, c, w2, h2)
    val area = f * f
    var o = HeaderLen
    var y2 = 0
    while (y2 < h2) {
      var x2 = 0
      while (x2 < w2) {
        var ch = 0
        while (ch < c) {
          var s = 0
          var dy = 0
          while (dy < f) {
            val rowBase = HeaderLen + ((y2 * f + dy) * w + x2 * f) * c + ch
            var dx = 0
            while (dx < f) { s += b(rowBase + dx * c) & 0xff; dx += 1 }
            dy += 1
          }
          out(o) = (s / area).toByte
          o += 1
          ch += 1
        }
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Nearest-neighbor UPSAMPLE by `f`: output pixel (x, y) copies
    * source pixel (x/f, y/f) — the inverse direction of [[resize]]
    * (down: box-filter average; up: index replication), exact byte
    * semantics. Null for malformed input or output dims over the
    * u16 header bound. */
  def upsample(b: Array[Byte], f: Int): Array[Byte] = {
    val d = dims(b)
    if (d == null) return null
    val c = d(0); val w = d(1); val h = d(2)
    val w2 = w * f; val h2 = h * f
    if (w2 > 0xffff || h2 > 0xffff) return null
    val out = new Array[Byte](HeaderLen + w2 * h2 * c)
    writeHeader(out, c, w2, h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = HeaderLen + ((y / f) * w + x / f) * c
        val dst = HeaderLen + (y * w2 + x) * c
        var ch = 0
        while (ch < c) { out(dst + ch) = b(src + ch); ch += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Channel-mean GRAYSCALE: output is a 1-channel raster of the same
    * width/height, each pixel the floor-average of the source pixel's
    * channels — the standard luma-free gray reduction, exact integer
    * semantics. Null for malformed input; a 1-channel input passes
    * through unchanged (already gray). */
  def gray(b: Array[Byte]): Array[Byte] = {
    val d = dims(b)
    if (d == null) return null
    val c = d(0); val w = d(1); val h = d(2)
    val out = new Array[Byte](HeaderLen + w * h)
    writeHeader(out, 1, w, h)
    var i = HeaderLen
    var o = HeaderLen
    while (i < b.length) {
      var s = 0
      var ch = 0
      while (ch < c) { s += b(i + ch) & 0xff; ch += 1 }
      out(o) = (s / c).toByte
      i += c
      o += 1
    }
    out
  }

  /** HORIZONTAL mirror: pixel (x, y) moves to (width-1-x, y), channels
    * ride along — the canonical augmentation transform, a pure index
    * remap (bytes are permuted, never recomputed). Null for malformed
    * input. */
  def flipH(b: Array[Byte]): Array[Byte] = {
    val d = dims(b)
    if (d == null) return null
    val c = d(0); val w = d(1); val h = d(2)
    val out = new Array[Byte](b.length)
    writeHeader(out, c, w, h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = HeaderLen + (y * w + (w - 1 - x)) * c
        val dst = HeaderLen + (y * w + x) * c
        var ch = 0
        while (ch < c) { out(dst + ch) = b(src + ch); ch += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Rectangular CROP: the (cw × ch) window anchored at (x0, y0),
    * channels preserved — region-of-interest extraction. Null for
    * malformed input or a window that does not fit inside the raster
    * (a partial crop would silently change semantics; callers wanting
    * clamping can read dims first). */
  def crop(b: Array[Byte], x0: Int, y0: Int, cw: Int,
      chh: Int): Array[Byte] = {
    val d = dims(b)
    if (d == null) return null
    val c = d(0); val w = d(1); val h = d(2)
    if (x0 < 0 || y0 < 0 || cw < 1 || chh < 1 ||
        x0 + cw > w || y0 + chh > h) return null
    val out = new Array[Byte](HeaderLen + cw * chh * c)
    writeHeader(out, c, cw, chh)
    var y = 0
    while (y < chh) {
      val srcRow = HeaderLen + ((y0 + y) * w + x0) * c
      System.arraycopy(b, srcRow, out, HeaderLen + y * cw * c, cw * c)
      y += 1
    }
    out
  }

  /** Per-channel pixel statistics: [sum, min, max] per channel,
    * channel-major (channel ch's triple at indices 3·ch .. 3·ch+2) —
    * the exact-integer inputs of a dataset card's per-channel
    * mean/range row. Null for malformed input. */
  def channelStats(b: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = dims(b)
    if (d == null) return null
    val c = d(0)
    val out = new Array[Long](3 * c)
    var ch = 0
    while (ch < c) { out(3 * ch + 1) = 256L; out(3 * ch + 2) = -1L; ch += 1 }
    var i = HeaderLen
    var idx = 0
    while (i < b.length) {
      val k = 3 * (idx % c)
      val v = (b(i) & 0xff).toLong
      out(k) += v
      if (v < out(k + 1)) out(k + 1) = v
      if (v > out(k + 2)) out(k + 2) = v
      i += 1
      idx += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Per-CHANNEL pixel-value histogram: `bins` equal-width buckets of
    * [0, 256) per channel, concatenated channel-major (channel ch's
    * bucket k at index ch·bins + k). Exact integer counts. Null for
    * malformed input. */
  def histogram(b: Array[Byte],
      bins: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = dims(b)
    if (d == null) return null
    val c = d(0)
    val out = new Array[Long](c * bins)
    var i = HeaderLen
    var idx = 0
    while (i < b.length) {
      out((idx % c) * bins + ((b(i) & 0xff) * bins) / 256) += 1
      i += 1
      idx += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Shared eval/codegen kernel for PCM16 WAV payload analysis — the
  * audio sibling of [[RasterKernel]]: a self-contained RIFF chunk walk
  * (word-aligned, unknown ids length-skipped — the same contract as
  * the header decoder in operators/Multimodal, duplicated here so the
  * expression layer stays dependency-free) locates the `fmt ` and
  * `data` chunks, then windowed FULL-frame statistics run in exact
  * integer arithmetic: per window of `winFrames` frames, the energy
  * (Σ sample², each sample a signed 16-bit little-endian value across
  * all channels) and the peak (max |sample|) — the
  * voice-activity/silence-detection features of an audio curation
  * stage, SQL-oracle-replayable bit-for-bit. Malformed/truncated/
  * non-PCM16 bytes → null, never a throw. */
object WavKernel {
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)).toLong & 0xffffffffL

  /** [energy0, peak0, energy1, peak1, …] over the FULL windows (a
    * trailing partial window is dropped, the floor-dims convention of
    * the raster kernels). */
  def windowStats(b: Array[Byte],
      winFrames: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
        b(10) != 'V' || b(11) != 'E') return null
    var i = 12L
    var channels = -1
    var blockAlign = -1
    var dataOff = -1L
    var dataLen = -1L
    while (i + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val off = i.toInt
      val id = new String(b, off, 4, "US-ASCII")
      val len = le32(b, off + 4)
      if (id == "fmt ") {
        if (i + 8 + 16 > b.length) return null
        if (le16(b, off + 8) != 1 || le16(b, off + 22) != 16) return null
        channels = le16(b, off + 10)
        blockAlign = le16(b, off + 20)
      } else if (id == "data") {
        if (i + 8 + len > b.length) return null
        dataOff = i + 8
        dataLen = len
      }
      i += 8 + len + (len & 1)
    }
    if (channels <= 0 || blockAlign != 2 * channels || dataOff < 0)
      return null
    val frames = dataLen / blockAlign
    val nw = (frames / winFrames).toInt
    val out = new Array[Long](2 * nw)
    val samplesPerWin = winFrames * channels
    var w = 0
    while (w < nw) {
      var e = 0L
      var pk = 0L
      var s = w * samplesPerWin
      val end = s + samplesPerWin
      while (s < end) {
        val o = (dataOff + 2L * s).toInt
        var v = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        if (v >= 0x8000) v -= 0x10000
        e += v.toLong * v
        val a = math.abs(v).toLong
        if (a > pk) pk = a
        s += 1
      }
      out(2 * w) = e
      out(2 * w + 1) = pk
      w += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** PNG codec kernel — shared static implementation for the
  * [[PngEncode]]/[[PngDecode]] expressions (one JIT'd body, so the
  * interpreted and codegen paths cannot diverge). Pure public-spec
  * PNG (RFC 2083 / W3C PNG): 8-byte signature, length-prefixed
  * CRC32-trailed chunks, IHDR geometry, zlib-deflated IDAT scanlines
  * each led by a filter byte (None/Sub/Up/Average/Paeth, predictors
  * over RAW bytes of the current and prior scanline), IEND. Scope:
  * bit depth 8, no interlace, color types 0 (gray), 2 (RGB),
  * 4 (gray+alpha), 6 (RGBA) — mapped 1:1 onto the GR raster channel
  * counts, so the whole [[RasterKernel]] family applies to decoded
  * wire-format images. Decode returns null for ANYTHING malformed
  * (bad signature/CRC/geometry/inflate, 16-bit, interlaced, short
  * stream) — the dead-letter contract; it never throws. */
object PngKernel {
  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def colorType(channels: Int): Int = channels match {
    case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6; case _ => -1
  }
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 4 => 2; case 2 => 3; case 6 => 4; case _ => -1
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter one scanline (PNG spec §6): `raw` is the unfiltered row,
    * `prior` the unfiltered previous row (zeros for y = 0), `out`
    * receives the filtered bytes. Exposed private[graft] so the spec
    * can pin each filter's arithmetic against hand-computed values
    * without going through deflate. */
  private[graft] def filterRow(f: Int, raw: Array[Byte],
      prior: Array[Byte], bpp: Int, out: Array[Byte]): Unit = {
    var i = 0
    while (i < raw.length) {
      val left = if (i >= bpp) raw(i - bpp) & 0xff else 0
      val up = prior(i) & 0xff
      val ul = if (i >= bpp) prior(i - bpp) & 0xff else 0
      val pred = f match {
        case 0 => 0
        case 1 => left
        case 2 => up
        case 3 => (left + up) / 2
        case _ => paeth(left, up, ul)
      }
      out(i) = ((raw(i) & 0xff) - pred).toByte
      i += 1
    }
  }

  private def unfilterRow(f: Int, row: Array[Byte],
      prior: Array[Byte], bpp: Int): Boolean = {
    if (f < 0 || f > 4) return false
    var i = 0
    while (i < row.length) {
      val left = if (i >= bpp) row(i - bpp) & 0xff else 0
      val up = prior(i) & 0xff
      val ul = if (i >= bpp) prior(i - bpp) & 0xff else 0
      val pred = f match {
        case 0 => 0
        case 1 => left
        case 2 => up
        case 3 => (left + up) / 2
        case _ => paeth(left, up, ul)
      }
      row(i) = ((row(i) & 0xff) + pred).toByte
      i += 1
    }
    true
  }

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def writeChunk(out: java.io.ByteArrayOutputStream,
      typ: String, data: Array[Byte]): Unit = {
    val body = typ.getBytes("US-ASCII") ++ data
    out.write(be32(data.length), 0, 4)
    out.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    out.write(be32(crc.getValue.toInt), 0, 4)
  }

  /** Encode a GR raster as a real PNG (build-side synthesis for the
    * decode gate, and the write half of a PNG round-trip). Each row's
    * filter type cycles deterministically (y mod 5) so every filter
    * class is exercised on any image taller than 4 rows. Returns null
    * for a malformed raster (dims contract). */
  def encode(gr: Array[Byte]): Array[Byte] = {
    val d = RasterKernel.dims(gr)
    if (d == null) return null
    val c = d(0); val w = d(1); val h = d(2)
    val ct = colorType(c)
    val stride = w * c
    val filtered = new Array[Byte](h * (1 + stride))
    val raw = new Array[Byte](stride)
    val prior = new Array[Byte](stride)
    val rowOut = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      System.arraycopy(gr, RasterKernel.HeaderLen + y * stride, raw, 0,
        stride)
      val f = y % 5
      filterRow(f, raw, prior, c, rowOut)
      filtered(y * (1 + stride)) = f.toByte
      System.arraycopy(rowOut, 0, filtered, y * (1 + stride) + 1, stride)
      System.arraycopy(raw, 0, prior, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater(6)
    deflater.setInput(filtered); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!deflater.finished())
      comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream(comp.size + 64)
    out.write(Sig, 0, 8)
    writeChunk(out, "IHDR", be32(w) ++ be32(h) ++
      Array[Byte](8, ct.toByte, 0, 0, 0))
    writeChunk(out, "IDAT", comp.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG into a GR raster; null for anything malformed. */
  def decode(png: Array[Byte]): Array[Byte] = {
    if (png == null || png.length < 8 + 25) return null
    var i = 0
    while (i < 8) { if (png(i) != Sig(i)) return null; i += 1 }
    var w = 0; var h = 0; var c = -1
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    var done = false
    while (!done) {
      if (p + 12 > png.length) return null
      val len = ((png(p) & 0xff) << 24) | ((png(p + 1) & 0xff) << 16) |
        ((png(p + 2) & 0xff) << 8) | (png(p + 3) & 0xff)
      if (len < 0 || p + 12 + len > png.length) return null
      val typ = new String(png, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(png, p + 4, 4 + len)
      val want = ((png(p + 8 + len) & 0xffL) << 24) |
        ((png(p + 9 + len) & 0xffL) << 16) |
        ((png(p + 10 + len) & 0xffL) << 8) | (png(p + 11 + len) & 0xffL)
      if ((crc.getValue & 0xffffffffL) != want) return null
      typ match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return null
          sawIhdr = true
          val q = p + 8
          w = ((png(q) & 0xff) << 24) | ((png(q + 1) & 0xff) << 16) |
            ((png(q + 2) & 0xff) << 8) | (png(q + 3) & 0xff)
          h = ((png(q + 4) & 0xff) << 24) | ((png(q + 5) & 0xff) << 16) |
            ((png(q + 6) & 0xff) << 8) | (png(q + 7) & 0xff)
          val bitDepth = png(q + 8) & 0xff
          c = channelsOf(png(q + 9) & 0xff)
          val interlace = png(q + 12) & 0xff
          // GR geometry bounds double as a decompression-bomb guard.
          if (bitDepth != 8 || c < 1 || interlace != 0 ||
              w < 1 || h < 1 || w > 0xffff || h > 0xffff) return null
        case "IDAT" =>
          if (!sawIhdr) return null
          idat.write(png, p + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skip (CRC already verified)
      }
      p += 12 + len
    }
    if (!sawIhdr || idat.size == 0) return null
    val stride = w * c
    val expect = h.toLong * (1 + stride)
    if (expect > Int.MaxValue - RasterKernel.HeaderLen) return null
    val stream = new Array[Byte](expect.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < stream.length && !inflater.finished()) {
        val n = inflater.inflate(stream, got, stream.length - got)
        if (n == 0 && inflater.needsInput()) return null // truncated
        got += n
      }
      if (got != stream.length) return null
      // Trailing data beyond the expected scanlines = malformed.
      if (!inflater.finished() &&
          inflater.inflate(new Array[Byte](1)) != 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inflater.end()
    val out = new Array[Byte](RasterKernel.HeaderLen + h * stride)
    RasterKernel.writeHeader(out, c, w, h)
    val prior = new Array[Byte](stride)
    val row = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val f = stream(y * (1 + stride)) & 0xff
      System.arraycopy(stream, y * (1 + stride) + 1, row, 0, stride)
      if (!unfilterRow(f, row, prior, c)) return null
      System.arraycopy(row, 0, out, RasterKernel.HeaderLen + y * stride,
        stride)
      System.arraycopy(row, 0, prior, 0, stride)
      y += 1
    }
    out
  }
}

/** png_encode(binary GR raster) → binary PNG: [[PngKernel.encode]] as
  * a codegen'd scalar (build-side synthesis / export). */
case class PngEncode(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_encode"
  override def nullSafeEval(input: Any): Any =
    PngKernel.encode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.PngKernel.encode($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): PngEncode =
    copy(child = c)
}

/** png_decode(binary PNG) → binary GR raster: [[PngKernel.decode]] as
  * a codegen'd scalar — the wire-format entry into the raster kernel
  * family; malformed bytes null out (dead-letter contract). */
case class PngDecode(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "png_decode"
  override def nullSafeEval(input: Any): Any =
    PngKernel.decode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.PngKernel.decode($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): PngDecode =
    copy(child = c)
}

/** wav_window_stats(binary, winFrames) → array<bigint>:
  * [[WavKernel.windowStats]] as a codegen'd scalar. */
case class WavWindowStats(child: Expression, winFrames: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(winFrames >= 1, s"winFrames must be >= 1, got $winFrames")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // malformed bytes → null
  override def prettyName: String = "wav_window_stats"
  override def nullSafeEval(input: Any): Any =
    WavKernel.windowStats(input.asInstanceOf[Array[Byte]], winFrames)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.WavKernel.windowStats($in, $winFrames);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): WavWindowStats =
    copy(child = c)
}

/** raster_resize(binary, factor) → binary: [[RasterKernel.resize]] as a
  * codegen'd scalar — the decode/transform/re-encode stage of an image
  * pipeline as one tight fused loop per row, no shuffle, no UDF. */
case class RasterResize(child: Expression, factor: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(factor >= 1, s"factor must be >= 1, got $factor")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // malformed bytes → null
  override def prettyName: String = "raster_resize"

  override def nullSafeEval(input: Any): Any =
    RasterKernel.resize(input.asInstanceOf[Array[Byte]], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.RasterKernel.resize($in, $factor);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): RasterResize =
    copy(child = c)
}

/** raster_upsample(binary, factor) → binary: nearest-neighbor
  * upscale ([[RasterKernel.upsample]]) as a codegen'd scalar. */
case class RasterUpsample(child: Expression, factor: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(factor >= 1, s"factor must be >= 1, got $factor")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // malformed bytes → null
  override def prettyName: String = "raster_upsample"
  override def nullSafeEval(input: Any): Any =
    RasterKernel.upsample(input.asInstanceOf[Array[Byte]], factor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.RasterKernel.upsample($in, $factor);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): RasterUpsample =
    copy(child = c)
}

/** raster_gray(binary) → binary: channel-mean grayscale
  * ([[RasterKernel.gray]]) as a codegen'd scalar. */
case class RasterGray(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // malformed bytes → null
  override def prettyName: String = "raster_gray"
  override def nullSafeEval(input: Any): Any =
    RasterKernel.gray(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.RasterKernel.gray($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): RasterGray =
    copy(child = c)
}

/** raster_flip_h(binary) → binary: horizontal mirror
  * ([[RasterKernel.flipH]]) as a codegen'd scalar. */
case class RasterFlipH(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // malformed bytes → null
  override def prettyName: String = "raster_flip_h"
  override def nullSafeEval(input: Any): Any =
    RasterKernel.flipH(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.RasterKernel.flipH($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): RasterFlipH =
    copy(child = c)
}

/** raster_crop(binary, x0, y0, w, h) → binary: region-of-interest
  * extraction ([[RasterKernel.crop]]); null for a window that does
  * not fit. */
case class RasterCrop(child: Expression, x0: Int, y0: Int, w: Int,
    h: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(x0 >= 0 && y0 >= 0 && w >= 1 && h >= 1,
    s"bad crop window ${w}x$h@($x0,$y0)")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // malformed / out-of-bounds → null
  override def prettyName: String = "raster_crop"
  override def nullSafeEval(input: Any): Any =
    RasterKernel.crop(input.asInstanceOf[Array[Byte]], x0, y0, w, h)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.RasterKernel.crop($in, $x0, $y0, $w, $h);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): RasterCrop =
    copy(child = c)
}

/** raster_channel_stats(binary) → array<bigint>: per-channel
  * [sum, min, max] triples, channel-major
  * ([[RasterKernel.channelStats]]). */
case class RasterChannelStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // malformed bytes → null
  override def prettyName: String = "raster_channel_stats"
  override def nullSafeEval(input: Any): Any =
    RasterKernel.channelStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.RasterKernel.channelStats($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): RasterChannelStats =
    copy(child = c)
}

/** raster_histogram(binary, bins) → array<bigint>: per-channel
  * histogram of [[RasterKernel.histogram]] — the feature-extraction
  * stage emitting the (doc, vector) shape that composes with the
  * Similarity operators. */
case class RasterHistogram(child: Expression, bins: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  require(bins >= 1 && bins <= 256, s"bins must be in [1, 256], got $bins")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // malformed bytes → null
  override def prettyName: String = "raster_histogram"

  override def nullSafeEval(input: Any): Any =
    RasterKernel.histogram(input.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.functions.RasterKernel.histogram($in, $bins);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): RasterHistogram =
    copy(child = c)
}

/** Column-level API for the custom expressions. */
object functions {
  // Input typing is enforced here via casts (AbstractDataType /
  // ExpectsInputTypes are sql-private in Spark 4).
  private def ex(c: Column) = GraftColumnBridge.expression(c)
  def gunzip(c: Column): Column =
    GraftColumnBridge.column(Gunzip(ex(c.cast("binary"))))
  /** gunzip that yields null instead of throwing on a corrupt payload —
    * the building block for per-record dead-letter routes (the batch
    * must survive one bad record; cf. reference's try/catch at
    * ingestor/index.js:104-108). */
  def try_gunzip(c: Column): Column =
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.TryEval(
        Gunzip(ex(c.cast("binary")))))
  def gzip(c: Column): Column =
    GraftColumnBridge.column(Gzip(ex(c.cast("binary"))))
  def rolling_fingerprint(c: Column, window: Int): Column =
    GraftColumnBridge.column(RollingFingerprint(ex(c.cast("string")), window))
  def cdc_cuts(c: Column, window: Int, divisor: Int): Column =
    GraftColumnBridge.column(
      CdcCutPositions(ex(c.cast("string")), window, divisor))
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      ex(a.cast("array<double>")), ex(b.cast("array<double>"))))
  def zorder2(a: Column, b: Column, bits: Int = 16): Column =
    GraftColumnBridge.column(ZOrder2(
      ex(a.cast("long")), ex(b.cast("long")), bits))
  def bloom_might_contain(c: Column, filterBytes: Array[Byte]): Column =
    GraftColumnBridge.column(BloomMightContain(ex(c.cast("long")), filterBytes))
  def trigram_entropy(c: Column): Column =
    GraftColumnBridge.column(TrigramEntropy(ex(c.cast("string"))))
  def minhash_sigs(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSigs(ex(c.cast("string")), numHashes))
  def minhash_sigs_v2(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSigsV2(ex(c.cast("string")), numHashes))
  def raster_resize(c: Column, factor: Int): Column =
    GraftColumnBridge.column(RasterResize(ex(c.cast("binary")), factor))
  def raster_histogram(c: Column, bins: Int): Column =
    GraftColumnBridge.column(RasterHistogram(ex(c.cast("binary")), bins))
  def png_encode(c: Column): Column =
    GraftColumnBridge.column(PngEncode(ex(c)))
  def png_decode(c: Column): Column =
    GraftColumnBridge.column(PngDecode(ex(c)))
  def raster_gray(c: Column): Column =
    GraftColumnBridge.column(RasterGray(ex(c.cast("binary"))))
  def raster_flip_h(c: Column): Column =
    GraftColumnBridge.column(RasterFlipH(ex(c.cast("binary"))))
  def raster_crop(c: Column, x0: Int, y0: Int, w: Int, h: Int): Column =
    GraftColumnBridge.column(RasterCrop(ex(c.cast("binary")), x0, y0, w, h))
  def raster_channel_stats(c: Column): Column =
    GraftColumnBridge.column(RasterChannelStats(ex(c.cast("binary"))))
  def raster_upsample(c: Column, factor: Int): Column =
    GraftColumnBridge.column(RasterUpsample(ex(c.cast("binary")), factor))
  def wav_window_stats(c: Column, winFrames: Int): Column =
    GraftColumnBridge.column(WavWindowStats(ex(c.cast("binary")), winFrames))
}
