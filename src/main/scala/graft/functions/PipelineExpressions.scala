package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared rounding discipline for distance/similarity scores that feed
 *  argmin/argmax decisions (PqEncode, PqAdcLut, NearestCentroids).
 *  Half-AWAY-FROM-ZERO at 1e-6 in the scaled-binary domain — the same
 *  convention as C++ `std::round(x*1e6)/1e6` (what the DuckDB oracle's
 *  `round(x, 6)` computes) and Spark's `round()` half-up. The earlier
 *  `math.rint` (half-to-even) diverged from both at exact midpoints —
 *  the q_doc_langid midpoint-divergence class. */
private[graft] object Round6 {
  def apply(x: Double): Double =
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)) / 1e6
}

/**
 * LSH band hashes of a MinHash signature: element b is
 * murmur3(sig[b*r .. b*r+r-1], seed 42) with r = len(sig)/bands —
 * VALUE-IDENTICAL to Spark's `hash(slice(sig, b*r+1, r))` over an
 * `array<int>` (Murmur3Hash chains hashInt over the elements from the
 * 42 seed), so persisted bucket tables built with either formulation
 * keep matching. Exists because the lambda-based
 * `transform(sequence(...), b -> hash(slice(...)))` formulation (a)
 * allocates a slice array per band per row and (b) defeats AQE
 * exchange reuse in the LSH self-join — lambda-variable exprIds keep
 * the two identical banding branches from canonicalizing equal, so
 * the banding scan+shuffle ran TWICE (measured 12 s/pass at 10M docs,
 * the largest single slice of minhash_10m). Whole-stage-codegen via a
 * static helper; one primitive array per row, no boxing.
 */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression {
  require(bands >= 1, "bands must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "band_hashes"

  override def nullSafeEval(v: Any): Any =
    BandHashes.compute(v.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BandHashes.compute($c, $bands)")

  override protected def withNewChildInternal(c: Expression): BandHashes = copy(child = c)
}

object BandHashes {
  /** Chained Murmur3_x86_32.hashInt over each band's slice, seed 42 —
   *  the exact recipe of Spark's Murmur3Hash over an int-array slice. */
  def compute(arr: ArrayData, bands: Int): ArrayData = {
    val n = arr.numElements()
    val r = n / bands
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = 42
      var j = b * r
      val end = j + r
      while (j < end) {
        h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(arr.getInt(j), h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/**
 * Content-stable md5 bucket of a string:
 * `conv(substring(md5(s), 1, 8), 16, 10) % buckets` computed without
 * the hex-string detour — the first 4 digest bytes ARE the first 8
 * hex chars, so the value is (first 4 bytes as unsigned big-endian)
 * mod buckets, bit-identical to the SQL formulation every
 * engine-replayable sampling/split/Gumbel draw is specified by. The
 * SQL path allocated a 32-char hex string plus conv's base parse per
 * call; dsir featurization calls this ~23x per document (11 n-gram
 * features x 2 passes + the Gumbel uniform), where it dominated
 * dsir_1m. Thread-local MessageDigest, no intermediate strings.
 */
case class Md5Bucket(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1 && buckets <= (1 << 30), "buckets out of range")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_bucket needs a string child, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    Md5Bucket.compute(v.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Bucket.compute($c, $buckets)")

  override protected def withNewChildInternal(c: Expression): Md5Bucket = copy(child = c)
}

object Md5Bucket {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  def compute(s: UTF8String, buckets: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    val v = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
      ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
    v % buckets
  }
}

/**
 * Argmax-by-cosine against a CONSTANT centroid matrix: returns the
 * 0-based index of the centroid with the highest round(cosine, 6),
 * lowest index winning ties (callers order the matrix by ascending
 * centroid id, making this identical to the former
 * `max_by(cid, struct(round(cosine, 6), -cid))` aggregation — which
 * forced a SortAggregate over the |corpus| × |centroids| crossJoin
 * because a struct ordering cannot use the hash aggregate's
 * fixed-width buffer; measured as the dominant cost of ivf_topk_10m).
 * Cosine op order is EXACTLY [[CosineSimilarity]]'s (index-order
 * double accumulation, dot/(sqrt·sqrt), 0.0 on zero norm) and the
 * rounding is EXACTLY Spark `round(x, 6)` (BigDecimal.valueOf,
 * HALF_UP), so the selected centroid is bit-identical to the old
 * aggregation's.
 */
case class NearestCentroidIndex(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(cents.nonEmpty, "nearest_centroid_index: empty centroid matrix")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid_index"

  // case-class equality over Array fields is REFERENCE equality, which
  // breaks canonicalization/semanticEquals (two semantically identical
  // instances never compare equal, so common-subexpression elimination
  // and exchange reuse can't see through this node — ADVICE r16).
  // Structural equality over the matrix restores it.
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroidIndex =>
      child == o.child && cents.length == o.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), o.cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + cents.foldLeft(17)((h, r) =>
      31 * h + java.util.Arrays.hashCode(r))

  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"nearest_centroid_index: unsupported element type $other")
    }
  // centroid norms are row-constant: precomputing sqrt(sum sq) yields
  // the same double as computing it per row (deterministic op order)
  @transient private lazy val centNorms: Array[Double] = cents.map { cv =>
    var s = 0.0; var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val lf = childIsFloat
    var nx = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      nx += xi * xi
      i += 1
    }
    val snx = math.sqrt(nx)
    var best = Double.NegativeInfinity
    var bestIdx = -1
    var j = 0
    while (j < cents.length) {
      val cv = cents(j)
      require(cv.length == n, s"vector length mismatch: $n vs ${cv.length}")
      var dot = 0.0
      var d = 0
      while (d < n) {
        val xi = if (lf) x.getFloat(d).toDouble else x.getDouble(d)
        dot += xi * cv(d)
        d += 1
      }
      val c =
        if (nx == 0.0 || centNorms(j) == 0.0) 0.0
        else dot / (snx * centNorms(j))
      // Spark round(c, 6): NaN/Infinity pass through, else
      // BigDecimal.valueOf + HALF_UP — identical to RoundBase
      val cs =
        if (c.isNaN || c.isInfinite) c
        else java.math.BigDecimal.valueOf(c)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // Spark double ordering (max_by): NaN sorts greatest
      val greater =
        if (cs.isNaN) !best.isNaN || bestIdx < 0
        else !best.isNaN && cs > best
      if (bestIdx < 0 || greater) { best = cs; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidIndex =
    copy(child = c)
}

/**
 * SimHash document fingerprint (Charikar 2002, the standard near-dup
 * sketch): 64-bit signature where bit b is the sign of the sum of
 * (+1/-1) votes from each shingle's hash bit b. Hamming distance on
 * the output approximates cosine distance between shingle sets.
 * Shingles are character n-grams (reference-class dedup pipelines use
 * 4-6; default 4).
 */
case class SimHash(child: Expression, shingleSize: Int = 4)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    val n = s.length
    if (n >= shingleSize) {
      var i = 0
      while (i <= n - shingleSize) {
        // 64-bit FNV-1a over the shingle (public-domain hash)
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + shingleSize) {
          h ^= s.charAt(j).toLong
          h *= 0x100000001b3L
          j += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}

/** Cosine similarity between two float/double array columns — the hot
 *  inner loop of embedding similarity search, kept as a tight
 *  primitive-array loop instead of zip_with/aggregate trees. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def checkElemType(e: Expression): Boolean = elemType(e) match {
    case FloatType => true
    case DoubleType => false
    case other => throw new IllegalArgumentException(s"cosine_similarity: unsupported element type $other")
  }
  // element accessors resolved once, not per row — the eval below runs
  // |corpus|x|centroids| times in the IVF assign stage, so it must not
  // allocate (toFloatArray().map would churn two arrays per call)
  @transient private lazy val leftIsFloat = checkElemType(left)
  @transient private lazy val rightIsFloat = checkElemType(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(), s"vector length mismatch: $n vs ${y.numElements()}")
    val lf = leftIsFloat; val rf = rightIsFloat
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/**
 * Word n-gram shingles as strings (lowercased, whitespace-tokenized,
 * joined with single spaces, distinct) — the exact-verify unit for
 * MinHash candidates. Single pass, no regex-lambda trees: Catalyst's
 * projection collapse would otherwise inline an SQL `transform(...)`
 * shingle expression into every consumer and recompute the tokenize
 * per reference (observed 128× blowup in the signature path).
 */
case class StringShingles(child: Expression, n: Int = 3)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_shingles"

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length <= n) out.add(toks.mkString(" "))
    else {
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): StringShingles = copy(child = c)
}

/**
 * MinHash signature in one pass: tokenize → word n-gram shingles →
 * murmur-style hash → k universal-hash minima. Returns
 * array<int>[numHashes] — every minhash value is `(a*h+b) mod (2^31-1)`
 * so it fits 31 bits by construction, and the int layout HALVES the
 * persisted signature cache that dominates LSH dedup memory at corpus
 * scale (the r14 20M-doc session OOM was exactly this cache). The
 * permutation arithmetic itself stays in 64-bit. One tight loop per
 * row (shingles × k multiply-mods), no higher-order-function
 * interpretation.
 *
 * FORMAT BREAK (r15): the output changed from array<long> to
 * array<int>. Band-bucket hashes are computed over the signature
 * array, so buckets persisted from the old format do NOT match
 * freshly computed ones — a silent admit-everything failure for the
 * ingestion gate. Persisted bucket tables therefore carry a
 * `__sig_v` version column and the gate validates it
 * (graft.streaming.Streams.SigFormatVersion / requireSigFormat);
 * rebuild pre-r16 tables with Streams.corpusBuckets.
 */
case class MinHashSignature(child: Expression, numHashes: Int = 128, shingleSize: Int = 3)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  @transient private lazy val (as, bs) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1)),
     Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong))
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingleSize
    val last = math.max(toks.length - n, 0)
    var i = 0
    while (i <= last) {
      // FNV-1a over the shingle's tokens (joined implicitly by \0)
      var h = 0xcbf29ce484222325L
      var j = 0
      val end = math.min(i + n, toks.length)
      while (i + j < end) {
        val t = toks(i + j)
        var c = 0
        while (c < t.length) { h ^= t.charAt(c); h *= 0x100000001b3L; c += 1 }
        h ^= 0; h *= 0x100000001b3L // token separator
        j += 1
      }
      val hv = (h & 0xFFFFFFFFL)
      var k = 0
      while (k < numHashes) {
        val perm = (as(k) * hv + bs(k)) % P
        if (perm < mins(k)) mins(k) = perm
        k += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) { out(k) = (if (mins(k) == Long.MaxValue) 0 else mins(k).toInt); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/**
 * Random-hyperplane LSH signature for cosine similarity (Charikar
 * 2002): bit p of the result is the sign of <vec, r_p> where r_p is a
 * deterministic pseudo-random Rademacher (+1/-1) plane derived from
 * (seed, p, dim index) via splitmix64. Vectors with small cosine
 * distance collide in the leading bits with high probability; used to
 * bucket embeddings for ANN join. Dimension-agnostic (planes are
 * generated per index on the fly — no stored matrix).
 */
case class HyperplaneSignature(child: Expression, numPlanes: Int = 16, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes >= 1 && numPlanes <= 63, "numPlanes must be in [1, 63]")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_signature"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val x: Array[Double] = et match {
      case FloatType => arr.toFloatArray().map(_.toDouble)
      case DoubleType => arr.toDoubleArray()
      case other => throw new IllegalArgumentException(s"hyperplane_signature: unsupported element type $other")
    }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < x.length) {
        // Rademacher +-1 from mixed (seed, plane, dim)
        val r = if ((mix(seed ^ (p.toLong << 32) ^ d.toLong) & 1L) == 0L) 1.0 else -1.0
        dot += r * x(d)
        d += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignature = copy(child = c)
}

/** Rolling Rabin-Karp document fingerprint: min-hash of all k-gram
 *  rolling hashes (winnowing's global-min special case) — a cheap,
 *  deterministic 64-bit content id robust to small shifts. */
case class Fingerprint(child: Expression, k: Int = 8)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_fingerprint"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return 0L
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    var minH = Long.MaxValue
    i = 0
    while (i < n) {
      h = h * B + s.charAt(i)
      if (i >= k) h -= pow * B * s.charAt(i - k)
      if (i >= k - 1) {
        // finalize-mix so min isn't biased by high chars (splitmix64)
        var z = h + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < minH) minH = z
      }
      i += 1
    }
    if (minH == Long.MaxValue) 0L else minH
  }

  override protected def withNewChildInternal(c: Expression): Fingerprint = copy(child = c)
}

/**
 * Fraction of a document's word n-grams taken by the single most
 * frequent n-gram — the Gopher repetition filter family ("fraction of
 * characters in the most common n-gram"; Rae et al. 2021, table A1),
 * over whitespace tokens. Single pass + one hash map per row; the
 * naive SQL formulation is O(tokens²) per document, which does not
 * survive long documents at 100 TB.
 */
case class TopNgramFraction(child: Expression, n: Int = 2)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "top_ngram_fraction: n must be >= 1")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_ngram_fraction"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.toString.trim.toLowerCase.split("\\s+")
    val total = toks.length - n + 1
    if (total <= 0) 0.0
    else {
      val counts = new java.util.HashMap[String, Integer](total * 2)
      var max = 0
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i < total) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val k = sb.toString
        val c = counts.merge(k, 1, (a, b) => a + b)
        if (c > max) max = c
        i += 1
      }
      max.toDouble / total
    }
  }

  override protected def withNewChildInternal(c: Expression): TopNgramFraction =
    copy(child = c)
}

/**
 * Product-quantization encode: split the vector into `m` equal
 * subspaces and emit, per subspace, the index of the nearest codebook
 * centroid by squared L2 (tie → lowest code). The codebook is a
 * driver-collected constant `[subspace][code][dim]` — tiny by
 * construction (k·d doubles), so encoding is pure map-side work; the
 * emitted codes are m small ints ≈ 32-64x smaller than the float
 * vector, which is the whole point at 100 TB corpus scale.
 *
 * Subspace distances round to 1e-6 before the argmin (same discipline
 * as the IVF assign stage) so code assignment is reproducible across
 * engines and summation strategies.
 */
/**
 * Pack the sign bits of the first `nBits` array elements into one long
 * (bit i = element i+1 strictly positive). A compiled primitive loop:
 * the SQL-lambda formulation (`aggregate(sequence...)`) is interpreted
 * AND — when the vector itself is a computed expression — CollapseProject
 * inlines the producer into the fold so every one of the 63 steps
 * re-materializes the whole array (O(n²) per row; measured 100×+ on the
 * hamming bench). This expression evaluates its child ONCE and reads
 * the array positionally. Null elements contribute a 0 bit.
 */
case class SignPack(child: Expression, nBits: Int = 63)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 63, s"sign_pack: nBits in [1,63], got $nBits")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_pack"

  @transient private lazy val getter: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case dt: DecimalType => (a, i) => a.getDecimal(i, dt.precision, dt.scale).toDouble
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType => (a, i) => a.getLong(i).toDouble
      case other => throw new IllegalArgumentException(
        s"sign_pack: unsupported element type $other")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val g = getter
    val n = math.min(nBits, x.numElements())
    var out = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && g(x, i) > 0.0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SignPack = copy(child = c)
}

case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebook.nonEmpty && codebook.head.nonEmpty, "empty PQ codebook")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val m = codebook.length
  @transient private lazy val dsub = codebook.head.head.length
  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    require(x.numElements() == m * dsub,
      s"pq_encode: vector length ${x.numElements()} != m*dsub ${m * dsub}")
    val isF = childIsFloat
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val xi = if (isF) x.getFloat(s * dsub + j).toDouble else x.getDouble(s * dsub + j)
          val diff = xi - cent(j)
          d += diff * diff
          j += 1
        }
        d = Round6(d)
        if (d < bestD) { bestD = d; best = c } // strict < keeps lowest code on ties
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/**
 * ADC lookup table for one query: flat `array<double>` of length m·k
 * where `lut[s*k + c]` = squared L2 between query subvector `s` and
 * codebook centroid `(s, c)`, rounded to 1e-6. A candidate's
 * asymmetric distance is then `sum_s lut[s*k + codes[s]]` — m array
 * reads instead of d float ops, the classic PQ search kernel.
 */
case class PqAdcLut(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebook.nonEmpty && codebook.head.nonEmpty, "empty PQ codebook")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_lut"

  @transient private lazy val m = codebook.length
  @transient private lazy val k = codebook.head.length
  @transient private lazy val dsub = codebook.head.head.length
  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    require(x.numElements() == m * dsub,
      s"pq_adc_lut: vector length ${x.numElements()} != m*dsub ${m * dsub}")
    val isF = childIsFloat
    val lut = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val cents = codebook(s)
      var c = 0
      while (c < k) {
        val cent = cents(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val xi = if (isF) x.getFloat(s * dsub + j).toDouble else x.getDouble(s * dsub + j)
          val diff = xi - cent(j)
          d += diff * diff
          j += 1
        }
        lut(s * k + c) = Round6(d)
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
  }

  override protected def withNewChildInternal(c: Expression): PqAdcLut = copy(child = c)
}

/**
 * Top-`probe` nearest centroids by cosine (rounded to 1e-6, ties →
 * lowest centroid id), as a constant-centroid expression. With the
 * centroid set driver-collected (broadcast-sized by the same contract
 * as the IVF coarse quantizer), list assignment becomes a pure
 * map-side projection: the IVF-PQ index build — (list id, PQ codes)
 * per corpus row — runs in ONE corpus scan with NO shuffle at all.
 * Returns `array<bigint>` of the centroid IDS (not indices), ordered
 * best-first.
 */
case class NearestCentroids(
    child: Expression, centroids: Array[Array[Double]], ids: Array[Long], probe: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty && centroids.length == ids.length, "bad centroid set")
  require(probe >= 1 && probe <= centroids.length, "probe out of range")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val norms =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isF = childIsFloat
    var nx = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
      nx += xi * xi
      i += 1
    }
    val xnorm = math.sqrt(nx)
    // (score, id) candidates; selection by (score desc, id asc)
    val bestIds = new Array[Long](probe)
    val bestSc = new Array[Double](probe)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      require(cent.length == n, s"nearest_centroids: dim ${cent.length} != $n")
      var dot = 0.0
      var j = 0
      while (j < n) {
        val xj = if (isF) x.getFloat(j).toDouble else x.getDouble(j)
        dot += xj * cent(j)
        j += 1
      }
      val raw = if (xnorm == 0.0 || norms(c) == 0.0) 0.0 else dot / (xnorm * norms(c))
      val sc = Round6(raw)
      val id = ids(c)
      // insertion position among current best
      var pos = filled
      while (pos > 0 && (bestSc(pos - 1) < sc || (bestSc(pos - 1) == sc && bestIds(pos - 1) > id))) {
        pos -= 1
      }
      if (pos < probe) {
        val last = math.min(filled, probe - 1)
        var q = last
        while (q > pos) { bestSc(q) = bestSc(q - 1); bestIds(q) = bestIds(q - 1); q -= 1 }
        bestSc(pos) = sc; bestIds(pos) = id
        if (filled < probe) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestIds, filled))
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}

/**
 * Integer-exact k-means E-step: squared-Euclidean argmin of a
 * 1e-6-unit BIGINT vector against a constant centroid matrix; 0-based
 * cluster index, first (lowest) index wins ties. The tight primitive
 * loop replaces the transform/zip_with/aggregate lambda tower (which
 * allocates intermediate ArrayData per centroid per row) — the E-step
 * is the per-row hot path of every Lloyd iteration. Same exactness
 * contract as [[graft.operators.Similarity.kmeansMicro]].
 */
case class KmeansAssignMicro(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "empty centroid table")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmeans_assign_micro"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      require(cent.length == n, s"kmeans_assign_micro: dim ${cent.length} != $n")
      var d = 0L
      var j = 0
      while (j < n) {
        val diff = x.getLong(j) - cent(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): KmeansAssignMicro =
    copy(child = c)
}

/**
 * Unicode NFC normalization (java.text.Normalizer — canonical
 * composition, the form DuckDB's nfc_normalize and UTF-8 text
 * pipelines standardize on). Null-intolerant unary string expression;
 * ASCII input short-circuits (Normalizer.isNormalized is O(n) and
 * almost always true for crawl text).
 */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/**
 * Jaro similarity (Jaro 1989 — the record-linkage comparator): match
 * window floor(max(|a|,|b|)/2)-1, transpositions counted over the
 * matched subsequences, (m/|a| + m/|b| + (m-t)/m)/3. Empty inputs
 * score 0 (the reference engine's convention, not 1). Tight char-array
 * loop — the hot kernel of fuzzy blocking joins.
 */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_similarity"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroKernel.jaro(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSimilarity =
    copy(left = l, right = r)
}

/**
 * Jaro-Winkler similarity (Winkler 1990): the Jaro score boosted by
 * the shared prefix — jw = j + ℓ·p·(1-j) with p = 0.1, prefix ℓ
 * capped at 4, boost applied only when j > 0.7. These are the classic
 * constants and exactly the reference engine's semantics (verified
 * against its jaro_winkler_similarity on the fixture corpus,
 * including the below-threshold and prefix-cap cases).
 */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    val j = JaroKernel.jaro(a, b)
    if (j <= 0.7) j
    else {
      var p = 0
      val cap = math.min(4, math.min(a.length, b.length))
      while (p < cap && a.charAt(p) == b.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimilarity =
    copy(left = l, right = r)
}

private[functions] object JaroKernel {
  def jaro(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var k = lo
      var found = false
      while (!found && k <= hi) {
        if (!bMatched(k) && a.charAt(i) == b.charAt(k)) {
          aMatched(i) = true; bMatched(k) = true; m += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }
}

/**
 * True (unrestricted) Damerau-Levenshtein distance — the
 * Lowrance-Wagner 1975 DP with the alphabet-indexed last-occurrence
 * row, NOT the restricted "optimal string alignment" variant:
 * dl("ca","abc") = 2 here (swap then insert touching the swapped
 * block), 3 under OSA. This matches the reference engine's
 * damerau_levenshtein (probed: ca/abc=2, ab/ba=1, abcdef/bacdfe=2),
 * so the oracle is a genuinely independent implementation.
 */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    val la = a.length; val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2), shifted by 1: d(i+1)(j+1) covers prefixes
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val lpos = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(lpos) + (i - k - 1) + 1 + (j - lpos - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

/** Shared kernel for the Bloom-filter family: the k-th bit position of
 *  a finalized 64-bit window hash, double-hashing (Kirsch-Mitzenmacher
 *  2006) with h1 = low 32 bits, h2 = 2*(high 32) + 1 (odd, so the
 *  probe sequence cycles the full power-of-two table). Both engines
 *  compute the identical sequence: the oracle replicates
 *  `(z % 2^32 + i * (2*(z // 2^32) + 1)) % mBits` on unsigned
 *  HUGEINT, which equals this masked signed-Long form bit-for-bit. */
private[graft] object BloomKernel {
  def positions(z: Long, kHashes: Int, mBits: Int): Array[Int] = {
    val h1 = z & 0xFFFFFFFFL
    val h2 = 2L * (z >>> 32) + 1L
    val mask = (mBits - 1).toLong
    Array.tabulate(kHashes)(i => ((h1 + i * h2) & mask).toInt)
  }
  def requirePow2(mBits: Int): Unit =
    require(mBits >= 64 && Integer.bitCount(mBits) == 1,
      s"mBits must be a power of two >= 64, got $mBits")
}

/**
 * ALL rolling k-char window hashes of a string (the [[Fingerprint]]
 * kernel — Horner base 1000003 mod 2^64, splitmix64 finalize with the
 * golden-ratio add — but emitting every window instead of the min).
 * Feeds the Bloom build/probe sides; one pass per row, no explode on
 * the probe path.
 */
case class WindowHashes(child: Expression, k: Int = 8)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    val out = new Array[Long](math.max(n - k + 1, 0))
    if (out.length == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < n) {
      h = h * B + s.charAt(i)
      if (i >= k) h -= pow * B * s.charAt(i - k)
      if (i >= k - 1) {
        var z = h + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        out(i - k + 1) = z
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WindowHashes = copy(child = c)
}

/**
 * Bloom-filter bitset aggregate: ORs the k bit positions of each input
 * 64-bit hash into an mBits-wide byte array (bit p lives at byte
 * p >>> 3, bit p & 7 — the natural little-endian layout, so the
 * serialized buffer IS the probe-side operand). Map-side combine falls
 * out of TypedImperativeAggregate: each task ORs locally and ships one
 * mBits/8-byte buffer, so the exchange is O(partitions × mBits/8)
 * regardless of input row count — the whole point of the Bloom path
 * over a hash-set join at 100 TB.
 */
case class BloomBitsAgg(
    child: Expression, mBits: Int, kHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Byte]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  BloomKernel.requirePow2(mBits)
  require(kHashes >= 1 && kHashes <= 32, s"kHashes in [1,32], got $kHashes")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits >>> 3)

  override def update(buf: Array[Byte],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val ps = BloomKernel.positions(v.asInstanceOf[Long], kHashes, mBits)
      var i = 0
      while (i < ps.length) {
        val p = ps(i)
        buf(p >>> 3) = (buf(p >>> 3) | (1 << (p & 7))).toByte
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): BloomBitsAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomBitsAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomBitsAgg = copy(child = c)
  override def prettyName: String = "bloom_bits_agg"
}

/**
 * Count of hashes (array<long>) whose kHashes Bloom positions are ALL
 * set in the bitset (binary, broadcast as a literal on the probe side).
 * mBits is derived from the bitset length, so build and probe cannot
 * disagree on table size.
 */
case class BloomHits(left: Expression, right: Expression, kHashes: Int = 5)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_hits"

  override def nullSafeEval(bl: Any, hs: Any): Any = {
    val bits = bl.asInstanceOf[Array[Byte]]
    val mBits = bits.length << 3
    BloomKernel.requirePow2(mBits)
    val arr = hs.asInstanceOf[ArrayData]
    var hits = 0
    var i = 0
    while (i < arr.numElements()) {
      val ps = BloomKernel.positions(arr.getLong(i), kHashes, mBits)
      var all = true
      var j = 0
      while (all && j < ps.length) {
        val p = ps(j)
        if ((bits(p >>> 3) & (1 << (p & 7))) == 0) all = false
        j += 1
      }
      if (all) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomHits =
    copy(left = l, right = r)
}

/**
 * Unicode normalization (UAX #15) via `java.text.Normalizer` — the
 * encoding-cleanup pass every multilingual training corpus needs
 * before dedup/shingling (the same logical text arrives composed from
 * one crawl and decomposed from another; fingerprints diverge unless
 * normalized first). The oracle engine's `nfc_normalize` is
 * ICU-backed — a genuinely independent implementation of the same
 * published algorithm, so the gate row is a cross-implementation
 * certification (the jaro_winkler recipe).
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form.toUpperCase),
    s"unicode_normalize: unknown form '$form'")
  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form.toUpperCase)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"unicode_normalize_${form.toLowerCase}"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      java.text.Normalizer.normalize(v.asInstanceOf[UTF8String].toString, nf))

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

/**
 * Accent stripping: NFD decomposition, then every combining mark
 * (Unicode category Mn) drops — matches the oracle engine's ICU
 * `strip_accents` on its documented domain (é→e; non-accent ligatures
 * like œ are NOT decomposed — that is NFKC's job).
 */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(v: Any): Any = {
    val d = java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}

/**
 * HTML → text extraction (the first pass of every crawl pipeline):
 * a single-pass state machine — NOT a regex pile — that drops
 * script/style/comment content, turns block-level closes and `<br>`
 * into newlines, strips remaining tags (correctly skipping `>` inside
 * quoted attribute values, where regex strippers tear), decodes the
 * common named entities plus decimal/hex numeric references, and
 * collapses runs of spaces and blank lines. Entity decode happens
 * AFTER tag stripping, so text like `&lt;div&gt;` stays literal text.
 */
case class HtmlToText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_to_text"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(HtmlToText.extract(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): HtmlToText =
    copy(child = c)
}

object HtmlToText {
  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“")

  private val BlockTags = Set("p", "div", "li", "ul", "ol", "table", "tr",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "blockquote", "pre")

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2)
    var i = 0
    var skipUntil: String = null // "</script" / "</style" when inside one
    def lowerRegion(start: Int, len: Int): String =
      html.substring(start, math.min(n, start + len)).toLowerCase
    while (i < n) {
      val c = html.charAt(i)
      if (skipUntil != null) {
        if (c == '<' && lowerRegion(i, skipUntil.length) == skipUntil) {
          // consume through the closing '>'
          var j = i + skipUntil.length
          while (j < n && html.charAt(j) != '>') j += 1
          i = j + 1
          skipUntil = null
        } else i += 1
      } else if (c == '<') {
        if (lowerRegion(i, 4) == "<!--") {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // parse the tag name; attribute values may hold '>' in quotes
          var j = i + 1
          val close = j < n && html.charAt(j) == '/'
          if (close) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          var q: Char = 0
          while (j < n && (q != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            if (q != 0) { if (ch == q) q = 0 }
            else if (ch == '"' || ch == '\'') q = ch
            j += 1
          }
          i = j + 1
          if (!close && name == "script") skipUntil = "</script"
          else if (!close && name == "style") skipUntil = "</style"
          else if (name == "br" || (close && BlockTags(name))) out.append('\n')
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val decoded =
          if (semi < 0 || semi - i > 12) null
          else {
            val body = html.substring(i + 1, semi)
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            else Named.get(body)
          } match { case Some(s) => s; case _ => null }
        if (decoded != null) { out.append(decoded); i = semi + 1 }
        else { out.append('&'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    // collapse horizontal runs, trim line edges, cap blank-line runs
    out.toString
      .replaceAll("[ \\t\\x0B\\f\\r]+", " ")
      .replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n{3,}", "\n\n")
      .trim
  }
}

/**
 * URL canonicalization — the dedup key a crawl pipeline groups on
 * (the same page arrives as `HTTP://Site.com:80/a//b/?utm_source=x&id=2#frag`
 * and `http://site.com/a/b?id=2`): lowercase scheme and host, drop
 * userinfo / default ports (http:80, https:443) / the fragment,
 * collapse duplicate slashes and the trailing slash (root keeps `/`,
 * an empty path becomes `/`), drop tracking parameters
 * (utm_*, fbclid, gclid, msclkid, igshid — only UNAMBIGUOUS trackers;
 * bare `ref` is deliberately KEPT because it is commonly functional,
 * e.g. github.com/...?ref=branch, and dropping it would collapse
 * distinct pages into one dedup key) and SORT the rest so
 * parameter order stops mattering. Unparseable input returns trimmed
 * as-is — a dedup key must never throw. Every step is deliberately
 * SQL-replicable, so the oracle certifies the whole pipeline.
 */
case class UrlNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_normalize"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlNormalize.canonical(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): UrlNormalize =
    copy(child = c)
}

object UrlNormalize {
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$".r

  private def tracking(param: String): Boolean = {
    val k = param.takeWhile(_ != '=').toLowerCase
    k.startsWith("utm_") ||
      k == "fbclid" || k == "gclid" || k == "msclkid" || k == "igshid"
  }

  def canonical(raw: String): String = {
    val s = raw.trim
    s match {
      case UrlRe(scheme0, auth0, path0, query0) =>
        val scheme = scheme0.toLowerCase
        // drop userinfo, lowercase host, strip the scheme-default port
        val hostPort = auth0.substring(auth0.indexOf('@') + 1).toLowerCase
        val host =
          if (scheme == "http" && hostPort.endsWith(":80")) hostPort.dropRight(3)
          else if (scheme == "https" && hostPort.endsWith(":443")) hostPort.dropRight(4)
          else hostPort
        var path = path0.replaceAll("/{2,}", "/")
        if (path.isEmpty) path = "/"
        if (path.length > 1 && path.endsWith("/")) path = path.dropRight(1)
        val params = Option(query0).map(_.split("&", -1).toSeq).getOrElse(Seq.empty)
          .filter(p => p.nonEmpty && !tracking(p)).sorted
        scheme + "://" + host + path +
          (if (params.isEmpty) "" else "?" + params.mkString("&"))
      case _ => s // not a URL shape: pass through trimmed
    }
  }
}
