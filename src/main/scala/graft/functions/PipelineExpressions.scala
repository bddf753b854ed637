package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

  private def values(a: ArrayData, et: DataType): Array[Double] = et match {
    case FloatType => a.toFloatArray().map(_.toDouble)
    case DoubleType => a.toDoubleArray()
    case other => throw new IllegalArgumentException(s"cosine_similarity: unsupported element type $other")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = values(l.asInstanceOf[ArrayData], elemType(left))
    val y = values(r.asInstanceOf[ArrayData], elemType(right))
    require(x.length == y.length, s"vector length mismatch: ${x.length} vs ${y.length}")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i)
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
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
