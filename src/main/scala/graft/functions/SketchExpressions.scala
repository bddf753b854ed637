package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-min sketch kernel shared by build and probe: row j's cell for
 * item s is `uint32(md5("<j>:<s>")[0..3]) % width` — the same
 * salted-md5 discipline as [[graft.operators.Sampling]] (engine-
 * portable: the oracle recomputes `('0x' || substring(md5(j || ':' ||
 * w), 1, 8))::BIGINT % width` and gets the identical cell).
 */
private[graft] object CmsKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def pos(j: Int, item: String, width: Int): Int = {
    val d = md.get()
    d.reset()
    val h = d.digest((j.toString + ":" + item).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u32 = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) | ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
    (u32 % width).toInt
  }
  def toBytes(cells: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cells.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(cells)
    bb.array()
  }
  def cellAt(bytes: Array[Byte], idx: Int): Long =
    java.nio.ByteBuffer.wrap(bytes, idx * 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
}

/**
 * Count-min sketch aggregate (Cormode & Muthukrishnan 2005): a
 * depth × width matrix of counters; each input item increments one
 * cell per row. Point-frequency estimates (via [[CountMinEstimate]])
 * are min over rows — never under, over only on hash collisions.
 *
 * Scale shape: the state is FIXED-size (depth·width·8 bytes — 32 KB at
 * the 4×1024 default) regardless of input cardinality; map-side
 * combine ships one matrix per task and merge is elementwise add, so
 * heavy-hitter accounting over 100 TB costs one narrow pass + an
 * O(partitions × 32 KB) exchange instead of a full distinct-key
 * shuffle.
 */
case class CountMinAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
  require(width >= 2 && width <= (1 << 24), s"width in [2,2^24], got $width")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < depth) { buf(j * width + CmsKernel.pos(j, s, width)) += 1L; j += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsKernel.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = CmsKernel.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CountMinAgg = copy(child = c)
  override def prettyName: String = "count_min_agg"
}

/** Point-frequency estimate from a [[CountMinAgg]] sketch (binary,
 *  broadcast as a literal): min over the depth rows of the item's
 *  cell. depth/width must match the build side; width is checked
 *  against the buffer length. */
case class CountMinEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_min_estimate"

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    require(bytes.length == depth * width * 8,
      s"sketch size ${bytes.length} != depth*width*8 = ${depth * width * 8}")
    val s = item.asInstanceOf[UTF8String].toString
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = CmsKernel.cellAt(bytes, j * width + CmsKernel.pos(j, s, width))
      if (c < best) best = c
      j += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
    copy(left = l, right = r)
}

/**
 * Aho-Corasick multi-pattern occurrence counts (Aho & Corasick 1975):
 * ONE left-to-right pass over the text reports every occurrence of
 * every pattern — overlapping and nested included — via trie + failure
 * + output links. Returns an array of per-pattern counts aligned to
 * the pattern-array index.
 *
 * Scale shape: the automaton is built once per executor from the
 * foldable pattern array (a broadcast lexicon: blocklists/toxicity
 * lexicons are KBs-to-MBs, model-sized) and cached; the 100 TB text
 * side is a pure narrow map costing O(chars + matches) regardless of
 * pattern count — vs P separate contains()/regexp scans.
 */
case class MultiPatternCounts(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_pattern_counts"

  @transient private lazy val automaton: AhoCorasick = {
    // checked lazily: at construction the tree may still be unresolved
    // (Column-built arrays resolve during analysis)
    require(right.foldable, "multi_pattern_counts: the pattern array must be foldable")
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val pats = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    require(pats.nonEmpty && pats.forall(_.nonEmpty), "patterns must be non-empty strings")
    AhoCorasick.build(pats)
  }

  override def nullSafeEval(t: Any, ps: Any): Any = {
    val counts = automaton.countAll(t.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MultiPatternCounts =
    copy(left = l, right = r)
}

/** Classic Aho-Corasick automaton over UTF-16 code units: dense child
 *  maps (HashMap per node — lexicons are small), BFS failure links,
 *  output lists collapsed onto each node (every pattern ending at or
 *  failing into the node), per-pattern occurrence counting. */
private[graft] final class AhoCorasick(
    next: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val numPatterns: Int) extends Serializable {

  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](numPatterns)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      var step = next(s).get(c)
      while (step == null && s != 0) { s = fail(s); step = next(s).get(c) }
      state = if (step == null) 0 else step.intValue()
      val o = out(state)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

private[graft] object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    val next = scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        var t = next(s).get(c)
        if (t == null) {
          next += new java.util.HashMap[Character, Integer]()
          ends += Nil
          t = next.length - 1
          next(s).put(c, t)
        }
        s = t.intValue()
      }
      ends(s) = pi :: ends(s)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val outB = Array.fill(n)(List.empty[Int])
    (0 until n).foreach(i => outB(i) = ends(i))
    val queue = new java.util.ArrayDeque[Integer]()
    next(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outB(u) = outB(u) ++ outB(fail(u))
      next(u).forEach { (c, v) =>
        var f = fail(u)
        var t = next(f).get(c)
        while (t == null && f != 0) { f = fail(f); t = next(f).get(c) }
        fail(v) = if (t == null || t.intValue() == v.intValue()) 0 else t.intValue()
        queue.add(v)
      }
    }
    new AhoCorasick(next.toArray, fail, outB.map(_.toArray).toArray, patterns.length)
  }
}

/**
 * K-minimum-values (KMV / bottom-k theta sketch) aggregate
 * (Bar-Yossef et al. 2002; Beyer et al. 2007): keep the k smallest
 * DISTINCT hash values seen; the cardinality estimate is
 * (k-1) · H / h_(k) where h_(k) is the k-th smallest and H the hash
 * range. Complements [[graft.operators.Sketches.hllAccounting]]: KMV
 * additionally supports set operations (intersection/union estimates
 * from merged bottom-k sets) and its state is the actual hash sample.
 *
 * The child is a pre-hashed LongType column (the engine-portable
 * md5-prefix discipline lives in [[graft.operators.Sketches.kmvHash]]
 * so the oracle can recompute identical values); this aggregate is
 * pure order-statistics over longs.
 *
 * Scale shape: state is a bounded sorted set of ≤ k longs (8·k bytes —
 * model-sized), map-side combined, so the exchange is ≤ k values per
 * task regardless of input size; merge is a bounded set union. The
 * dedup that a naive DISTINCT would pay a full key shuffle for happens
 * inside the bounded buffer.
 */
case class KmvAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k >= 2 && k <= (1 << 20), s"k in [2,2^20], got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last() && !buf.contains(v)) { buf.add(v); buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    ArrayData.toArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): KmvAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KmvAgg = copy(child = c)
  override def prettyName: String = "kmv_agg"
}
