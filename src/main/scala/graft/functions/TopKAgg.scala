package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k state: (score, id) pairs kept sorted by
 * (score desc, id asc), capacity k. Insertion is binary search +
 * arraycopy — k is small (top-k results), so the shift is cheap and
 * the layout stays primitive (no boxing on the hot update path).
 */
final class TopKBuffer(val k: Int) extends Serializable {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  def insert(s: Double, id: Long): Unit = {
    if (size == k) {
      val ws = scores(k - 1); val wi = ids(k - 1)
      if (s < ws || (s == ws && id >= wi)) return
      size -= 1
    }
    var lo = 0; var hi = size
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (scores(m) > s || (scores(m) == s && ids(m) < id)) lo = m + 1 else hi = m
    }
    System.arraycopy(scores, lo, scores, lo + 1, size - lo)
    System.arraycopy(ids, lo, ids, lo + 1, size - lo)
    scores(lo) = s; ids(lo) = id; size += 1
  }
}

/**
 * topk_by_score(score, id, k) — bounded top-k aggregate returning
 * `array<struct<id bigint, score double>>` ranked by (score desc,
 * id asc). The distributed-scale alternative to
 * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`:
 * the window plan shuffles and sorts EVERY candidate row, while this
 * aggregate partial-aggregates map-side, so only ≤ k rows per group
 * per partition reach the exchange. At 100 TB candidate sets the
 * window's full-candidate shuffle is the bottleneck; this is O(k)
 * state per group. Reference behavior: the top-k ordering semantics
 * match duckdb's ORDER BY ... LIMIT k per group with deterministic
 * (score, id) tie-breaks.
 */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, "topk_by_score: k must be positive")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) { out(i) = InternalRow(buf.ids(i), buf.scores(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1
    }
    buf.size = n
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: id must be BIGINT, got ${id.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByScore =
    copy(score = l, id = r)
  override def prettyName: String = "topk_by_score"
}
