package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/**
 * ST_Extent_Agg — bounding box of all input geometries, returned as an
 * envelope polygon. Reference: core/functions/aggregate/st_extent_agg.cpp
 * (state = {is_set, 4 doubles}; combine = min/max merge). Partial
 * aggregation (map-side combine) falls out of TypedImperativeAggregate.
 */
case class StExtentAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] =
    Array(Double.PositiveInfinity, Double.PositiveInfinity, Double.NegativeInfinity, Double.NegativeInfinity)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val env = Jts.read(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal
      if (!env.isNull) {
        buf(0) = math.min(buf(0), env.getMinX); buf(1) = math.min(buf(1), env.getMinY)
        buf(2) = math.max(buf(2), env.getMaxX); buf(3) = math.max(buf(3), env.getMaxY)
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    buf(0) = math.min(buf(0), other(0)); buf(1) = math.min(buf(1), other(1))
    buf(2) = math.max(buf(2), other(2)); buf(3) = math.max(buf(3), other(3))
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(0) > buf(2)) null else Jts.write(Jts.envelope(buf(0), buf(1), buf(2), buf(3)))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getDouble)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(n: Int): StExtentAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StExtentAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): StExtentAgg = copy(child = c)
  override def prettyName: String = "st_extent_agg"
}

/**
 * ST_Union_Agg — geometric union of all inputs. Reference:
 * geos/functions/aggregate.cpp:106-172 (pairwise GEOSUnion per row).
 * We instead batch into a buffer and collapse via JTS UnaryUnionOp
 * (cascaded union) every `CollapseAt` geometries — asymptotically much
 * faster than pairwise union and memory-bounded for 100 TB-scale
 * groups.
 */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Geometry]] with UnaryLike[Expression] {

  private val CollapseAt = 512

  override def createAggregationBuffer(): ArrayBuffer[Geometry] = ArrayBuffer.empty

  private def collapse(buf: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    if (buf.length >= CollapseAt) {
      val u = UnaryUnionOp.union(buf.asJavaCollection)
      buf.clear()
      buf += u
    }
    buf
  }

  override def update(buf: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
    val v = child.eval(input)
    if (v != null) { buf += Jts.read(v.asInstanceOf[Array[Byte]]); collapse(buf) } else buf
  }

  override def merge(buf: ArrayBuffer[Geometry], other: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    buf ++= other
    collapse(buf)
  }

  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null else Jts.write(UnaryUnionOp.union(buf.asJavaCollection))

  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] =
    Jts.write(Jts.gf.createGeometryCollection(buf.toArray))
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = {
    val g = Jts.read(bytes)
    ArrayBuffer.from((0 until g.getNumGeometries).map(g.getGeometryN))
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(n: Int): StUnionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StUnionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): StUnionAgg = copy(child = c)
  override def prettyName: String = "st_union_agg"
}

/**
 * ST_Intersection_Agg — running pairwise intersection (associative, so
 * the state is a single geometry). Reference: geos/functions/
 * aggregate.cpp:34-100.
 */
case class StIntersectionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Geometry]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): ArrayBuffer[Geometry] = ArrayBuffer.empty

  private def add(buf: ArrayBuffer[Geometry], g: Geometry): ArrayBuffer[Geometry] = {
    if (buf.isEmpty) buf += g
    else buf(0) = buf(0).intersection(g)
    buf
  }

  override def update(buf: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
    val v = child.eval(input)
    if (v != null) add(buf, Jts.read(v.asInstanceOf[Array[Byte]])) else buf
  }

  override def merge(buf: ArrayBuffer[Geometry], other: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] =
    if (other.isEmpty) buf else add(buf, other(0))

  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null else Jts.write(buf(0))

  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] =
    Jts.write(Jts.gf.createGeometryCollection(buf.toArray))
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Geometry] = {
    val g = Jts.read(bytes)
    ArrayBuffer.from((0 until g.getNumGeometries).map(g.getGeometryN))
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(n: Int): StIntersectionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StIntersectionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): StIntersectionAgg = copy(child = c)
  override def prettyName: String = "st_intersection_agg"
}
