package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/**
 * Generic scalar ST_* expression. One case class dispatches by function
 * name into [[GeoOps.ops]] — this keeps the ~70 function families
 * (reference: spatial/include/spatial/core/functions/scalar.hpp:11-66
 * and spatial/include/spatial/geos/functions/scalar.hpp:11-44) to a
 * small number of Expression classes. JTS work dominates per-row cost,
 * so map-dispatch overhead is noise; hot pure-math paths (hilbert,
 * point accessors) are also exposed as built-in column compositions in
 * [[graft.GeoFunctions]] so they stay inside whole-stage codegen.
 */
case class GeoScalar(name: String, children: Seq[Expression])
    extends Expression with CodegenFallback {

  @transient private lazy val op: GeoOps.Op = GeoOps.ops(name)

  override def dataType: DataType = op.out
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = name

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val args = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      args(i) = v
      i += 1
    }
    try op.fn(args)
    catch {
      case _: ArrayIndexOutOfBoundsException | _: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"$name: wrong number of arguments ($n)")
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

/**
 * Whole-stage-codegen Hilbert index over raw coordinates: unlike the
 * JTS-backed ops, this is pure arithmetic, so `doGenCode` emits a
 * static call and the expression stays inside the generated loop
 * (keystone of clustered writes — SURVEY §2.1 st_hilbert row).
 */
case class HilbertEncode(
    x: Expression, y: Expression,
    minX: Double, minY: Double, maxX: Double, maxY: Double)
    extends BinaryExpression {
  override def left: Expression = x
  override def right: Expression = y
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_hilbert"

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertCurve.encode(xv.asInstanceOf[Double], yv.asInstanceOf[Double], minX, minY, maxX, maxY)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (xe, ye) =>
      s"${ev.value} = graft.functions.HilbertCurve.encode($xe, $ye, ${minX}D, ${minY}D, ${maxX}D, ${maxY}D);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertEncode =
    copy(x = l, y = r)
}

/**
 * Binary GEOMETRY predicate with a one-slot prepared-geometry cache.
 * Mirrors the reference's prepared-geometry constant fast path
 * (geos/geos_executor.hpp:22-70: prepare once when one side is a
 * constant vector). The cache keys on reference identity of the WKB
 * byte array — a Catalyst Literal returns the same array instance each
 * eval, so constant filters hit; streaming values miss harmlessly.
 */
case class GeoPredicate(name: String, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = name

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedPrep: PreparedGeometry = _

  private def prepared(bytes: Array[Byte]): PreparedGeometry = {
    if (!(bytes eq cachedRef)) {
      cachedPrep = PreparedGeometryFactory.prepare(Jts.read(bytes))
      cachedRef = bytes
    }
    cachedPrep
  }

  // zero-allocation fast path for the hottest shape: a plain 2-D point
  // WKB (21 bytes, type 1) probed against the prepared side — decode
  // x/y straight from the bytes into a per-thread scratch Point
  // instead of running the full WKBReader per row
  @transient private lazy val scratch = new ThreadLocal[org.locationtech.jts.geom.Point] {
    override def initialValue(): org.locationtech.jts.geom.Point =
      Jts.gf.createPoint(new org.locationtech.jts.geom.Coordinate(0, 0))
  }

  private def asPoint(b: Array[Byte]): org.locationtech.jts.geom.Point = {
    if (b.length != 21) return null
    val le = b(0) == 1
    val t = if (le)
      (b(1) & 0xFF) | ((b(2) & 0xFF) << 8) | ((b(3) & 0xFF) << 16) | ((b(4) & 0xFF) << 24)
    else
      (b(4) & 0xFF) | ((b(3) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) | ((b(1) & 0xFF) << 24)
    if (t != 1) return null
    val bb = java.nio.ByteBuffer.wrap(b, 5, 16)
      .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    val p = scratch.get()
    val c = p.getCoordinate
    c.x = bb.getDouble; c.y = bb.getDouble
    p.geometryChanged()
    p
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lb = l.asInstanceOf[Array[Byte]]
    val rb = r.asInstanceOf[Array[Byte]]
    // Prepare the right side (constant in `geom PRED lit` filters); for
    // prepared ops JTS only accelerates ops anchored on the prepared geom.
    def left: org.locationtech.jts.geom.Geometry = {
      val p = asPoint(lb); if (p != null) p else Jts.read(lb)
    }
    name match {
      case "st_intersects" => prepared(rb).intersects(left)
      case "st_contains" => Jts.read(lb).contains(Jts.read(rb))
      case "st_containsproperly" =>
        PreparedGeometryFactory.prepare(Jts.read(lb)).containsProperly(Jts.read(rb))
      case "st_within" => prepared(rb).contains(left)
      case "st_covers" => Jts.read(lb).covers(Jts.read(rb))
      case "st_coveredby" => prepared(rb).covers(left)
      case "st_crosses" => Jts.read(lb).crosses(Jts.read(rb))
      case "st_disjoint" => prepared(rb).disjoint(left)
      case "st_equals" => Jts.read(lb).equalsTopo(Jts.read(rb))
      case "st_overlaps" => Jts.read(lb).overlaps(Jts.read(rb))
      case "st_touches" => prepared(rb).touches(left)
      case "st_intersects_extent" =>
        // bbox-only test (reference st_intersects_extent.cpp:17-31)
        Jts.read(lb).getEnvelopeInternal.intersects(Jts.read(rb).getEnvelopeInternal)
      case other => sys.error(s"unknown predicate $other")
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
