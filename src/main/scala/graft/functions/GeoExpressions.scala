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

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lb = l.asInstanceOf[Array[Byte]]
    val rb = r.asInstanceOf[Array[Byte]]
    // Prepare the right side (constant in `geom PRED lit` filters); for
    // prepared ops JTS only accelerates ops anchored on the prepared geom.
    name match {
      case "st_intersects" => prepared(rb).intersects(Jts.read(lb))
      case "st_contains" => Jts.read(lb).contains(Jts.read(rb))
      case "st_containsproperly" =>
        PreparedGeometryFactory.prepare(Jts.read(lb)).containsProperly(Jts.read(rb))
      case "st_within" => prepared(rb).contains(Jts.read(lb))
      case "st_covers" => Jts.read(lb).covers(Jts.read(rb))
      case "st_coveredby" => prepared(rb).covers(Jts.read(lb))
      case "st_crosses" => Jts.read(lb).crosses(Jts.read(rb))
      case "st_disjoint" => prepared(rb).disjoint(Jts.read(lb))
      case "st_equals" => Jts.read(lb).equalsTopo(Jts.read(rb))
      case "st_overlaps" => Jts.read(lb).overlaps(Jts.read(rb))
      case "st_touches" => prepared(rb).touches(Jts.read(lb))
      case "st_intersects_extent" =>
        // bbox-only test (reference st_intersects_extent.cpp:17-31)
        Jts.read(lb).getEnvelopeInternal.intersects(Jts.read(rb).getEnvelopeInternal)
      case other => sys.error(s"unknown predicate $other")
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
