package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Envelope of a WKB value computed by walking the byte stream
 * directly — no JTS geometry materialization (the generic
 * [[GeoScalar]] tier parses the full coordinate arrays just to take
 * min/max). These are the hottest scalar kernels in the engine: the
 * grid spatial join's bbox residual and every `st_xmin`-family filter
 * evaluate them per row (reference keeps the same ops columnar,
 * core/functions/scalar/st_extent.cpp). [[WkbBound]]/[[WkbExtent]]
 * are compiled expressions (`doGenCode`) so the whole filter stays in
 * whole-stage codegen; [[graft.plans.NativeDispatchRule]] rewrites
 * the named [[GeoScalar]]s over BinaryType inputs to them.
 *
 * Dialect coverage: both byte orders, ISO type codes
 * (base + 1000·Z + 2000·M + 3000·ZM) and EWKB flag bits (0x80000000
 * Z, 0x40000000 M, 0x20000000 embedded SRID), nested collections.
 * NaN coordinates (the empty-POINT encoding) are skipped, so an empty
 * geometry yields NULL — exactly the generic tier's
 * `isEmpty → null` contract.
 */
object WkbEnvelope {

  /** (xmin, ymin, xmax, ymax), or null for an empty geometry. */
  def compute(b: Array[Byte]): Array[Double] = {
    val acc = Array(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)
    walk(b, 0, acc)
    if (acc(0) > acc(2)) null else acc
  }

  /** One envelope bound (kind: 0 xmin, 1 ymin, 2 xmax, 3 ymax), boxed
   *  so codegen can represent the empty-geometry NULL. */
  def bound(b: Array[Byte], kind: Int): java.lang.Double = {
    val e = compute(b)
    if (e == null) null else java.lang.Double.valueOf(e(kind))
  }

  /** BOX_2D struct row (GeoOps.boxType layout), or null when empty. */
  def extentRow(b: Array[Byte]): InternalRow = {
    val e = compute(b)
    if (e == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](e(0), e(1), e(2), e(3)))
  }

  private def readInt(b: Array[Byte], p: Int, le: Boolean): Int =
    if (le) (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
    else (b(p + 3) & 0xFF) | ((b(p + 2) & 0xFF) << 8) |
      ((b(p + 1) & 0xFF) << 16) | ((b(p) & 0xFF) << 24)

  private def readDouble(b: Array[Byte], p: Int, le: Boolean): Double = {
    var bits = 0L
    var i = 0
    if (le) while (i < 8) { bits |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
    else while (i < 8) { bits |= (b(p + i) & 0xFFL) << (8 * (7 - i)); i += 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Walk one geometry starting at `p0`; returns the offset after it. */
  private def walk(b: Array[Byte], p0: Int, acc: Array[Double]): Int = {
    var p = p0
    require(p + 5 <= b.length, s"WKB truncated at byte $p")
    val order = b(p) & 0xFF
    require(order == 0 || order == 1, s"WKB: bad byte order $order at $p")
    val le = order == 1
    p += 1
    var t = readInt(b, p, le); p += 4
    var hasZ = (t & 0x80000000) != 0
    var hasM = (t & 0x40000000) != 0
    if ((t & 0x20000000) != 0) p += 4 // EWKB embedded SRID
    t &= 0x0FFFFFFF
    val dim = t / 1000
    if (dim == 1 || dim == 3) hasZ = true
    if (dim == 2 || dim == 3) hasM = true
    val base = t % 1000
    val stride = 8 * (2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0))
    def coords(n: Int): Unit = {
      require(p + n.toLong * stride <= b.length, s"WKB truncated at byte $p")
      var i = 0
      while (i < n) {
        val x = readDouble(b, p, le)
        val y = readDouble(b, p + 8, le)
        // NaN = the empty-POINT encoding; an empty geometry must not
        // poison the envelope
        if (x == x && y == y) {
          if (x < acc(0)) acc(0) = x
          if (y < acc(1)) acc(1) = y
          if (x > acc(2)) acc(2) = x
          if (y > acc(3)) acc(3) = y
        }
        p += stride
        i += 1
      }
    }
    base match {
      case 1 => coords(1)
      case 2 =>
        val n = readInt(b, p, le); p += 4
        coords(n)
      case 3 =>
        val nRings = { val n = readInt(b, p, le); p += 4; n }
        var r = 0
        while (r < nRings) {
          val n = readInt(b, p, le); p += 4
          coords(n)
          r += 1
        }
      case 4 | 5 | 6 | 7 =>
        val n = { val v = readInt(b, p, le); p += 4; v }
        var i = 0
        while (i < n) { p = walk(b, p, acc); i += 1 }
      case other => throw new IllegalArgumentException(
        s"WKB: unsupported geometry type code $other")
    }
    p
  }
}

/** `st_xmin`/`st_ymin`/`st_xmax`/`st_ymax` over WKB — compiled, no JTS. */
case class WkbBound(child: Expression, kind: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even over a non-null child (empty geometries have no
  // bound). Without this override the expression inherits the child's
  // non-nullability, codegen folds ev.isNull into an unassignable
  // form, and the `isNull = true` below makes Janino REJECT the
  // generated class ("not an rvalue") — Spark then silently runs the
  // whole stage interpreted (observed on every clustered-write bench
  // row, r16).
  override def nullable: Boolean = true
  override def prettyName: String =
    Seq("st_xmin", "st_ymin", "st_xmax", "st_ymax")(kind)

  override protected def nullSafeEval(v: Any): Any =
    WkbEnvelope.bound(v.asInstanceOf[Array[Byte]], kind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("bound")
      s"""
         |java.lang.Double $r = graft.functions.WkbEnvelope.bound($c, $kind);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WkbBound = copy(child = c)
}

/** `st_extent` over WKB — compiled BOX_2D struct, no JTS. */
case class WkbExtent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GeoOps.boxType
  override def nullIntolerant: Boolean = true
  // see WkbBound.nullable — same empty-geometry null + codegen issue
  override def nullable: Boolean = true
  override def prettyName: String = "st_extent"

  override protected def nullSafeEval(v: Any): Any =
    WkbEnvelope.extentRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("extent")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = graft.functions.WkbEnvelope.extentRow($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WkbExtent = copy(child = c)
}
