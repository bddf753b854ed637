package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom._
import org.locationtech.jts.algorithm.hull.ConcaveHull
import org.locationtech.jts.dissolve.LineDissolver
import org.locationtech.jts.geom.util.AffineTransformation
import org.locationtech.jts.operation.linemerge.LineMerger
import org.locationtech.jts.operation.union.UnaryUnionOp
import org.locationtech.jts.precision.GeometryPrecisionReducer
import org.locationtech.jts.simplify.{DouglasPeuckerSimplifier, TopologyPreservingSimplifier}

import scala.jdk.CollectionConverters._

/**
 * Scalar ST_* implementations over WKB geometry (BinaryType).
 * Coverage target: the reference's core + GEOS scalar surface —
 * spatial/include/spatial/core/functions/scalar.hpp:11-66 and
 * spatial/include/spatial/geos/functions/scalar.hpp:11-44 (behavioral
 * spec in /root/reference/docs/functions.md).
 */
object GeoOps {
  // Spark 4.1 also ships a types.Geometry (native GEOMETRY type); we
  // use JTS's here — explicit import wins over the two wildcards.
  import org.locationtech.jts.geom.Geometry

  final case class Op(out: DataType, fn: Array[Any] => Any)

  // ---- catalyst value helpers -------------------------------------------
  private def dbl(v: Any): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case i: java.lang.Integer => i.toDouble
    case l: java.lang.Long => l.toDouble
    case d: Decimal => d.toDouble
    case s: java.lang.Short => s.toDouble
    case b: java.lang.Byte => b.toDouble
    case other => other.toString.toDouble
  }
  private def int(v: Any): Int = v match {
    case i: java.lang.Integer => i
    case l: java.lang.Long => l.toInt
    case d: java.lang.Double => d.toInt
    case s: java.lang.Short => s.toInt
    case b: java.lang.Byte => b.toInt
    case other => other.toString.toDouble.toInt
  }
  private def bool(v: Any): Boolean = v.asInstanceOf[Boolean]
  private def str(v: Any): String = v.toString
  private def geo(v: Any): Geometry = Jts.read(v.asInstanceOf[Array[Byte]])
  private def out(g: Geometry): Array[Byte] = Jts.write(g)
  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def geoList(v: Any): Seq[Geometry] = {
    val arr = v.asInstanceOf[ArrayData]
    (0 until arr.numElements()).flatMap { i =>
      if (arr.isNullAt(i)) None else Some(Jts.read(arr.getBinary(i)))
    }
  }
  /** BOX arg: either an InternalRow struct(min_x,min_y,max_x,max_y) or null. */
  private def boxOf(v: Any): (Double, Double, Double, Double) = v match {
    case r: InternalRow => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    case _ => sys.error("expected BOX struct(min_x,min_y,max_x,max_y)")
  }

  val boxType: StructType = StructType(Seq(
    StructField("min_x", DoubleType, nullable = false),
    StructField("min_y", DoubleType, nullable = false),
    StructField("max_x", DoubleType, nullable = false),
    StructField("max_y", DoubleType, nullable = false)))

  val dumpType: DataType = ArrayType(StructType(Seq(
    StructField("geom", BinaryType), StructField("path", ArrayType(IntegerType)))))

  private def box(e: Envelope): InternalRow =
    new GenericInternalRow(Array[Any](e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))

  // Sum of linear-component lengths only (reference ST_Length: polygons
  // contribute 0 — st_length.cpp; JTS getLength on a polygon would
  // return its perimeter instead).
  private def lineLength(g: Geometry): Double = g match {
    case l: LineString => l.getLength
    case _: Polygon => 0.0
    case _: Point => 0.0
    case coll =>
      var s = 0.0
      for (i <- 0 until coll.getNumGeometries) s += lineLength(coll.getGeometryN(i))
      s
  }

  private def perimeter(g: Geometry): Double = g match {
    case p: Polygon => p.getLength
    case _: LineString | _: Point => 0.0
    case coll =>
      var s = 0.0
      for (i <- 0 until coll.getNumGeometries) s += perimeter(coll.getGeometryN(i))
      s
  }

  private def flatten(g: Geometry): Seq[Geometry] =
    if (g.getGeometryType.startsWith("Multi") || g.getGeometryType == "GeometryCollection")
      (0 until g.getNumGeometries).flatMap(i => flatten(g.getGeometryN(i)))
    else Seq(g)

  // Rebuild with fresh coordinate arrays: in-place mutation silently
  // drops Z/M on 2-D sequences (CoordinateXY has no z slot).
  private def mapCoords(g: Geometry)(f: Coordinate => Coordinate): Geometry = {
    val editor = new org.locationtech.jts.geom.util.GeometryEditor(Jts.gf)
    editor.edit(g, new org.locationtech.jts.geom.util.GeometryEditor.CoordinateOperation {
      override def edit(coords: Array[Coordinate], geom: Geometry): Array[Coordinate] =
        coords.map(f)
    })
  }

  private def zmFlag(g: Geometry): Int = {
    val c = Jts.firstCoord(g)
    if (c == null) 0
    else {
      val hasZ = !java.lang.Double.isNaN(c.getZ)
      val hasM = !java.lang.Double.isNaN(c.getM)
      // reference ST_ZMFlag: 0=XY 1=XYM 2=XYZ 3=XYZM (st_has.cpp)
      (hasZ, hasM) match {
        case (false, false) => 0
        case (false, true) => 1
        case (true, false) => 2
        case (true, true) => 3
      }
    }
  }

  private val GeohashB32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash: interleaved lon/lat bisection, 5 bits per
   *  base32 char. All midpoints are exact binary rationals scaled by
   *  180/90, so any faithful implementation is bit-identical. */
  private def geohash(lon: Double, lat: Double, prec: Int): String = {
    require(prec >= 1 && prec <= 20, s"st_geohash: precision $prec outside [1,20]")
    require(lon >= -180 && lon <= 180 && lat >= -90 && lat <= 90,
      s"st_geohash: ($lon, $lat) outside lon/lat bounds")
    var lonLo = -180.0; var lonHi = 180.0; var latLo = -90.0; var latHi = 90.0
    val sb = new StringBuilder
    var isLon = true; var bit = 0; var ch = 0
    while (sb.length < prec) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch <<= 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch <<= 1; latHi = mid }
      }
      isLon = !isLon; bit += 1
      if (bit == 5) { sb.append(GeohashB32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Inverse: the (lonLo, latLo, lonHi, latHi) cell of a geohash. */
  private def geohashBox(gh: String): (Double, Double, Double, Double) = {
    var lonLo = -180.0; var lonHi = 180.0; var latLo = -90.0; var latHi = 90.0
    var isLon = true
    gh.toLowerCase.foreach { c =>
      val v = GeohashB32.indexOf(c)
      require(v >= 0, s"invalid geohash character '$c'")
      var b = 4
      while (b >= 0) {
        val on = ((v >> b) & 1) == 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (on) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (on) latLo = mid else latHi = mid
        }
        isLon = !isLon; b -= 1
      }
    }
    (lonLo, latLo, lonHi, latHi)
  }

  /** ST_Subdivide recursion: halve along the envelope's longer axis
   *  until every piece has <= maxV vertices (PostGIS's join-scale
   *  enabler — pieces index/join far better than one giant polygon).
   *  Clipping can add crossing vertices, so a depth guard emits an
   *  over-budget piece as-is rather than recursing forever. */
  private def subdivide(g: Geometry, maxV: Int, depth: Int = 0): Seq[Geometry] = {
    if (g.isEmpty) Nil
    else if (g.getNumPoints <= maxV || depth >= 48) Seq(g)
    else {
      val e = g.getEnvelopeInternal
      val (ae, be) =
        if (e.getWidth >= e.getHeight) {
          val mx = (e.getMinX + e.getMaxX) / 2
          (new Envelope(e.getMinX, mx, e.getMinY, e.getMaxY),
            new Envelope(mx, e.getMaxX, e.getMinY, e.getMaxY))
        } else {
          val my = (e.getMinY + e.getMaxY) / 2
          (new Envelope(e.getMinX, e.getMaxX, e.getMinY, my),
            new Envelope(e.getMinX, e.getMaxX, my, e.getMaxY))
        }
      Seq(ae, be).flatMap { half =>
        val clip = g.intersection(Jts.gf.toGeometry(half))
        // keep only parts of the input's dimension (clipping a polygon
        // along the cut line can shed degenerate lines/points)
        flatten(clip).filter(p => p.getDimension == g.getDimension && !p.isEmpty)
          .flatMap(subdivide(_, maxV, depth + 1))
      }
    }
  }

  private def quadKey(lonIn: Double, latIn: Double, level: Int): String = {
    // Bing maps quadkey, same tile math as reference st_quadkey.cpp:16-38
    require(level >= 1 && level <= 23, "ST_QuadKey: Level must be between 1 and 23")
    val lat = math.max(-85.05112878, math.min(85.05112878, latIn))
    val lon = math.max(-180.0, math.min(180.0, lonIn))
    val latRad = lat * math.Pi / 180.0
    val tileX = ((lon + 180.0) / 360.0 * (1 << level)).toInt
    val tileY = ((1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * (1 << level)).toInt
    val sb = new StringBuilder
    var i = level
    while (i > 0) {
      var digit = '0'
      val mask = 1 << (i - 1)
      if ((tileX & mask) != 0) digit = (digit + 1).toChar
      if ((tileY & mask) != 0) digit = (digit + 2).toChar
      sb.append(digit)
      i -= 1
    }
    sb.toString
  }

  // ---- the registry ------------------------------------------------------
  val ops: Map[String, Op] = Map(
    // constructors & IO
    "st_point" -> Op(BinaryType, a => out(Jts.point(dbl(a(0)), dbl(a(1))))),
    "st_makepoint" -> Op(BinaryType, a =>
      if (a.length == 2) out(Jts.point(dbl(a(0)), dbl(a(1))))
      else if (a.length == 3) out(Jts.pointZ(dbl(a(0)), dbl(a(1)), dbl(a(2))))
      else out(Jts.pointZM(dbl(a(0)), dbl(a(1)), dbl(a(2)), dbl(a(3))))),
    "st_geomfromtext" -> Op(BinaryType, a =>
      try out(Jts.fromWkt(str(a(0))))
      catch { case e: Exception =>
        if (a.length > 1 && bool(a(1))) null
        else throw new IllegalArgumentException(s"invalid WKT: ${str(a(0)).take(60)}", e) }),
    "st_geomfromwkb" -> Op(BinaryType, a => out(geo(a(0)))),
    "st_geomfromhexwkb" -> Op(BinaryType, a =>
      out(Jts.read(org.locationtech.jts.io.WKBReader.hexToBytes(str(a(0)))))),
    "st_geomfromgeojson" -> Op(BinaryType, a => out(GeoJson.parse(str(a(0))))),
    "st_astext" -> Op(StringType, a => utf8(Jts.toWkt(geo(a(0))))),
    "st_aswkb" -> Op(BinaryType, a => out(geo(a(0)))),
    "st_ashexwkb" -> Op(StringType, a =>
      utf8(org.locationtech.jts.io.WKBWriter.toHex(out(geo(a(0)))).toUpperCase)),
    "st_asgeojson" -> Op(StringType, a => utf8(GeoJson.write(geo(a(0))))),
    "st_assvg" -> Op(StringType, a => {
      val g = geo(a(0))
      val rel = if (a.length > 1) bool(a(1)) else false
      val prec = if (a.length > 2) int(a(2)) else 15
      utf8(Svg.write(g, rel, prec))
    }),
    "st_makeenvelope" -> Op(BinaryType, a =>
      out(Jts.envelope(dbl(a(0)), dbl(a(1)), dbl(a(2)), dbl(a(3))))),
    "st_makeline" -> Op(BinaryType, a => {
      val pts =
        if (a.length == 1) geoList(a(0)) else Seq(geo(a(0)), geo(a(1)))
      val coords = pts.flatMap(p => p.getCoordinates.toSeq)
      out(Jts.gf.createLineString(coords.toArray))
    }),
    "st_makepolygon" -> Op(BinaryType, a => {
      val shell = geo(a(0)) match {
        case l: LineString => Jts.gf.createLinearRing(l.getCoordinateSequence)
        case other => sys.error(s"ST_MakePolygon shell must be LINESTRING, got ${other.getGeometryType}")
      }
      if (a.length == 1) out(Jts.gf.createPolygon(shell))
      else {
        val holes = geoList(a(1)).map {
          case l: LineString => Jts.gf.createLinearRing(l.getCoordinateSequence)
          case other => sys.error(s"hole must be LINESTRING, got ${other.getGeometryType}")
        }
        out(Jts.gf.createPolygon(shell, holes.toArray))
      }
    }),
    "st_collect" -> Op(BinaryType, a => out(Jts.collect(geoList(a(0))))),
    "st_multi" -> Op(BinaryType, a => {
      val g = geo(a(0))
      val m = g match {
        case p: Point => Jts.gf.createMultiPoint(Array(p))
        case l: LineString => Jts.gf.createMultiLineString(Array(l))
        case p: Polygon => Jts.gf.createMultiPolygon(Array(p))
        case other => other
      }
      out(m)
    }),
    "st_collectionextract" -> Op(BinaryType, a => {
      val g = geo(a(0))
      if (a.length == 1) {
        // highest-dimension extraction (reference st_collectionextract.cpp)
        val parts = flatten(g)
        if (parts.isEmpty) out(g)
        else {
          val maxDim = parts.map(_.getDimension).max
          out(Jts.collect(parts.filter(_.getDimension == maxDim)))
        }
      } else {
        val wantDim = int(a(1)) - 1 // 1=point,2=line,3=polygon
        out(Jts.collect(flatten(g).filter(_.getDimension == wantDim)))
      }
    }),
    "st_dump" -> Op(dumpType, a => {
      val g = geo(a(0))
      val items = scala.collection.mutable.ArrayBuffer.empty[Any]
      def rec(geom: Geometry, path: List[Int]): Unit = {
        if (geom.getGeometryType.startsWith("Multi") || geom.getGeometryType == "GeometryCollection") {
          for (i <- 0 until geom.getNumGeometries) rec(geom.getGeometryN(i), path :+ (i + 1))
        } else {
          items += InternalRow(out(geom), new GenericArrayData(path.toArray))
        }
      }
      rec(g, Nil)
      new GenericArrayData(items.toArray)
    }),
    "st_points" -> Op(BinaryType, a => {
      val coords = geo(a(0)).getCoordinates
      out(Jts.gf.createMultiPoint(coords.map(Jts.gf.createPoint)))
    }),
    "st_force2d" -> Op(BinaryType, a =>
      out(mapCoords(geo(a(0)))(c => new Coordinate(c.x, c.y)))),
    "st_force3dz" -> Op(BinaryType, a => {
      val z = if (a.length > 1) dbl(a(1)) else 0.0
      out(mapCoords(geo(a(0)))(c =>
        new Coordinate(c.x, c.y, if (java.lang.Double.isNaN(c.getZ)) z else c.getZ)))
    }),
    "st_force3dm" -> Op(BinaryType, a => {
      val m = if (a.length > 1) dbl(a(1)) else 0.0
      out(mapCoords(geo(a(0)))(c =>
        new CoordinateXYM(c.x, c.y, if (java.lang.Double.isNaN(c.getM)) m else c.getM)))
    }),
    "st_force4d" -> Op(BinaryType, a => {
      val z = if (a.length > 1) dbl(a(1)) else 0.0
      val m = if (a.length > 2) dbl(a(2)) else 0.0
      out(mapCoords(geo(a(0)))(c => new CoordinateXYZM(c.x, c.y,
        if (java.lang.Double.isNaN(c.getZ)) z else c.getZ,
        if (java.lang.Double.isNaN(c.getM)) m else c.getM)))
    }),
    "st_flipcoordinates" -> Op(BinaryType, a =>
      // swap x/y preserving the Z and M slots (reference keeps the full
      // vertex type — st_flipcoordinates.test covers Z/M/ZM)
      out(mapCoords(geo(a(0))) { c =>
        val z = c.getZ; val m = c.getM
        if (!java.lang.Double.isNaN(m) && !java.lang.Double.isNaN(z))
          new CoordinateXYZM(c.y, c.x, z, m)
        else if (!java.lang.Double.isNaN(m)) new CoordinateXYM(c.y, c.x, m)
        else new Coordinate(c.y, c.x, z)
      })),
    "st_reverse" -> Op(BinaryType, a => out(geo(a(0)).reverse())),
    "st_normalize" -> Op(BinaryType, a => { val g = geo(a(0)); g.normalize(); out(g) }),

    // accessors
    "st_x" -> Op(DoubleType, a => geo(a(0)) match { case p: Point if !p.isEmpty => p.getX; case _ => null }),
    "st_y" -> Op(DoubleType, a => geo(a(0)) match { case p: Point if !p.isEmpty => p.getY; case _ => null }),
    "st_z" -> Op(DoubleType, a => geo(a(0)) match {
      case p: Point if !p.isEmpty && !java.lang.Double.isNaN(p.getCoordinate.getZ) => p.getCoordinate.getZ
      case _ => null }),
    "st_m" -> Op(DoubleType, a => geo(a(0)) match {
      case p: Point if !p.isEmpty && !java.lang.Double.isNaN(p.getCoordinate.getM) => p.getCoordinate.getM
      case _ => null }),
    "st_xmin" -> Op(DoubleType, a => { val g = geo(a(0)); if (g.isEmpty) null else g.getEnvelopeInternal.getMinX }),
    "st_xmax" -> Op(DoubleType, a => { val g = geo(a(0)); if (g.isEmpty) null else g.getEnvelopeInternal.getMaxX }),
    "st_ymin" -> Op(DoubleType, a => { val g = geo(a(0)); if (g.isEmpty) null else g.getEnvelopeInternal.getMinY }),
    "st_ymax" -> Op(DoubleType, a => { val g = geo(a(0)); if (g.isEmpty) null else g.getEnvelopeInternal.getMaxY }),
    "st_zmin" -> Op(DoubleType, a => zFold(geo(a(0)), min = true, useM = false)),
    "st_zmax" -> Op(DoubleType, a => zFold(geo(a(0)), min = false, useM = false)),
    "st_mmin" -> Op(DoubleType, a => zFold(geo(a(0)), min = true, useM = true)),
    "st_mmax" -> Op(DoubleType, a => zFold(geo(a(0)), min = false, useM = true)),
    "st_extent" -> Op(boxType, a => { val g = geo(a(0)); if (g.isEmpty) null else box(g.getEnvelopeInternal) }),
    "st_envelope" -> Op(BinaryType, a => out(geo(a(0)).getEnvelope)),
    "st_npoints" -> Op(IntegerType, a => geo(a(0)).getNumPoints),
    // reference counts an EMPTY singleton as 0 parts (st_ngeometries.test:
    // POINT/LINESTRING/POLYGON EMPTY -> 0); JTS getNumGeometries says 1
    "st_ngeometries" -> Op(IntegerType, a => geo(a(0)) match {
      case c: GeometryCollection => c.getNumGeometries // incl. Multi* subclasses
      case g => if (g.isEmpty) 0 else 1 }),
    "st_ninteriorrings" -> Op(IntegerType, a => geo(a(0)) match {
      case p: Polygon => p.getNumInteriorRing
      case _ => null }),
    "st_geometrytype" -> Op(StringType, a => utf8(Jts.typeTag(geo(a(0))))),
    "st_isempty" -> Op(BooleanType, a => geo(a(0)).isEmpty),
    "st_isclosed" -> Op(BooleanType, a => geo(a(0)) match {
      case l: LineString => l.isClosed
      case m: MultiLineString => m.isClosed
      case _: Point | _: MultiPoint => true
      case g => !g.isEmpty }),
    "st_isring" -> Op(BooleanType, a => geo(a(0)) match {
      case l: LineString => l.isClosed && l.isSimple
      case _ => false }),
    "st_issimple" -> Op(BooleanType, a => geo(a(0)).isSimple),
    "st_isvalid" -> Op(BooleanType, a => geo(a(0)).isValid),
    // JTS yields -1 for an empty collection; the reference clamps to 0
    // (st_dimension.test: GEOMETRYCOLLECTION EMPTY -> 0)
    "st_dimension" -> Op(IntegerType, a => math.max(0, geo(a(0)).getDimension)),
    "st_startpoint" -> Op(BinaryType, a => geo(a(0)) match {
      case l: LineString if !l.isEmpty => out(l.getStartPoint)
      case _ => null }),
    "st_endpoint" -> Op(BinaryType, a => geo(a(0)) match {
      case l: LineString if !l.isEmpty => out(l.getEndPoint)
      case _ => null }),
    "st_pointn" -> Op(BinaryType, a => geo(a(0)) match {
      case l: LineString =>
        val n = l.getNumPoints
        val idx0 = int(a(1))
        val idx = if (idx0 < 0) n + idx0 else idx0 - 1 // 1-based; negative from end
        if (idx < 0 || idx >= n) null else out(l.getPointN(idx))
      case _ => null }),
    "st_exteriorring" -> Op(BinaryType, a => geo(a(0)) match {
      case p: Polygon => out(Jts.gf.createLineString(p.getExteriorRing.getCoordinateSequence))
      case _ => null }),
    "st_interiorringn" -> Op(BinaryType, a => geo(a(0)) match {
      case p: Polygon if int(a(1)) >= 1 && int(a(1)) <= p.getNumInteriorRing =>
        out(Jts.gf.createLineString(p.getInteriorRingN(int(a(1)) - 1).getCoordinateSequence))
      case _ => null }),
    "st_hasz" -> Op(BooleanType, a => { val f = zmFlag(geo(a(0))); f == 2 || f == 3 }),
    "st_hasm" -> Op(BooleanType, a => { val f = zmFlag(geo(a(0))); f == 1 || f == 3 }),
    "st_zmflag" -> Op(IntegerType, a => zmFlag(geo(a(0)))),

    // measures
    "st_area" -> Op(DoubleType, a => geo(a(0)).getArea),
    "st_length" -> Op(DoubleType, a => lineLength(geo(a(0)))),
    "st_perimeter" -> Op(DoubleType, a => perimeter(geo(a(0)))),
    "st_distance" -> Op(DoubleType, a => geo(a(0)).distance(geo(a(1)))),
    "st_maxdistance" -> Op(DoubleType, a => {
      val c1 = geo(a(0)).getCoordinates; val g2 = geo(a(1)).getCoordinates
      var m = 0.0
      for (p <- c1; q <- g2) m = math.max(m, p.distance(q))
      m
    }),
    "st_distance_sphere" -> Op(DoubleType, a => (geo(a(0)), geo(a(1))) match {
      case (p: Point, q: Point) => Geodesy.haversine(p.getX, p.getY, q.getX, q.getY)
      case _ => sys.error("ST_Distance_Sphere expects two POINTs") }),
    "st_haversine" -> Op(DoubleType, a =>
      Geodesy.haversine(dbl(a(0)), dbl(a(1)), dbl(a(2)), dbl(a(3)))),
    "st_area_spheroid" -> Op(DoubleType, a => Geodesy.areaSpheroid(geo(a(0)))),
    "st_length_spheroid" -> Op(DoubleType, a => Geodesy.lengthSpheroid(geo(a(0)))),
    "st_perimeter_spheroid" -> Op(DoubleType, a => Geodesy.perimeterSpheroid(geo(a(0)))),
    "st_distance_spheroid" -> Op(DoubleType, a => (geo(a(0)), geo(a(1))) match {
      case (p: Point, q: Point) => Geodesy.vincenty(p.getX, p.getY, q.getX, q.getY)
      case _ => sys.error("ST_Distance_Spheroid expects two POINTs") }),
    "st_dwithin_spheroid" -> Op(BooleanType, a => (geo(a(0)), geo(a(1))) match {
      case (p: Point, q: Point) => Geodesy.vincenty(p.getX, p.getY, q.getX, q.getY) <= dbl(a(2))
      case _ => sys.error("ST_DWithin_Spheroid expects two POINTs") }),
    "st_dwithin" -> Op(BooleanType, a => geo(a(0)).isWithinDistance(geo(a(1)), dbl(a(2)))),

    // constructive / overlay (JTS; reference wraps GEOS — same lineage)
    // GEOS has no boundary for (non-Multi) GeometryCollection — the
    // reference yields SQL NULL there (st_disjoint.test inserts
    // ST_Boundary(GEOMETRYCOLLECTION EMPTY) and gets NULL); JTS throws
    "st_boundary" -> Op(BinaryType, a => geo(a(0)) match {
      case gc: GeometryCollection if gc.getGeometryType == "GeometryCollection" => null
      case g => out(g.getBoundary) }),
    // ST_Buffer(geom, d [, segments [, cap_style, join_style, mitre_limit]])
    // — reference geos/functions/scalar/st_buffer.cpp style-enum args
    "st_buffer" -> Op(BinaryType, a => {
      val g = geo(a(0)); val d = dbl(a(1))
      if (a.length <= 2) out(g.buffer(d))
      else if (a.length == 3) out(g.buffer(d, int(a(2))))
      else {
        import org.locationtech.jts.operation.buffer.{BufferOp, BufferParameters}
        val p = new BufferParameters()
        p.setQuadrantSegments(int(a(2)))
        p.setEndCapStyle(str(a(3)).toUpperCase match {
          case "CAP_ROUND" => BufferParameters.CAP_ROUND
          case "CAP_FLAT" => BufferParameters.CAP_FLAT
          case "CAP_SQUARE" => BufferParameters.CAP_SQUARE
          case other => sys.error(s"unknown cap style $other")
        })
        if (a.length > 4) p.setJoinStyle(str(a(4)).toUpperCase match {
          case "JOIN_ROUND" => BufferParameters.JOIN_ROUND
          case "JOIN_MITRE" => BufferParameters.JOIN_MITRE
          case "JOIN_BEVEL" => BufferParameters.JOIN_BEVEL
          case other => sys.error(s"unknown join style $other")
        })
        if (a.length > 5) p.setMitreLimit(dbl(a(5)))
        out(BufferOp.bufferOp(g, d, p))
      }
    }),
    "st_centroid" -> Op(BinaryType, a => out(geo(a(0)).getCentroid)),
    "st_convexhull" -> Op(BinaryType, a => out(geo(a(0)).convexHull())),
    "st_concavehull" -> Op(BinaryType, a =>
      out(ConcaveHull.concaveHullByLengthRatio(geo(a(0)), dbl(a(1))))),
    "st_difference" -> Op(BinaryType, a => out(geo(a(0)).difference(geo(a(1))))),
    "st_intersection" -> Op(BinaryType, a => out(geo(a(0)).intersection(geo(a(1))))),
    "st_union" -> Op(BinaryType, a =>
      if (a.length == 1) out(UnaryUnionOp.union(geoList(a(0)).asJavaCollection))
      else out(geo(a(0)).union(geo(a(1))))),
    // ST_LineMerge(geom [, preserve_direction]) — reference
    // geos/functions/scalar/st_linemerge.cpp (directed variant merges
    // only head-to-tail chains, never reversing a segment)
    "st_linemerge" -> Op(BinaryType, a => {
      val directed = a.length > 1 && bool(a(1))
      if (!directed) {
        val merger = new LineMerger
        merger.add(geo(a(0)))
        val merged = merger.getMergedLineStrings.asScala.toSeq.map(_.asInstanceOf[Geometry])
        out(Jts.collect(merged) match {
          case m: MultiLineString if m.getNumGeometries == 1 => m.getGeometryN(0)
          case other => other
        })
      } else {
        val lines = scala.collection.mutable.ArrayBuffer[Array[Coordinate]]()
        def collect(g: Geometry): Unit = g match {
          case l: LineString => lines += l.getCoordinates
          case coll => for (i <- 0 until coll.getNumGeometries) collect(coll.getGeometryN(i))
        }
        collect(geo(a(0)))
        // greedy head-to-tail chaining without reversal
        val used = Array.fill(lines.length)(false)
        val outLines = scala.collection.mutable.ArrayBuffer[Geometry]()
        for (i <- lines.indices if !used(i)) {
          used(i) = true
          val chain = scala.collection.mutable.ArrayBuffer(lines(i): _*)
          var extended = true
          while (extended) {
            extended = false
            for (j <- lines.indices if !used(j)) {
              if (!extended && chain.last.equals2D(lines(j).head)) {
                chain ++= lines(j).drop(1); used(j) = true; extended = true
              } else if (!extended && lines(j).last.equals2D(chain.head)) {
                chain.prependAll(lines(j).dropRight(1)); used(j) = true; extended = true
              }
            }
          }
          outLines += Jts.gf.createLineString(chain.toArray)
        }
        out(if (outLines.size == 1) outLines.head
          else Jts.gf.createMultiLineString(outLines.map(_.asInstanceOf[LineString]).toArray))
      }
    }),
    "st_makevalid" -> Op(BinaryType, a => out(Jts.makeValid(geo(a(0))))),
    "st_pointonsurface" -> Op(BinaryType, a => out(geo(a(0)).getInteriorPoint)),

    // --- linear referencing (PostGIS parity; beyond the reference's
    // function index — GPS-track / route processing primitives) ---
    // ST_LineInterpolatePoint(line, f): the point at fraction f of the
    // line's length (f in [0,1], ends clamp); NULL for non-lines.
    "st_lineinterpolatepoint" -> Op(BinaryType, a => geo(a(0)) match {
      case l: LineString if !l.isEmpty =>
        val f = dbl(a(1))
        require(f >= 0.0 && f <= 1.0, s"st_lineinterpolatepoint: fraction $f outside [0,1]")
        val ix = new org.locationtech.jts.linearref.LengthIndexedLine(l)
        out(Jts.gf.createPoint(ix.extractPoint(f * l.getLength)))
      case _ => null
    }),
    // ST_LineSubstring(line, f0, f1): the sub-line between length
    // fractions f0 <= f1 (a degenerate f0 == f1 yields the point as a
    // 2-coordinate zero-length line, JTS extract semantics).
    "st_linesubstring" -> Op(BinaryType, a => geo(a(0)) match {
      case l: LineString if !l.isEmpty =>
        val f0 = dbl(a(1)); val f1 = dbl(a(2))
        require(f0 >= 0.0 && f0 <= f1 && f1 <= 1.0,
          s"st_linesubstring: fractions ($f0, $f1) must satisfy 0 <= f0 <= f1 <= 1")
        val ix = new org.locationtech.jts.linearref.LengthIndexedLine(l)
        out(ix.extractLine(f0 * l.getLength, f1 * l.getLength))
      case _ => null
    }),
    // ST_LineLocatePoint(line, point): the length fraction of the
    // line's closest point to `point`; NULL for non-line/zero-length.
    "st_linelocatepoint" -> Op(DoubleType, a => (geo(a(0)), geo(a(1))) match {
      case (l: LineString, p: Point) if !l.isEmpty && !p.isEmpty && l.getLength > 0 =>
        val ix = new org.locationtech.jts.linearref.LengthIndexedLine(l)
        ix.project(p.getCoordinate) / l.getLength
      case _ => null
    }),
    // ST_Subdivide(geom, maxVertices): pieces with bounded vertex
    // counts as a GEOMETRYCOLLECTION (PostGIS returns a set; the
    // caller explodes with ST_Dump — same contract as st_polygonize).
    "st_subdivide" -> Op(BinaryType, a => {
      val maxV = if (a.length > 1) int(a(1)) else 256
      require(maxV >= 5, s"st_subdivide: maxVertices must be >= 5, got $maxV")
      val parts = subdivide(geo(a(0)), maxV)
      if (parts.size == 1) out(parts.head)
      else out(Jts.gf.createGeometryCollection(parts.toArray))
    }),

    // ST_GeoHash(point[, precision]) + the PostGIS decode pair:
    // ST_GeomFromGeoHash -> cell box polygon, ST_PointFromGeoHash ->
    // cell center. NULL for non-points; out-of-range/invalid fail loud.
    "st_geohash" -> Op(StringType, a => geo(a(0)) match {
      case p: Point if !p.isEmpty =>
        utf8(geohash(p.getX, p.getY, if (a.length > 1) int(a(1)) else 12))
      case _ => null
    }),
    "st_geomfromgeohash" -> Op(BinaryType, a => {
      val (x0, y0, x1, y1) = geohashBox(str(a(0)))
      out(Jts.envelope(x0, y0, x1, y1))
    }),
    "st_pointfromgeohash" -> Op(BinaryType, a => {
      val (x0, y0, x1, y1) = geohashBox(str(a(0)))
      out(Jts.point((x0 + x1) / 2, (y0 + y1) / 2))
    }),

    // ST_Segmentize(geom, maxLen): densify so no segment exceeds
    // maxLen (PostGIS semantics = JTS Densifier: each segment splits
    // into equal parts).
    "st_segmentize" -> Op(BinaryType, a => {
      val d = dbl(a(1))
      require(d > 0, s"st_segmentize: max segment length must be positive, got $d")
      out(org.locationtech.jts.densify.Densifier.densify(geo(a(0)), d))
    }),
    // ST_OffsetCurve(line, d): the line offset by |d| — positive d to
    // the LEFT of the direction of travel, negative to the right
    // (PostGIS convention, JTS OffsetCurve); NULL for non-lines.
    "st_offsetcurve" -> Op(BinaryType, a => geo(a(0)) match {
      case l: LineString if !l.isEmpty =>
        out(org.locationtech.jts.operation.buffer.OffsetCurve.getCurve(l, dbl(a(1))))
      case _ => null
    }),

    // ST_DelaunayTriangles(geom[, tol]): Delaunay triangulation of the
    // input's vertices as a collection of POLYGON triangles.
    "st_delaunaytriangles" -> Op(BinaryType, a => {
      val b = new org.locationtech.jts.triangulate.DelaunayTriangulationBuilder()
      b.setSites(geo(a(0)))
      if (a.length > 1) b.setTolerance(dbl(a(1)))
      out(b.getTriangles(Jts.gf))
    }),
    // ST_VoronoiPolygons(geom[, tol[, extendTo]]): Voronoi cells of
    // the input's vertices, clipped to extendTo's envelope when given
    // (else JTS's default enlarged envelope).
    "st_voronoipolygons" -> Op(BinaryType, a => {
      val b = new org.locationtech.jts.triangulate.VoronoiDiagramBuilder()
      b.setSites(geo(a(0)))
      if (a.length > 1) b.setTolerance(dbl(a(1)))
      if (a.length > 2) b.setClipEnvelope(geo(a(2)).getEnvelopeInternal)
      out(b.getDiagram(Jts.gf))
    }),
    // ST_Snap(geom, ref, tol): vertices of geom within tol of ref's
    // vertices/segments snap onto them (JTS GeometrySnapper).
    "st_snap" -> Op(BinaryType, a =>
      out(org.locationtech.jts.operation.overlay.snap.GeometrySnapper
        .snap(geo(a(0)), geo(a(1)), dbl(a(2)))(0))),

    // ST_Azimuth(a, b): radians clockwise from north (atan2(dx, dy)
    // normalized to [0, 2pi)); NULL when the points coincide.
    "st_azimuth" -> Op(DoubleType, a => (geo(a(0)), geo(a(1))) match {
      case (p: Point, q: Point) if !p.isEmpty && !q.isEmpty &&
          (p.getX != q.getX || p.getY != q.getY) =>
        val az = math.atan2(q.getX - p.getX, q.getY - p.getY)
        if (az < 0) az + 2 * math.Pi else az
      case _ => null
    }),
    "st_reduceprecision" -> Op(BinaryType, a =>
      out(GeometryPrecisionReducer.reduce(geo(a(0)), new PrecisionModel(1.0 / dbl(a(1)))))),
    "st_removerepeatedpoints" -> Op(BinaryType, a => {
      val tol = if (a.length > 1) dbl(a(1)) else 0.0
      out(removeRepeated(geo(a(0)), tol))
    }),
    "st_shortestline" -> Op(BinaryType, a => {
      val pts = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(geo(a(0)), geo(a(1)))
      out(Jts.gf.createLineString(pts))
    }),
    "st_simplify" -> Op(BinaryType, a => out(DouglasPeuckerSimplifier.simplify(geo(a(0)), dbl(a(1))))),
    "st_simplifypreservetopology" -> Op(BinaryType, a =>
      out(TopologyPreservingSimplifier.simplify(geo(a(0)), dbl(a(1))))),
    "st_node" -> Op(BinaryType, a => out(LineDissolver.dissolve(geo(a(0))))),
    "st_translate" -> Op(BinaryType, a =>
      out(AffineTransformation.translationInstance(dbl(a(1)), dbl(a(2))).transform(geo(a(0))))),
    // affine family (PostGIS parity): scale about the origin, rotate
    // counter-clockwise by radians about the origin (or a given point)
    "st_scale" -> Op(BinaryType, a =>
      out(AffineTransformation.scaleInstance(dbl(a(1)), dbl(a(2))).transform(geo(a(0))))),
    "st_rotate" -> Op(BinaryType, a => {
      val t =
        if (a.length > 3) AffineTransformation.rotationInstance(dbl(a(1)), dbl(a(2)), dbl(a(3)))
        else AffineTransformation.rotationInstance(dbl(a(1)))
      out(t.transform(geo(a(0))))
    }),
    // ST_MinimumBoundingCircle: the smallest enclosing circle as a
    // buffer polygon; companion ST_MinimumBoundingRadius returns the
    // exact radius (PostGIS splits these the same way)
    "st_minimumboundingcircle" -> Op(BinaryType, a =>
      out(new org.locationtech.jts.algorithm.MinimumBoundingCircle(geo(a(0))).getCircle)),
    "st_minimumboundingradius" -> Op(DoubleType, a =>
      new org.locationtech.jts.algorithm.MinimumBoundingCircle(geo(a(0))).getRadius),
    // ST_Polygonize over a collection/array of linework: polygons
    // formed by fully-noded edges (JTS Polygonizer); result is a
    // GeometryCollection of the formed polygons (PostGIS shape)
    "st_polygonize" -> Op(BinaryType, a => {
      val pz = new org.locationtech.jts.operation.polygonize.Polygonizer()
      pz.add(geo(a(0)))
      val polys = pz.getPolygons.asScala.toSeq.map(_.asInstanceOf[Geometry])
      out(Jts.gf.createGeometryCollection(polys.toArray))
    }),

    // native POINT_xD struct constructors (reference types.cpp:11-31)
    "st_point2d" -> Op(StructType(Seq(
      StructField("x", DoubleType, nullable = false), StructField("y", DoubleType, nullable = false))),
      a => new GenericInternalRow(Array[Any](dbl(a(0)), dbl(a(1))))),
    "st_point3d" -> Op(StructType(Seq(
      StructField("x", DoubleType, nullable = false), StructField("y", DoubleType, nullable = false),
      StructField("z", DoubleType, nullable = false))),
      a => new GenericInternalRow(Array[Any](dbl(a(0)), dbl(a(1)), dbl(a(2))))),
    "st_point4d" -> Op(StructType(Seq(
      StructField("x", DoubleType, nullable = false), StructField("y", DoubleType, nullable = false),
      StructField("z", DoubleType, nullable = false), StructField("m", DoubleType, nullable = false))),
      a => new GenericInternalRow(Array[Any](dbl(a(0)), dbl(a(1)), dbl(a(2)), dbl(a(3))))),

    // space-filling curves & tiling
    "st_hilbert" -> Op(LongType, a => a.length match {
      case 6 => HilbertCurve.encode(dbl(a(0)), dbl(a(1)), dbl(a(2)), dbl(a(3)), dbl(a(4)), dbl(a(5)))
      case 5 =>
        val e = geo(a(0)).getEnvelopeInternal
        HilbertCurve.encode((e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2,
          dbl(a(1)), dbl(a(2)), dbl(a(3)), dbl(a(4)))
      case 3 =>
        val (bx, by, bX, bY) = boxOf(a(2))
        HilbertCurve.encode(dbl(a(0)), dbl(a(1)), bx, by, bX, bY)
      case 2 =>
        val (bx, by, bX, bY) = boxOf(a(1))
        val e = geo(a(0)).getEnvelopeInternal
        HilbertCurve.encode((e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2, bx, by, bX, bY)
      case _ => sys.error("ST_Hilbert arities: (x,y,box4)|(geom,box4)|(x,y,box)|(geom,box)")
    }),
    "st_quadkey" -> Op(StringType, a =>
      if (a.length == 3) utf8(quadKey(dbl(a(0)), dbl(a(1)), int(a(2))))
      else {
        val c = geo(a(0)).getCentroid
        utf8(quadKey(c.getX, c.getY, int(a(1))))
      }),

    // CRS transform
    "st_transform" -> Op(BinaryType, a => {
      val alwaysXy = if (a.length > 3) bool(a(3)) else false
      out(Crs.transform(geo(a(0)), str(a(1)), str(a(2)), alwaysXy))
    })
  )

  private def zFold(g: Geometry, min: Boolean, useM: Boolean): Any = {
    var res: java.lang.Double = null
    g.apply(new CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        val z = if (useM) c.getM else c.getZ
        if (!java.lang.Double.isNaN(z)) {
          if (res == null) res = z
          else res = if (min) math.min(res, z) else math.max(res, z)
        }
      }
    })
    res
  }

  /** GEOS/PostGIS RemoveRepeatedPoints semantics (reference delegates to
   *  GEOSRemoveRepeatedPoints_r — geos/functions/scalar/
   *  st_removerepeatedpoints.cpp:26-45; expectations in
   *  test/sql/geometry/st_removerepeatedlines.test): points within `tol`
   *  of the last kept point drop, but the ORIGINAL endpoint survives —
   *  the final kept point is replaced by it when within tolerance (and
   *  not the start), appended otherwise. Lines with <3 points copy
   *  unchanged. */
  private def removeRepeated(g: Geometry, tol: Double): Geometry = g match {
    case l: LineString =>
      val cs = l.getCoordinates
      if (cs.length < 3) return l
      val kept = scala.collection.mutable.ArrayBuffer[Coordinate](cs.head)
      var i = 1
      while (i < cs.length) {
        if (kept.last.distance(cs(i)) > tol) kept += cs(i)
        i += 1
      }
      val last = cs.last
      if (!kept.last.equals2D(last)) {
        if (kept.length > 1 && kept.last.distance(last) <= tol) kept(kept.length - 1) = last
        else kept += last
      }
      if (kept.length == 1) kept += last // all points coincide: keep start+end
      Jts.gf.createLineString(kept.toArray)
    case m: MultiLineString =>
      Jts.gf.createMultiLineString(
        (0 until m.getNumGeometries)
          .map(i => removeRepeated(m.getGeometryN(i), tol).asInstanceOf[LineString]).toArray)
    case other => other
  }
}
