package graft.functions

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryFixer
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/**
 * JTS-backed geometry kernel. GEOMETRY == standard WKB bytes in a
 * BinaryType column (design locked in SURVEY.md §7.0: the reference's
 * custom serialized blob with header/bbox — reference
 * spatial/src/spatial/core/geometry/geometry_serialization.cpp:14-37 —
 * is replaced by plain WKB; bbox caching is done in sibling struct
 * columns at the storage layer instead).
 *
 * All readers/writers are thread-local: Spark evaluates expressions on
 * many task threads in one JVM and JTS IO classes are not thread-safe.
 */
object Jts {
  val gf = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 0)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(gf))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => { val r = new WKTReader(gf); r.setIsOldJtsCoordinateSyntaxAllowed(false); r })

  def read(b: Array[Byte]): Geometry = {
    // Fast path for the hottest shape by far: a plain 2-D point (21
    // bytes, type 1). Decoding x/y directly and building the Point via
    // the factory skips WKBReader's stream machinery — a large share
    // of every point-heavy GeoScalar op (st_distance, st_dwithin,
    // accessors). NaN coordinates fall through: WKBReader maps a
    // NaN-coordinate point to POINT EMPTY and the fast path must not
    // change that semantic.
    if (b.length == 21) {
      val le = b(0) == 1
      val t =
        if (le) (b(1) & 0xFF) | ((b(2) & 0xFF) << 8) | ((b(3) & 0xFF) << 16) | ((b(4) & 0xFF) << 24)
        else (b(4) & 0xFF) | ((b(3) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) | ((b(1) & 0xFF) << 24)
      if (t == 1) {
        val bb = java.nio.ByteBuffer.wrap(b, 5, 16)
          .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
        val x = bb.getDouble; val y = bb.getDouble
        if (x == x && y == y) // not NaN
          return gf.createPoint(new org.locationtech.jts.geom.Coordinate(x, y))
      }
    }
    wkbReader.get.read(b)
  }

  /** ISO WKB writer (little-endian, type code + 1000·Z + 2000·M).
   *  Hand-rolled because JTS's WKBWriter cannot emit M-typed WKB
   *  (an XYM sequence comes out Z-tagged); JTS's WKBReader reads ISO
   *  dims fine, so roundtrips stay within JTS semantics. */
  def write(g: Geometry): Array[Byte] = {
    val z = hasZ(g); val m = hasM(g)
    val out = new java.io.ByteArrayOutputStream(64)
    writeGeom(g, z, m, out)
    out.toByteArray
  }

  private def writeGeom(g: Geometry, z: Boolean, m: Boolean, out: java.io.ByteArrayOutputStream): Unit = {
    out.write(1) // little endian
    val base = g.getGeometryType match {
      case "Point" => 1
      case "LineString" | "LinearRing" => 2
      case "Polygon" => 3
      case "MultiPoint" => 4
      case "MultiLineString" => 5
      case "MultiPolygon" => 6
      case "GeometryCollection" => 7
    }
    writeInt(base + (if (z) 1000 else 0) + (if (m) 2000 else 0), out)
    g match {
      case p: Point =>
        if (p.isEmpty) {
          writeDouble(Double.NaN, out); writeDouble(Double.NaN, out)
          if (z) writeDouble(Double.NaN, out)
          if (m) writeDouble(Double.NaN, out)
        } else writeCoord(p.getCoordinate, z, m, out)
      case l: LineString =>
        writeInt(l.getNumPoints, out)
        val cs = l.getCoordinateSequence
        var i = 0
        while (i < cs.size) { writeCoord(cs.getCoordinate(i), z, m, out); i += 1 }
      case p: Polygon =>
        if (p.isEmpty) writeInt(0, out)
        else {
          writeInt(1 + p.getNumInteriorRing, out)
          writeRing(p.getExteriorRing, z, m, out)
          var r = 0
          while (r < p.getNumInteriorRing) { writeRing(p.getInteriorRingN(r), z, m, out); r += 1 }
        }
      case coll =>
        writeInt(coll.getNumGeometries, out)
        var i = 0
        while (i < coll.getNumGeometries) { writeGeom(coll.getGeometryN(i), z, m, out); i += 1 }
    }
  }

  private def writeRing(ring: LineString, z: Boolean, m: Boolean, out: java.io.ByteArrayOutputStream): Unit = {
    val cs = ring.getCoordinateSequence
    writeInt(cs.size, out)
    var i = 0
    while (i < cs.size) { writeCoord(cs.getCoordinate(i), z, m, out); i += 1 }
  }

  private def writeCoord(c: Coordinate, z: Boolean, m: Boolean, out: java.io.ByteArrayOutputStream): Unit = {
    writeDouble(c.x, out); writeDouble(c.y, out)
    if (z) writeDouble(c.getZ, out)
    if (m) writeDouble(c.getM, out)
  }

  private def writeInt(v: Int, out: java.io.ByteArrayOutputStream): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeDouble(v: Double, out: java.io.ByteArrayOutputStream): Unit = {
    var bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { out.write((bits & 0xFF).toInt); bits >>>= 8; i += 1 }
  }

  def hasZ(g: Geometry): Boolean = {
    val c = firstCoord(g)
    c != null && !java.lang.Double.isNaN(c.getZ)
  }

  def hasM(g: Geometry): Boolean = {
    val c = firstCoord(g)
    c != null && !java.lang.Double.isNaN(c.getM)
  }

  def firstCoord(g: Geometry): Coordinate = {
    if (g.isEmpty) null else g.getCoordinate
  }

  /** Parse WKT; an EWKT `SRID=n;` prefix is accepted and dropped, like
   *  the reference's parser (st_geomfromtext.test "Ignore SRID"). */
  def fromWkt(s: String): Geometry = {
    val t = s.trim
    val body =
      if (t.regionMatches(true, 0, "SRID=", 0, 5)) {
        val semi = t.indexOf(';')
        if (semi < 0) throw new IllegalArgumentException(s"EWKT missing ';' after SRID: ${t.take(30)}")
        t.substring(semi + 1)
      } else t
    wktReader.get.read(body)
  }

  /** Hand-rolled WKT writer matching the reference's output style
   *  (st_astext.cpp + util/math.cpp format_coord): `TYPE [Z|M|ZM ]
   *  (...)`, MULTIPOINT without per-point parens (`MULTIPOINT (1 2,
   *  3 4)` — JTS's writer adds inner parens), `TYPE [TAG ]EMPTY`, and
   *  Ryu-style fixed-15 numbers (round to 15 decimals, trailing zeros
   *  trimmed, integral values without a decimal point). */
  def toWkt(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    appendWkt(g, sb)
    sb.toString
  }

  /** Double format equivalent to geos_d2sfixed_buffered_n(d, 15):
   *  SHORTEST round-trip decimal (Ryu semantics — what Double.toString
   *  produces) rendered in fixed notation, capped at 15 decimal
   *  places, trailing zeros trimmed, integral values without a point. */
  def fmtNum(d: Double): String = {
    if (d == Math.rint(d) && Math.abs(d) <= 9.007199254740992E15) {
      val l = d.toLong
      if (l == 0L && 1.0 / d < 0) "-0" else l.toString
    } else {
      val shortest = java.lang.Double.toString(d) // shortest round-trip
      val plain =
        if (shortest.indexOf('E') >= 0)
          new java.math.BigDecimal(shortest).stripTrailingZeros.toPlainString
        else shortest
      val dot = plain.indexOf('.')
      if (dot >= 0 && plain.length - dot - 1 > 15)
        new java.math.BigDecimal(d)
          .setScale(15, java.math.RoundingMode.HALF_EVEN)
          .stripTrailingZeros.toPlainString
      else plain
    }
  }

  private def dimTag(z: Boolean, m: Boolean): String =
    (z, m) match {
      case (true, true) => "ZM "
      case (true, false) => "Z "
      case (false, true) => "M "
      case _ => ""
    }

  private def appendCoord(c: Coordinate, z: Boolean, m: Boolean, sb: java.lang.StringBuilder): Unit = {
    sb.append(fmtNum(c.x)).append(' ').append(fmtNum(c.y))
    if (z) sb.append(' ').append(fmtNum(c.getZ))
    if (m) sb.append(' ').append(fmtNum(c.getM))
  }

  private def appendSeq(cs: CoordinateSequence, z: Boolean, m: Boolean, sb: java.lang.StringBuilder): Unit = {
    sb.append('(')
    var i = 0
    while (i < cs.size) {
      if (i > 0) sb.append(", ")
      appendCoord(cs.getCoordinate(i), z, m, sb)
      i += 1
    }
    sb.append(')')
  }

  private def appendPolyBody(p: Polygon, z: Boolean, m: Boolean, sb: java.lang.StringBuilder): Unit = {
    sb.append('(')
    appendSeq(p.getExteriorRing.getCoordinateSequence, z, m, sb)
    var r = 0
    while (r < p.getNumInteriorRing) {
      sb.append(", ")
      appendSeq(p.getInteriorRingN(r).getCoordinateSequence, z, m, sb)
      r += 1
    }
    sb.append(')')
  }

  private def appendWkt(g: Geometry, sb: java.lang.StringBuilder): Unit = {
    val z = hasZ(g); val m = hasM(g)
    val tag = dimTag(z, m)
    g match {
      case p: Point =>
        sb.append("POINT ").append(tag)
        if (p.isEmpty) sb.append("EMPTY")
        else { sb.append('('); appendCoord(p.getCoordinate, z, m, sb); sb.append(')') }
      case l: LineString =>
        sb.append("LINESTRING ").append(tag)
        if (l.isEmpty) sb.append("EMPTY") else appendSeq(l.getCoordinateSequence, z, m, sb)
      case p: Polygon =>
        sb.append("POLYGON ").append(tag)
        if (p.isEmpty) sb.append("EMPTY") else appendPolyBody(p, z, m, sb)
      // Multi*/collection EMPTY is decided by ELEMENT COUNT, not JTS
      // isEmpty (which is also true when every element is empty):
      // the reference writes MULTIPOINT (EMPTY) for a one-element
      // multi holding an empty point (st_multi.test).
      case mp: MultiPoint =>
        sb.append("MULTIPOINT ").append(tag)
        if (mp.getNumGeometries == 0) sb.append("EMPTY")
        else {
          sb.append('(')
          var i = 0
          while (i < mp.getNumGeometries) {
            if (i > 0) sb.append(", ")
            val pt = mp.getGeometryN(i).asInstanceOf[Point]
            if (pt.isEmpty) sb.append("EMPTY") else appendCoord(pt.getCoordinate, z, m, sb)
            i += 1
          }
          sb.append(')')
        }
      case ml: MultiLineString =>
        sb.append("MULTILINESTRING ").append(tag)
        if (ml.getNumGeometries == 0) sb.append("EMPTY")
        else {
          sb.append('(')
          var i = 0
          while (i < ml.getNumGeometries) {
            if (i > 0) sb.append(", ")
            val ls = ml.getGeometryN(i).asInstanceOf[LineString]
            if (ls.isEmpty) sb.append("EMPTY")
            else appendSeq(ls.getCoordinateSequence, z, m, sb)
            i += 1
          }
          sb.append(')')
        }
      case mp: MultiPolygon =>
        sb.append("MULTIPOLYGON ").append(tag)
        if (mp.getNumGeometries == 0) sb.append("EMPTY")
        else {
          sb.append('(')
          var i = 0
          while (i < mp.getNumGeometries) {
            if (i > 0) sb.append(", ")
            val poly = mp.getGeometryN(i).asInstanceOf[Polygon]
            if (poly.isEmpty) sb.append("EMPTY") else appendPolyBody(poly, z, m, sb)
            i += 1
          }
          sb.append(')')
        }
      case gc: GeometryCollection =>
        sb.append("GEOMETRYCOLLECTION ").append(tag)
        if (gc.getNumGeometries == 0) sb.append("EMPTY")
        else {
          sb.append('(')
          var i = 0
          while (i < gc.getNumGeometries) {
            if (i > 0) sb.append(", ")
            appendWkt(gc.getGeometryN(i), sb)
            i += 1
          }
          sb.append(')')
        }
    }
  }

  def point(x: Double, y: Double): Geometry = gf.createPoint(new Coordinate(x, y))
  def pointZ(x: Double, y: Double, z: Double): Geometry = gf.createPoint(new Coordinate(x, y, z))
  def pointZM(x: Double, y: Double, z: Double, m: Double): Geometry =
    gf.createPoint(new org.locationtech.jts.geom.CoordinateXYZM(x, y, z, m))

  def envelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry = {
    gf.createPolygon(Array(
      new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
      new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
      new Coordinate(xmin, ymin)))
  }

  def makeValid(g: Geometry): Geometry = GeometryFixer.fix(g)

  /** Like reference ST_Collect (st_collect.cpp): homogeneous input →
   *  MULTI*, mixed → GEOMETRYCOLLECTION, empty list → empty collection. */
  def collect(gs: Seq[Geometry]): Geometry = {
    val nonEmpty = gs.filterNot(_ == null)
    if (nonEmpty.isEmpty) gf.createGeometryCollection(Array.empty)
    else {
      val types = nonEmpty.map(_.getGeometryType).distinct
      if (types == Seq("Point")) gf.createMultiPoint(nonEmpty.map(_.asInstanceOf[Point]).toArray)
      else if (types == Seq("LineString")) gf.createMultiLineString(nonEmpty.map(_.asInstanceOf[LineString]).toArray)
      else if (types == Seq("Polygon")) gf.createMultiPolygon(nonEmpty.map(_.asInstanceOf[Polygon]).toArray)
      else gf.createGeometryCollection(nonEmpty.toArray)
    }
  }

  /** Uppercase SQL-style type tag, matching reference ST_GeometryType
   *  (st_geometrytype.cpp): POINT, LINESTRING, POLYGON, MULTIPOINT,
   *  MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION. */
  def typeTag(g: Geometry): String = g.getGeometryType.toUpperCase(java.util.Locale.ROOT)
}

/** Geodesic + spherical math (public formulas; reference uses
 *  GeographicLib — spatial/src/spatial/geographiclib/ — we port the
 *  standard published algorithms: haversine + Vincenty inverse). */
object Geodesy {
  val EarthRadius = 6371000.0 // mean radius, m (reference st_distance_sphere.cpp uses 6371000)
  val WGS84_A = 6378137.0
  val WGS84_F = 1.0 / 298.257223563
  val WGS84_B = WGS84_A * (1 - WGS84_F)

  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * EarthRadius * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Vincenty inverse geodesic distance on WGS84 (standard published
   *  algorithm; agrees with GeographicLib/Karney to sub-mm except in
   *  near-antipodal cases, where we fall back to haversine). */
  def vincenty(lon1d: Double, lat1d: Double, lon2d: Double, lat2d: Double): Double = {
    if (lon1d == lon2d && lat1d == lat2d) return 0.0
    val a = WGS84_A; val b = WGS84_B; val f = WGS84_F
    val L = math.toRadians(lon2d - lon1d)
    val U1 = math.atan((1 - f) * math.tan(math.toRadians(lat1d)))
    val U2 = math.atan((1 - f) * math.tan(math.toRadians(lat2d)))
    val sinU1 = math.sin(U1); val cosU1 = math.cos(U1)
    val sinU2 = math.sin(U2); val cosU2 = math.cos(U2)
    var lambda = L
    var lambdaP = 0.0
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    do {
      lambdaP = lambda
      val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
      sinSigma = math.sqrt(
        (cosU2 * sinLambda) * (cosU2 * sinLambda) +
          (cosU1 * sinU2 - sinU1 * cosU2 * cosLambda) * (cosU1 * sinU2 - sinU1 * cosU2 * cosLambda))
      if (sinSigma == 0) return 0.0
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0.0 else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val C = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
      lambda = L + (1 - C) * f * sinAlpha *
        (sigma + C * sinSigma * (cos2SigmaM + C * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      iter += 1
    } while (math.abs(lambda - lambdaP) > 1e-12 && iter < 200)
    if (iter >= 200) return haversine(lon1d, lat1d, lon2d, lat2d) // antipodal fallback
    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val A = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val B = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = B * sinSigma * (cos2SigmaM + B / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        B / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    b * A * (sigma - deltaSigma)
  }

  /** Geodesic length of a geometry's segments (sum of Vincenty legs). */
  def lengthSpheroid(g: Geometry): Double = {
    var total = 0.0
    var i = 0
    while (i < g.getNumGeometries) {
      val part = g.getGeometryN(i)
      part match {
        case l: LineString =>
          val cs = l.getCoordinateSequence
          var j = 1
          while (j < cs.size) {
            total += vincenty(cs.getX(j - 1), cs.getY(j - 1), cs.getX(j), cs.getY(j))
            j += 1
          }
        case p: Polygon =>
          total += lengthSpheroid(p.getExteriorRing)
          var r = 0
          while (r < p.getNumInteriorRing) { total += lengthSpheroid(p.getInteriorRingN(r)); r += 1 }
        case other if other.getNumGeometries > 1 => total += lengthSpheroid(other)
        case _ => ()
      }
      i += 1
    }
    total
  }

  /** Perimeter on the spheroid: only polygon rings contribute
   *  (reference st_perimeter_spheroid.cpp semantics). */
  def perimeterSpheroid(g: Geometry): Double = {
    var total = 0.0
    var i = 0
    while (i < g.getNumGeometries) {
      g.getGeometryN(i) match {
        case p: Polygon =>
          total += lengthSpheroid(p.getExteriorRing)
          var r = 0
          while (r < p.getNumInteriorRing) { total += lengthSpheroid(p.getInteriorRingN(r)); r += 1 }
        case other if other.getNumGeometries > 1 => total += perimeterSpheroid(other)
        case _ => ()
      }
      i += 1
    }
    total
  }

  /** Polygon area on the authalic sphere (spherical excess via
   *  l'Huilier over the WGS84 authalic radius). Close to GeographicLib
   *  ellipsoidal area for small/mid polygons. */
  private val AuthalicRadius = 6371007.1809
  def areaSpheroid(g: Geometry): Double = {
    var total = 0.0
    var i = 0
    while (i < g.getNumGeometries) {
      g.getGeometryN(i) match {
        case p: Polygon =>
          total += math.abs(ringArea(p.getExteriorRing))
          var r = 0
          while (r < p.getNumInteriorRing) { total -= math.abs(ringArea(p.getInteriorRingN(r))); r += 1 }
        case other if other.getNumGeometries > 1 => total += areaSpheroid(other)
        case _ => ()
      }
      i += 1
    }
    total
  }

  private def ringArea(ring: LineString): Double = {
    val cs = ring.getCoordinateSequence
    if (cs.size < 3) return 0.0
    var sum = 0.0
    var j = 0
    while (j < cs.size - 1) {
      val lam1 = math.toRadians(cs.getX(j)); val phi1 = math.toRadians(cs.getY(j))
      val lam2 = math.toRadians(cs.getX(j + 1)); val phi2 = math.toRadians(cs.getY(j + 1))
      sum += (lam2 - lam1) * (2 + math.sin(phi1) + math.sin(phi2))
      j += 1
    }
    math.abs(sum * AuthalicRadius * AuthalicRadius / 2.0)
  }
}

/** Hilbert curve encoding — port of the public-domain `hilbert_curves`
 *  algorithm the reference vendors (st_hilbert.cpp:17-110 cites
 *  github.com/rawrunprotected/hilbert_curves). 16 bits per dimension →
 *  one uint32 index, same as the reference. */
object HilbertCurve {
  // Interleave the lower 16 bits of x with zeros.
  private def interleave(x0: Int): Int = {
    var x = x0 & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    x
  }

  /** x,y in [0, 2^16) → hilbert d in [0, 2^32) returned as Long. */
  def xy2d(x0: Int, y0: Int): Long = {
    val x = x0 & 0xFFFF; val y = y0 & 0xFFFF
    // Initial prefix scan round, prime with x ^ y
    var a = x ^ y
    var b = 0xFFFF ^ a
    var c = 0xFFFF ^ (x | y)
    var d = x & (y ^ 0xFFFF)
    var A = a | (b >>> 1)
    var B = (a >>> 1) ^ a
    var C = ((c >>> 1) ^ (b & (d >>> 1))) ^ c
    var D = ((a & (c >>> 1)) ^ (d >>> 1)) ^ d
    a = A; b = B; c = C; d = D
    A = (a & (a >>> 2)) ^ (b & (b >>> 2))
    B = (a & (b >>> 2)) ^ (b & ((a ^ b) >>> 2))
    C ^= (a & (c >>> 2)) ^ (b & (d >>> 2))
    D ^= (b & (c >>> 2)) ^ ((a ^ b) & (d >>> 2))
    a = A; b = B; c = C; d = D
    A = (a & (a >>> 4)) ^ (b & (b >>> 4))
    B = (a & (b >>> 4)) ^ (b & ((a ^ b) >>> 4))
    C ^= (a & (c >>> 4)) ^ (b & (d >>> 4))
    D ^= (b & (c >>> 4)) ^ ((a ^ b) & (d >>> 4))
    a = A; b = B; c = C; d = D
    C ^= (a & (c >>> 8)) ^ (b & (d >>> 8))
    D ^= (b & (c >>> 8)) ^ ((a ^ b) & (d >>> 8))
    a = C ^ (C >>> 1)
    b = D ^ (D >>> 1)
    var i0 = x ^ y
    var i1 = b | (0xFFFF ^ (i0 | a))
    i0 = interleave(i0)
    i1 = interleave(i1)
    ((i1.toLong << 1) | i0.toLong) & 0xFFFFFFFFL
  }

  /** Map a point in [minx,maxx]×[miny,maxy] onto the 2^16 grid and
   *  encode (same normalization as reference st_hilbert.cpp:115-121:
   *  width = 65535/(maxx-minx), truncating cast). */
  def encode(x: Double, y: Double, minx: Double, miny: Double, maxx: Double, maxy: Double): Long = {
    val maxCell = 0xFFFF
    val w = maxCell / (maxx - minx)
    val h = maxCell / (maxy - miny)
    val xi = math.max(0, math.min(maxCell, ((x - minx) * w).toInt))
    val yi = math.max(0, math.min(maxCell, ((y - miny) * h).toInt))
    xy2d(xi, yi)
  }
}
