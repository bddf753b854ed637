package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom._

/** GeoJSON fragment reader/writer (reference: st_asgeojson.cpp — writer
 *  + yyjson-based parser). Jackson is already on the Spark classpath. */
object GeoJson {
  private val mapper = new ObjectMapper()

  def write(g: Geometry): String = {
    val sb = new java.lang.StringBuilder(64)
    writeGeom(g, sb)
    sb.toString
  }

  // reference (yyjson writer) keeps a trailing .0 on integral doubles —
  // `[0.0,0.0]`, not `[0,0]` (st_asgeojson.test); the WKT writer is the
  // one that strips it
  private def fmt(d: Double, sb: java.lang.StringBuilder): Unit = {
    if (d == math.floor(d) && math.abs(d) < 1e15) sb.append(d.toLong).append(".0") else sb.append(d)
  }

  private def writeCoord(c: Coordinate, sb: java.lang.StringBuilder): Unit = {
    sb.append('[');
    fmt(c.x, sb); sb.append(','); fmt(c.y, sb)
    if (!java.lang.Double.isNaN(c.getZ)) { sb.append(','); fmt(c.getZ, sb) }
    sb.append(']')
  }

  private def writeCoords(cs: CoordinateSequence, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < cs.size) {
      if (i > 0) sb.append(',')
      writeCoord(cs.getCoordinate(i), sb)
      i += 1
    }
    sb.append(']')
  }

  private def writeRings(p: Polygon, sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    writeCoords(p.getExteriorRing.getCoordinateSequence, sb)
    for (i <- 0 until p.getNumInteriorRing) {
      sb.append(',')
      writeCoords(p.getInteriorRingN(i).getCoordinateSequence, sb)
    }
    sb.append(']')
  }

  private def writeGeom(g: Geometry, sb: java.lang.StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("{\"type\":\"Point\",\"coordinates\":")
      if (p.isEmpty) sb.append("[]") else writeCoord(p.getCoordinate, sb)
      sb.append('}')
    case l: LineString =>
      sb.append("{\"type\":\"LineString\",\"coordinates\":")
      writeCoords(l.getCoordinateSequence, sb)
      sb.append('}')
    case p: Polygon =>
      sb.append("{\"type\":\"Polygon\",\"coordinates\":")
      if (p.isEmpty) sb.append("[]") else writeRings(p, sb)
      sb.append('}')
    case m: MultiPoint =>
      sb.append("{\"type\":\"MultiPoint\",\"coordinates\":[")
      for (i <- 0 until m.getNumGeometries) {
        if (i > 0) sb.append(',')
        writeCoord(m.getGeometryN(i).getCoordinate, sb)
      }
      sb.append("]}")
    case m: MultiLineString =>
      sb.append("{\"type\":\"MultiLineString\",\"coordinates\":[")
      for (i <- 0 until m.getNumGeometries) {
        if (i > 0) sb.append(',')
        writeCoords(m.getGeometryN(i).asInstanceOf[LineString].getCoordinateSequence, sb)
      }
      sb.append("]}")
    case m: MultiPolygon =>
      sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
      for (i <- 0 until m.getNumGeometries) {
        if (i > 0) sb.append(',')
        writeRings(m.getGeometryN(i).asInstanceOf[Polygon], sb)
      }
      sb.append("]}")
    case c: GeometryCollection =>
      sb.append("{\"type\":\"GeometryCollection\",\"geometries\":[")
      for (i <- 0 until c.getNumGeometries) {
        if (i > 0) sb.append(',')
        writeGeom(c.getGeometryN(i), sb)
      }
      sb.append("]}")
  }

  def parse(json: String): Geometry = node2geom(mapper.readTree(json))

  private def coord(n: JsonNode): Coordinate = {
    if (n.size() > 2) new Coordinate(n.get(0).asDouble, n.get(1).asDouble, n.get(2).asDouble)
    else new Coordinate(n.get(0).asDouble, n.get(1).asDouble)
  }
  private def coords(n: JsonNode): Array[Coordinate] =
    (0 until n.size()).map(i => coord(n.get(i))).toArray
  private def ring(n: JsonNode): LinearRing = Jts.gf.createLinearRing(coords(n))
  private def polygon(n: JsonNode): Polygon = {
    if (n.size() == 0) Jts.gf.createPolygon()
    else Jts.gf.createPolygon(ring(n.get(0)), (1 until n.size()).map(i => ring(n.get(i))).toArray)
  }

  private def node2geom(n: JsonNode): Geometry = {
    val tNode = n.get("type")
    if (tNode == null) throw new IllegalArgumentException(
      s"geometry has no GeoJSON 'type' and no ESRI JSON form: ${n.toString.take(80)}")
    val t = tNode.asText
    lazy val cs = n.get("coordinates")
    t match {
      case "Point" =>
        if (cs.size() == 0) Jts.gf.createPoint() else Jts.gf.createPoint(coord(cs))
      case "LineString" => Jts.gf.createLineString(coords(cs))
      case "Polygon" => polygon(cs)
      case "MultiPoint" =>
        Jts.gf.createMultiPoint(coords(cs).map(Jts.gf.createPoint))
      case "MultiLineString" =>
        Jts.gf.createMultiLineString((0 until cs.size()).map(i => Jts.gf.createLineString(coords(cs.get(i)))).toArray)
      case "MultiPolygon" =>
        Jts.gf.createMultiPolygon((0 until cs.size()).map(i => polygon(cs.get(i))).toArray)
      case "GeometryCollection" =>
        val gs = n.get("geometries")
        Jts.gf.createGeometryCollection((0 until gs.size()).map(i => node2geom(gs.get(i))).toArray)
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }
}

/**
 * ESRI JSON geometry reader — the ArcGIS REST FeatureSet geometry
 * forms (published spec; GDAL ships this as the read-only ESRIJSON
 * driver, which the reference reaches through ST_Read). Forms:
 *
 *   {"x":…,"y":…[,"z":…]}          point ("x":null → empty point)
 *   {"points":[[x,y],…]}           multipoint
 *   {"paths":[[[x,y],…],…]}        one path → LINESTRING, else
 *                                  MULTILINESTRING (OGR's mapping)
 *   {"rings":[[[x,y],…],…]}        ring soup: CLOCKWISE rings are
 *                                  shells per the ESRI spec,
 *                                  counter-clockwise rings are holes
 *                                  assigned to the first shell that
 *                                  contains them (orphan holes promote
 *                                  to shells, OGR organizePolygons
 *                                  fallback); one shell → POLYGON,
 *                                  else MULTIPOLYGON
 *
 * No `"type"` key exists in any ESRI geometry — that is the sniff
 * ([[looksLike]]) separating this from GeoJSON in a shared `.json`
 * extension, the same content dispatch GDAL performs.
 */
object EsriJson {
  private def pt(n: JsonNode): Coordinate =
    new Coordinate(n.get(0).asDouble, n.get(1).asDouble)
  private def line(n: JsonNode): Array[Coordinate] =
    (0 until n.size()).map(i => pt(n.get(i))).toArray

  def looksLike(n: JsonNode): Boolean =
    n != null && n.isObject && !n.has("type") &&
      (n.has("rings") || n.has("paths") || n.has("points") ||
        // empty point is {"x": null} with or without a "y" key
        (n.has("x") && (n.has("y") || n.get("x").isNull)))

  /** Signed shoelace area: negative = clockwise (an ESRI shell). */
  private def signedArea(cs: Array[Coordinate]): Double = {
    var a = 0.0
    var i = 0
    while (i < cs.length - 1) {
      a += cs(i).x * cs(i + 1).y - cs(i + 1).x * cs(i).y
      i += 1
    }
    a / 2.0
  }

  def parse(n: JsonNode): Geometry = {
    if (n.has("x")) {
      val x = n.get("x")
      if (x.isNull) Jts.gf.createPoint()
      else {
        val y = n.get("y")
        if (y == null || y.isNull) throw new IllegalArgumentException(
          s"ESRI JSON point with non-null x but no y: ${n.toString.take(80)}")
        Jts.gf.createPoint(new Coordinate(x.asDouble, y.asDouble))
      }
    } else if (n.has("points")) {
      val ps = n.get("points")
      Jts.gf.createMultiPoint(line(ps).map(Jts.gf.createPoint))
    } else if (n.has("paths")) {
      val ps = n.get("paths")
      val lines = (0 until ps.size()).map(i => Jts.gf.createLineString(line(ps.get(i))))
      if (lines.size == 1) lines.head else Jts.gf.createMultiLineString(lines.toArray)
    } else if (n.has("rings")) {
      val rs = n.get("rings")
      val rings = (0 until rs.size()).map { i =>
        val cs = line(rs.get(i))
        if (cs.length < 3) throw new IllegalArgumentException(
          s"ESRI JSON polygon ring $i has ${cs.length} points (need >= 3): ${n.toString.take(80)}")
        // rings must close for JTS; the ESRI spec closes them already
        val closed = if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
        if (closed.length < 4) throw new IllegalArgumentException(
          s"ESRI JSON polygon ring $i degenerates to ${closed.length} closed points: ${n.toString.take(80)}")
        (Jts.gf.createLinearRing(closed), signedArea(closed))
      }
      val shells = scala.collection.mutable.ArrayBuffer[LinearRing]()
      val holes = scala.collection.mutable.ArrayBuffer[LinearRing]()
      rings.foreach { case (r, a) => if (a < 0) shells += r else holes += r }
      val shellPolys = shells.map(Jts.gf.createPolygon(_))
      val holesByShell = scala.collection.mutable.ArrayBuffer.fill(shells.length)(
        scala.collection.mutable.ArrayBuffer[LinearRing]())
      holes.foreach { h =>
        val p0 = Jts.gf.createPoint(h.getCoordinateN(0))
        // the SMALLEST containing shell owns the hole (island-in-lake:
        // a hole inside an inner island must bind to the island, not
        // the outer shell that also covers it — GDAL organizePolygons'
        // innermost-enclosing rule)
        val candidates = shellPolys.indices.filter(i => shellPolys(i).covers(p0))
        if (candidates.isEmpty) {
          val rr = reverse(h)
          shells += rr; shellPolys += Jts.gf.createPolygon(rr)
          holesByShell += scala.collection.mutable.ArrayBuffer[LinearRing]()
        } else holesByShell(candidates.minBy(i => shellPolys(i).getArea)) += h
      }
      val polys = shells.indices.map(i =>
        Jts.gf.createPolygon(shells(i), holesByShell(i).toArray))
      if (polys.size == 1) polys.head else Jts.gf.createMultiPolygon(polys.toArray)
    } else throw new IllegalArgumentException(
      s"not an ESRI JSON geometry: ${n.toString.take(80)}")
  }

  private def reverse(r: LinearRing): LinearRing =
    Jts.gf.createLinearRing(r.getCoordinates.reverse)
}

/** Minimal SVG path writer (reference st_assvg.cpp; PostGIS-style:
 *  y axis negated, points → cx/cy, lines/polygons → path data). */
object Svg {
  def write(g: Geometry, rel: Boolean, precision: Int): String = {
    val sb = new java.lang.StringBuilder
    val p = math.max(0, math.min(15, precision))
    def f(d: Double): String = {
      val bd = BigDecimal(d).setScale(p, BigDecimal.RoundingMode.HALF_UP)
      val s = bd.bigDecimal.stripTrailingZeros.toPlainString
      if (s == "-0") "0" else s
    }
    def path(cs: Array[Coordinate], close: Boolean): Unit = {
      var i = 0
      while (i < cs.length) {
        if (i == 0) { sb.append("M ").append(f(cs(0).x)).append(' ').append(f(-cs(0).y)) }
        else {
          if (i == 1) sb.append(if (rel) " l" else " L")
          if (rel) sb.append(' ').append(f(cs(i).x - cs(i - 1).x)).append(' ').append(f(-(cs(i).y - cs(i - 1).y)))
          else sb.append(' ').append(f(cs(i).x)).append(' ').append(f(-cs(i).y))
        }
        i += 1
      }
      if (close) sb.append(" Z")
    }
    def writeOne(geom: Geometry): Unit = geom match {
      case pt: Point if !pt.isEmpty =>
        if (rel) sb.append("x=\"").append(f(pt.getX)).append("\" y=\"").append(f(-pt.getY)).append('"')
        else sb.append("cx=\"").append(f(pt.getX)).append("\" cy=\"").append(f(-pt.getY)).append('"')
      case l: LineString => path(l.getCoordinates, close = false)
      case poly: Polygon if !poly.isEmpty =>
        path(poly.getExteriorRing.getCoordinates.dropRight(1), close = true)
        for (i <- 0 until poly.getNumInteriorRing) {
          sb.append(' ')
          path(poly.getInteriorRingN(i).getCoordinates.dropRight(1), close = true)
        }
      case coll =>
        for (i <- 0 until coll.getNumGeometries) {
          if (i > 0) sb.append(';')
          writeOne(coll.getGeometryN(i))
        }
    }
    writeOne(g)
    sb.toString
  }
}
