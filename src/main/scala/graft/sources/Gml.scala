package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, LineString, Point, Polygon}

import graft.functions.Jts

/**
 * GML reader (OGC Geography Markup Language 2.1/3.x simple features —
 * the WFS payload format). The reference reads GML through its GDAL
 * bridge (reference `gdal/functions/st_read.cpp:668-702`); GDAL's GML
 * model is feature-per-row with the feature element name as the
 * layer. Here the whole document flattens to one row per feature
 * member with the element name as a `layer` column —
 * `filter($"layer" === ...)` is the layer select, same design as
 * [[Kml]]'s folder column.
 *
 * Columns: `layer` (feature element local name), `fid` (`gml:id` or
 * GML2 `fid` attribute), `geom` (WKB), `srs` (normalized "EPSG:n"
 * from the first srsName seen on the feature's geometry), `props`
 * (map<string,string> of simple text-only child elements).
 *
 * Geometry support: Point/LineString/LinearRing/Polygon/Curve
 * (LineStringSegment concatenation), MultiPoint/MultiCurve/
 * MultiLineString/MultiSurface/MultiPolygon/MultiGeometry, with
 * GML3 `pos`/`posList` (srsDimension honored) and GML2
 * `coordinates` (cs/ts separators; explicit non-zero altitude
 * promotes to Z, same rule as [[Kml]]). Coordinates are read in
 * document order — axis normalization for urn-style lat/lon CRSs is
 * a transform-layer concern (`st_transform` / `st_flipcoordinates`),
 * not silently applied at parse time.
 *
 * Spark shape: like GPX/KML, one GML document is one XML value — the
 * file is the unit of parallelism (directory fan-out via
 * GeoRead.read's plan-level union) and the in-task parse is
 * streaming StAX, constant memory.
 */
object Gml {

  private val schema = StructType(Seq(
    StructField("layer", StringType), StructField("fid", StringType),
    StructField("geom", BinaryType), StructField("srs", StringType),
    StructField("props", MapType(StringType, StringType))))

  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(Seq(path), 1)
      .flatMap(parseFile)
    spark.createDataFrame(rows, schema)
  }

  private def xmlFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f
  }

  /** Wrappers whose next child element is a feature. `featureMembers`
   *  (GML 3.1 plural form) holds several features directly. */
  private val memberTags = Set("featureMember", "featureMembers", "member")

  private def parseFile(file: String): Iterator[Row] = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(file))
    val r = xmlFactory().createXMLStreamReader(in)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var memberDepth = -1 // >=0 while inside a member wrapper
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val n = r.getLocalName
            if (memberTags(n)) memberDepth = 0
            else if (memberDepth == 0) {
              // the feature root itself; parseFeature consumes it
              out += parseFeature(r, n)
              // stay at memberDepth 0: featureMembers may hold more
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (memberTags(r.getLocalName)) memberDepth = -1
          case _ =>
        }
      }
      out.iterator
    } finally { r.close(); in.close() }
  }

  private val geomTags = Set(
    "Point", "LineString", "LinearRing", "Polygon", "Curve",
    "MultiPoint", "MultiCurve", "MultiLineString", "MultiSurface",
    "MultiPolygon", "MultiGeometry")

  /** Entered ON START_ELEMENT of the feature root; consumes through
   *  its END_ELEMENT. Direct children with text-only content become
   *  props; the first geometry found anywhere below becomes `geom`. */
  private def parseFeature(r: XMLStreamReader, layer: String): Row = {
    val fid = {
      val gmlId = attr(r, "id")
      if (gmlId != null) gmlId else attr(r, "fid")
    }
    var geom: Geometry = null
    var srs: String = null
    val props = scala.collection.mutable.Map.empty[String, String]
    var depth = 0
    var propName: String = null
    var propHadChild = false
    val text = new StringBuilder
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val n = r.getLocalName
          if (geomTags(n)) {
            if (srs == null) srs = normalizeSrs(attr(r, "srsName"))
            val g = parseGeometry(r, n)
            if (geom == null && g != null) geom = g
            if (depth >= 1) propHadChild = true
            // parseGeometry consumed through END_ELEMENT: depth unchanged
          } else {
            depth += 1
            if (depth == 1) { propName = n; text.clear(); propHadChild = false }
            else propHadChild = true
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (depth == 1) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          if (depth == 0) done = true
          else {
            if (depth == 1 && propName != null && !propHadChild) {
              val t = text.toString.trim
              if (t.nonEmpty) props(propName) = t
            }
            depth -= 1
          }
        case _ =>
      }
    }
    Row(layer, fid, if (geom == null) null else Jts.write(geom), srs, props.toMap)
  }

  /** "EPSG:4326", "urn:ogc:def:crs:EPSG::4326",
   *  "http://www.opengis.net/def/crs/EPSG/0/4326" → "EPSG:4326";
   *  anything without a recognizable EPSG code stays verbatim. */
  private[sources] def normalizeSrs(s: String): String = {
    if (s == null) return null
    val m = java.util.regex.Pattern
      .compile("(?i)epsg.*?([0-9]+)\\s*$").matcher(s.trim)
    if (m.find()) "EPSG:" + m.group(1) else s.trim
  }

  /** Entered ON START_ELEMENT of `tag`; consumes through END_ELEMENT
   *  of `tag` and returns the JTS geometry (null when degenerate). */
  private def parseGeometry(r: XMLStreamReader, tag: String): Geometry = tag match {
    case "Point" =>
      coordsUntil(r, "Point").headOption.map(Jts.gf.createPoint).orNull
    case "LineString" =>
      val cs = coordsUntil(r, "LineString")
      if (cs.length >= 2) Jts.gf.createLineString(cs.toArray) else null
    case "LinearRing" =>
      ring(coordsUntil(r, "LinearRing"))
    case "Curve" =>
      // segments/LineStringSegment children concatenate into one line
      val cs = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
      scanChildren(r, "Curve") { n =>
        if (n == "LineStringSegment") {
          val seg = coordsUntil(r, "LineStringSegment")
          // adjacent segments share their boundary vertex
          cs ++= (if (cs.nonEmpty && seg.nonEmpty && seg.head.equals2D(cs.last)) seg.tail else seg)
          true
        } else false
      }
      if (cs.length >= 2) Jts.gf.createLineString(cs.toArray) else null
    case "Polygon" =>
      var shell: LinearRing = null
      val holes = scala.collection.mutable.ArrayBuffer.empty[LinearRing]
      var inExterior = false
      scanChildren(r, "Polygon") {
        case "exterior" | "outerBoundaryIs" => inExterior = true; false
        case "interior" | "innerBoundaryIs" => inExterior = false; false
        case "LinearRing" =>
          val lr = ring(coordsUntil(r, "LinearRing"))
          if (lr != null) { if (inExterior) shell = lr else holes += lr }
          true
        case _ => false
      }
      if (shell == null) null else Jts.gf.createPolygon(shell, holes.toArray)
    case "MultiPoint" =>
      val parts = collectParts(r, "MultiPoint", Set("Point"))
      if (parts.isEmpty) null
      else Jts.gf.createMultiPoint(parts.collect { case p: Point => p }.toArray)
    case "MultiCurve" | "MultiLineString" =>
      val parts = collectParts(r, tag, Set("LineString", "Curve"))
      if (parts.isEmpty) null
      else Jts.gf.createMultiLineString(parts.collect { case l: LineString => l }.toArray)
    case "MultiSurface" | "MultiPolygon" =>
      val parts = collectParts(r, tag, Set("Polygon"))
      if (parts.isEmpty) null
      else Jts.gf.createMultiPolygon(parts.collect { case p: Polygon => p }.toArray)
    case "MultiGeometry" =>
      val parts = collectParts(r, "MultiGeometry", geomTags)
      if (parts.isEmpty) null else Jts.collect(parts.toSeq)
    case _ => null
  }

  /** Scan events until END_ELEMENT of `until`; `onStart` returns true
   *  when it consumed the element itself (reader already past it). */
  private def scanChildren(r: XMLStreamReader, until: String)(onStart: String => Boolean): Unit = {
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => onStart(r.getLocalName)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == until => done = true
        case _ =>
      }
    }
  }

  private def collectParts(r: XMLStreamReader, until: String,
      wanted: Set[String]): Seq[Geometry] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    scanChildren(r, until) { n =>
      if (wanted(n)) {
        val g = parseGeometry(r, n)
        if (g != null) parts += g
        true
      } else false
    }
    parts.toSeq
  }

  private def ring(cs: Seq[Coordinate]): LinearRing = {
    if (cs.length < 3) return null
    val closed = if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
    if (closed.length < 4) null else Jts.gf.createLinearRing(closed.toArray)
  }

  /** Consume through END_ELEMENT of `until`, accumulating coordinates
   *  from `posList` (srsDimension honored), repeated `pos`, or GML2
   *  `coordinates` found inside. */
  private def coordsUntil(r: XMLStreamReader, until: String): Seq[Coordinate] = {
    val cs = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "posList" =>
            val dim = {
              val d = attr(r, "srsDimension")
              if (d == null) 2 else d.trim.toInt
            }
            val toks = r.getElementText.trim.split("\\s+").filter(_.nonEmpty)
            toks.grouped(dim).foreach { g =>
              if (g.length >= 2)
                cs += (if (dim >= 3 && g.length >= 3)
                  new Coordinate(g(0).toDouble, g(1).toDouble, g(2).toDouble)
                else new Coordinate(g(0).toDouble, g(1).toDouble))
            }
          case "pos" =>
            val p = r.getElementText.trim.split("\\s+").filter(_.nonEmpty)
            if (p.length >= 3) cs += new Coordinate(p(0).toDouble, p(1).toDouble, p(2).toDouble)
            else if (p.length == 2) cs += new Coordinate(p(0).toDouble, p(1).toDouble)
          case "coordinates" =>
            val csAttr = { val a = attr(r, "cs"); if (a == null) "," else a }
            val tsAttr = { val a = attr(r, "ts"); if (a == null) " " else a }
            r.getElementText.trim
              .split(java.util.regex.Pattern.quote(tsAttr) + "|\\s+")
              .filter(_.nonEmpty).foreach { tuple =>
                val p = tuple.split(java.util.regex.Pattern.quote(csAttr))
                if (p.length >= 2) {
                  // explicit non-zero altitude promotes to Z (same
                  // clampToGround rationale as the KML reader)
                  if (p.length >= 3 && p(2).trim.nonEmpty && p(2).trim.toDouble != 0.0)
                    cs += new Coordinate(p(0).trim.toDouble, p(1).trim.toDouble, p(2).trim.toDouble)
                  else cs += new Coordinate(p(0).trim.toDouble, p(1).trim.toDouble)
                }
              }
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == until => done = true
        case _ =>
      }
    }
    cs.toSeq
  }

  private def attr(r: XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  // ---- writer ------------------------------------------------------------

  /**
   * GML writer (GDAL can_create parity for the GML driver, reference
   * `gdal/functions/st_write.cpp:558-569`): GML3 simple features —
   * `gml:FeatureCollection` of `gml:featureMember`-wrapped features,
   * geometry as `gml:pos`/`gml:posList` (srsDimension=3 when Z is
   * present). Column mapping mirrors [[read]]'s output so
   * read→write→read is lossless: a `layer` column names the feature
   * element (default "feature"), `fid` becomes `gml:id`, `srs` the
   * geometry's `srsName`, a map<string,string> column (the reader's
   * `props`) expands to one child element per entry, and every other
   * column becomes a text child element. Single-file format — rows
   * stream through the driver (same [[DriverSink]] contract as KML).
   */
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    DriverSink.guard(df, "GML", "GeoJSON NDJSON / GeoParquet (cluster-parallel)")
    val cols = df.columns
    val gi = df.schema.fieldIndex(geomCol)
    val li = cols.indexOf("layer")
    val fi = cols.indexOf("fid")
    val si = cols.indexOf("srs")
    val mapIdx = df.schema.fields.zipWithIndex.collect {
      case (StructField(_, MapType(StringType, StringType, _), _, _), i) if i != gi => i
    }.toSet
    val propIdx = cols.indices.filter(i =>
      i != gi && i != li && i != fi && i != si && !mapIdx(i))
    val out = java.nio.file.Files.newBufferedWriter(
      java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
    try {
      out.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      out.write("<gml:FeatureCollection xmlns:gml=\"http://www.opengis.net/gml\">\n")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val layer = if (li >= 0 && !row.isNullAt(li)) xmlName(row.get(li).toString) else "feature"
        val fid = if (fi >= 0 && !row.isNullAt(fi)) row.get(fi).toString else null
        val srs = if (si >= 0 && !row.isNullAt(si)) row.get(si).toString else null
        out.write("<gml:featureMember><" + layer)
        if (fid != null) out.write(" gml:id=\"" + esc(fid) + "\"")
        out.write(">")
        propIdx.foreach { i =>
          if (!row.isNullAt(i)) {
            val n = xmlName(cols(i))
            out.write("<" + n + ">" + esc(row.get(i).toString) + "</" + n + ">")
          }
        }
        mapIdx.toSeq.sorted.foreach { i =>
          if (!row.isNullAt(i)) {
            row.getMap[String, String](i).toSeq.sortBy(_._1).foreach { case (k, v) =>
              val n = xmlName(k)
              out.write("<" + n + ">" + esc(v) + "</" + n + ">")
            }
          }
        }
        if (!row.isNullAt(gi)) writeGeom(out, Jts.read(row.getAs[Array[Byte]](gi)), srs)
        out.write("</" + layer + "></gml:featureMember>\n")
      }
      out.write("</gml:FeatureCollection>\n")
    } finally out.close()
  }

  private def writeGeom(out: java.io.Writer, g: Geometry, srs: String): Unit = {
    val srsAttr = if (srs == null) "" else " srsName=\"" + esc(srs) + "\""
    def fmt(d: Double): String =
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    def posOf(c: Coordinate): String =
      if (java.lang.Double.isNaN(c.getZ)) fmt(c.x) + " " + fmt(c.y)
      else fmt(c.x) + " " + fmt(c.y) + " " + fmt(c.getZ)
    def posList(cs: Array[Coordinate]): String = {
      val dim = if (cs.exists(c => !java.lang.Double.isNaN(c.getZ))) 3 else 2
      val body = cs.map { c =>
        if (dim == 3) fmt(c.x) + " " + fmt(c.y) + " " +
          fmt(if (java.lang.Double.isNaN(c.getZ)) 0.0 else c.getZ)
        else fmt(c.x) + " " + fmt(c.y)
      }.mkString(" ")
      "<gml:posList srsDimension=\"" + dim + "\">" + body + "</gml:posList>"
    }
    def ringXml(r: LineString): String =
      "<gml:LinearRing>" + posList(r.getCoordinates) + "</gml:LinearRing>"
    def one(g: Geometry, withSrs: Boolean): String = {
      val a = if (withSrs) srsAttr else ""
      g match {
        case p: Point =>
          "<gml:Point" + a + "><gml:pos>" + posOf(p.getCoordinate) + "</gml:pos></gml:Point>"
        case l: LineString =>
          "<gml:LineString" + a + ">" + posList(l.getCoordinates) + "</gml:LineString>"
        case p: Polygon =>
          val holes = (0 until p.getNumInteriorRing).map(i =>
            "<gml:interior>" + ringXml(p.getInteriorRingN(i)) + "</gml:interior>").mkString
          "<gml:Polygon" + a + "><gml:exterior>" + ringXml(p.getExteriorRing) +
            "</gml:exterior>" + holes + "</gml:Polygon>"
        case m: org.locationtech.jts.geom.MultiPoint =>
          "<gml:MultiPoint" + a + ">" + (0 until m.getNumGeometries).map(i =>
            "<gml:pointMember>" + one(m.getGeometryN(i), withSrs = false) + "</gml:pointMember>")
            .mkString + "</gml:MultiPoint>"
        case m: org.locationtech.jts.geom.MultiLineString =>
          "<gml:MultiLineString" + a + ">" + (0 until m.getNumGeometries).map(i =>
            "<gml:lineStringMember>" + one(m.getGeometryN(i), withSrs = false) +
              "</gml:lineStringMember>").mkString + "</gml:MultiLineString>"
        case m: org.locationtech.jts.geom.MultiPolygon =>
          "<gml:MultiPolygon" + a + ">" + (0 until m.getNumGeometries).map(i =>
            "<gml:polygonMember>" + one(m.getGeometryN(i), withSrs = false) +
              "</gml:polygonMember>").mkString + "</gml:MultiPolygon>"
        case c: org.locationtech.jts.geom.GeometryCollection =>
          "<gml:MultiGeometry" + a + ">" + (0 until c.getNumGeometries).map(i =>
            "<gml:geometryMember>" + one(c.getGeometryN(i), withSrs = false) +
              "</gml:geometryMember>").mkString + "</gml:MultiGeometry>"
        case other => throw new IllegalArgumentException(
          s"GML writer: unsupported geometry ${other.getGeometryType}")
      }
    }
    out.write(one(g, withSrs = true))
  }

  /** XML element-name guard: column names pass through only when they
   *  are valid NCNames (no namespace-colon games); anything else maps
   *  to an underscore-mangled safe name. */
  private def xmlName(s: String): String = {
    val ok = s.nonEmpty && (s.charAt(0).isLetter || s.charAt(0) == '_') &&
      s.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.')
    if (ok) s else "_" + s.map(c =>
      if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '_')
  }

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c => b.append(c)
    }
    b.toString
  }
}
