package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}

import graft.functions.Jts

/**
 * KML reader (OGC KML 2.2 / the Keyhole schema). The reference reads
 * KML through its GDAL bridge (reference `gdal/functions/st_read
 * .cpp:668-702`); GDAL's KML model is placemark-per-row with the
 * containing Folder/Document as the layer. Here the whole document
 * flattens to one row per `<Placemark>` with the folder PATH as a
 * column — `filter($"folder" === ...)` is the layer select, and a
 * predicate on a column is more Spark-idiomatic than N tiny per-folder
 * scans of the same unsplittable file.
 *
 * Columns: `folder` ("/"-joined Document/Folder name chain), `name`,
 * `description`, `geom` (WKB; Point/LineString/LinearRing/Polygon/
 * MultiGeometry, Z kept when the coordinate tuples carry altitude),
 * `ext` (map<string,string> of ExtendedData `Data`/`SimpleData`).
 *
 * Spark shape: like GPX, one KML document is one XML value — the file
 * is the unit of parallelism (directory fan-out via GeoRead.read's
 * plan-level union) and the in-task parse is streaming StAX, constant
 * memory. KML is WGS84 lon/lat by spec (OGC KML §9.1.2).
 */
object Kml {

  private val schema = StructType(Seq(
    StructField("folder", StringType), StructField("name", StringType),
    StructField("description", StringType), StructField("geom", BinaryType),
    StructField("ext", MapType(StringType, StringType))))

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

  private def parseFile(file: String): Iterator[Row] = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(file))
    val r = xmlFactory().createXMLStreamReader(in)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      // folder-name chain; a container pushes "" on entry, its <name>
      // (first one at container depth) overwrites the placeholder
      val chain = scala.collection.mutable.ArrayBuffer.empty[String]
      val containers = Set("Document", "Folder")
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case c if containers(c) => chain += ""
            // first <name> after container entry wins; later stray
            // <name>s (inside Style etc.) don't reassign the container
            case "name" if chain.nonEmpty && chain.last.isEmpty =>
              chain(chain.length - 1) = r.getElementText.trim
            case "Placemark" =>
              out += parsePlacemark(r, chain.filter(_.nonEmpty).mkString("/"))
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT =>
            if (containers(r.getLocalName) && chain.nonEmpty)
              chain.remove(chain.length - 1)
          case _ =>
        }
      }
      out.iterator
    } finally { r.close(); in.close() }
  }

  private val geomTags =
    Set("Point", "LineString", "LinearRing", "Polygon", "MultiGeometry")

  /** Entered ON START_ELEMENT of Placemark; leaves on its END_ELEMENT. */
  private def parsePlacemark(r: XMLStreamReader, folder: String): Row = {
    var name: String = null; var desc: String = null
    var geom: Geometry = null
    val ext = scala.collection.mutable.Map.empty[String, String]
    var done = false
    var depth = 0
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "name" if depth == 0        => name = r.getElementText.trim
          case "description" if depth == 0 => desc = r.getElementText.trim
          case g if geomTags(g)            => geom = parseGeometry(r, g)
          case "Data" => // <Data name="k"><value>v</value></Data>
            val k = attr(r, "name")
            val v = collectChildText(r, "Data", "value")
            if (k != null) ext(k) = v.getOrElse("")
          case "SimpleData" => // <SimpleData name="k">v</SimpleData>
            val k = attr(r, "name")
            val v = r.getElementText.trim
            if (k != null) ext(k) = v
          case _ => depth += 1
        }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "Placemark") done = true
          else if (depth > 0) depth -= 1
        case _ =>
      }
    }
    Row(folder, name, desc, if (geom == null) null else Jts.write(geom), ext.toMap)
  }

  /** Entered ON START_ELEMENT of `tag` (a geometry element); consumes
   *  through its END_ELEMENT and returns the JTS geometry (null when
   *  the element carries no coordinates). */
  private def parseGeometry(r: XMLStreamReader, tag: String): Geometry = tag match {
    case "Point" =>
      coordsUntil(r, "Point").headOption.map(Jts.gf.createPoint).orNull
    case "LineString" =>
      val cs = coordsUntil(r, "LineString")
      if (cs.length >= 2) Jts.gf.createLineString(cs.toArray) else null
    case "LinearRing" =>
      ring(coordsUntil(r, "LinearRing"))
    case "Polygon" =>
      // outerBoundaryIs/innerBoundaryIs each wrap a LinearRing
      var shell: LinearRing = null
      val holes = scala.collection.mutable.ArrayBuffer.empty[LinearRing]
      var inOuter = false
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "outerBoundaryIs" => inOuter = true
            case "innerBoundaryIs" => inOuter = false
            case "LinearRing" =>
              val lr = ring(coordsUntil(r, "LinearRing"))
              if (lr != null) { if (inOuter) shell = lr else holes += lr }
            case _ =>
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "Polygon" => done = true
          case _ =>
        }
      }
      if (shell == null) null else Jts.gf.createPolygon(shell, holes.toArray)
    case "MultiGeometry" =>
      val parts = scala.collection.mutable.ArrayBuffer.empty[Geometry]
      var done = false
      while (!done && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if geomTags(r.getLocalName) =>
            val g = parseGeometry(r, r.getLocalName)
            if (g != null) parts += g
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "MultiGeometry" => done = true
          case _ =>
        }
      }
      if (parts.isEmpty) null else Jts.collect(parts.toSeq)
    case _ => null
  }

  private def ring(cs: Seq[Coordinate]): LinearRing = {
    if (cs.length < 3) return null
    // KML rings repeat the first tuple last per spec; tolerate unclosed
    val closed = if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
    if (closed.length < 4) null else Jts.gf.createLinearRing(closed.toArray)
  }

  /** Consume through END_ELEMENT of `until`, returning the parsed
   *  <coordinates> tuples found inside: whitespace-separated
   *  "lon,lat[,alt]" triples (OGC KML §16.9). */
  private def coordsUntil(r: XMLStreamReader, until: String): Seq[Coordinate] = {
    var cs: Seq[Coordinate] = Seq.empty
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "coordinates" =>
          cs = parseCoordinates(r.getElementText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == until => done = true
        case _ =>
      }
    }
    cs
  }

  /** An explicit non-zero altitude makes the coordinate 3D; `,0`
   *  altitudes read as 2D — clampToGround producers emit `lon,lat,0`
   *  unconditionally, and promoting those to Z would turn every flat
   *  file into sham-3D geometry. */
  private def parseCoordinates(text: String): Seq[Coordinate] =
    text.trim.split("\\s+").toIndexedSeq.filter(_.nonEmpty).flatMap { tuple =>
      val p = tuple.split(",")
      if (p.length < 2) None
      else if (p.length >= 3 && p(2).trim.nonEmpty && p(2).trim.toDouble != 0.0)
        Some(new Coordinate(p(0).trim.toDouble, p(1).trim.toDouble, p(2).trim.toDouble))
      else Some(new Coordinate(p(0).trim.toDouble, p(1).trim.toDouble))
    }

  private def attr(r: XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** Collect the text of child `want` inside `until`; leaves the reader
   *  on END_ELEMENT of `until`. */
  private def collectChildText(r: XMLStreamReader, until: String,
      want: String): Option[String] = {
    var v: Option[String] = None
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == want =>
          v = Some(r.getElementText.trim)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == until => done = true
        case _ =>
      }
    }
    v
  }
}
