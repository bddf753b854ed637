package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry}

import graft.functions.Jts

/**
 * GPX reader (GPS Exchange Format 1.0/1.1 — the Topografix XML schema).
 * The reference reads GPX through its GDAL bridge (reference
 * `gdal/functions/st_read.cpp:668-702` lists the driver); GDAL's GPX
 * model is five layers over one document — `waypoints`, `routes`,
 * `tracks`, `route_points`, `track_points` — and that is the model
 * exposed here via `st_read(path, layer := ...)`.
 *
 * Spark shape: a GPX document is one XML value (not splittable), so the
 * unit of parallelism is the FILE — a directory of .gpx files fans out
 * one task per file, the common shape for GPS corpora (one device-day
 * per file). Within a task the parse is streaming StAX (constant
 * memory, no DOM), so a single multi-GB track log still reads without
 * materializing the document. Like the other single-file containers
 * (.shp/.gpkg) the path must be on a filesystem all executors see.
 *
 * Layer schemas follow GDAL's field model for the common attributes
 * (`ele`/`time`/`name`/`cmt`/`desc`/`sym`/`type`, route/track `number`);
 * `*_fid` ordinals are per-file, in document order. Geometries are 2D
 * WKB — elevation stays in the `ele` field, matching GDAL's treatment
 * of GPX (the schema keeps lat/lon as attributes and ele as a child
 * element, so the field is the faithful carrier).
 */
object Gpx {

  val layers = Seq("waypoints", "routes", "tracks", "route_points", "track_points")

  private def strField(n: String) = StructField(n, StringType)
  private val waypointSchema = StructType(Seq(
    StructField("geom", BinaryType), StructField("ele", DoubleType),
    strField("time"), strField("name"), strField("cmt"), strField("desc"),
    strField("sym"), strField("type")))
  private val routeSchema = StructType(Seq(
    StructField("geom", BinaryType), strField("name"), strField("cmt"),
    strField("desc"), StructField("number", IntegerType)))
  private val trackSchema = routeSchema
  private val routePointSchema = StructType(Seq(
    StructField("route_fid", IntegerType), StructField("route_point_id", IntegerType),
    StructField("geom", BinaryType), StructField("ele", DoubleType),
    strField("time"), strField("name")))
  private val trackPointSchema = StructType(Seq(
    StructField("track_fid", IntegerType), StructField("track_seg_id", IntegerType),
    StructField("track_seg_point_id", IntegerType),
    StructField("geom", BinaryType), StructField("ele", DoubleType), strField("time")))

  def schemaOf(layer: String): StructType = layer match {
    case "waypoints"    => waypointSchema
    case "routes"       => routeSchema
    case "tracks"       => trackSchema
    case "route_points" => routePointSchema
    case "track_points" => trackPointSchema
    case other => throw new IllegalArgumentException(
      s"unknown GPX layer '$other' (expected one of: ${layers.mkString(", ")})")
  }

  def read(spark: SparkSession, path: String, layer: String): DataFrame = {
    val schema = schemaOf(layer) // validates the layer name driver-side
    // one task per file; a DIRECTORY of .gpx files fans out via
    // GeoRead.read's plan-level union, same as .shp/.fgb
    val rows = spark.sparkContext
      .parallelize(Seq(path), 1)
      .flatMap(f => parseFile(f, layer))
    spark.createDataFrame(rows, schema)
  }

  // ---- streaming parse ---------------------------------------------------

  /** Hardened StAX factory: DTDs and external entities off (a GPX file
   *  is data, not a document type we trust). */
  private def xmlFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    f
  }

  private def parseFile(file: String, layer: String): Iterator[Row] = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(file))
    val r = xmlFactory().createXMLStreamReader(in)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var rteFid = -1; var trkFid = -1
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) r.getLocalName match {
          case "wpt" =>
            val (lat, lon) = latLon(r)
            val m = childText(r, "wpt", Set("ele", "time", "name", "cmt", "desc", "sym", "type"))
            if (layer == "waypoints") out += Row(
              Jts.write(Jts.point(lon, lat)),
              m.get("ele").map(v => Double.box(v.toDouble)).orNull,
              m.getOrElse("time", null), m.getOrElse("name", null), m.getOrElse("cmt", null),
              m.getOrElse("desc", null), m.getOrElse("sym", null), m.getOrElse("type", null))
          case "rte" =>
            rteFid += 1
            val (meta, pts) = parseRoute(r)
            layer match {
              case "routes" if pts.size >= 2 => out += Row(
                Jts.write(Jts.gf.createLineString(pts.map(p => new Coordinate(p.lon, p.lat)).toArray)),
                meta.getOrElse("name", null), meta.getOrElse("cmt", null),
                meta.getOrElse("desc", null),
                meta.get("number").map(v => Int.box(v.toInt)).orNull)
              case "route_points" => pts.zipWithIndex.foreach { case (p, i) =>
                out += Row(rteFid, i, Jts.write(Jts.point(p.lon, p.lat)),
                  p.ele.map(Double.box).orNull, p.time.orNull, p.name.orNull)
              }
              case _ =>
            }
          case "trk" =>
            trkFid += 1
            val (meta, segs) = parseTrack(r)
            layer match {
              case "tracks" =>
                val lines = segs.filter(_.size >= 2).map(seg =>
                  Jts.gf.createLineString(seg.map(p => new Coordinate(p.lon, p.lat)).toArray))
                if (lines.nonEmpty) out += Row(
                  Jts.write(Jts.gf.createMultiLineString(lines.toArray)),
                  meta.getOrElse("name", null), meta.getOrElse("cmt", null),
                  meta.getOrElse("desc", null),
                  meta.get("number").map(v => Int.box(v.toInt)).orNull)
              case "track_points" => segs.zipWithIndex.foreach { case (seg, si) =>
                seg.zipWithIndex.foreach { case (p, pi) =>
                  out += Row(trkFid, si, pi, Jts.write(Jts.point(p.lon, p.lat)),
                    p.ele.map(Double.box).orNull, p.time.orNull)
                }
              }
              case _ =>
            }
          case _ =>
        }
      }
      out.iterator
    } finally { r.close(); in.close() }
  }

  private case class Pt(lat: Double, lon: Double, ele: Option[Double],
      time: Option[String], name: Option[String])

  private def latLon(r: XMLStreamReader): (Double, Double) = {
    var lat = Double.NaN; var lon = Double.NaN
    var i = 0
    while (i < r.getAttributeCount) {
      r.getAttributeLocalName(i) match {
        case "lat" => lat = r.getAttributeValue(i).trim.toDouble
        case "lon" => lon = r.getAttributeValue(i).trim.toDouble
        case _ =>
      }
      i += 1
    }
    (lat, lon)
  }

  /** Collect text of direct children named in `want` until `until`
   *  closes. Leaves the reader ON the END_ELEMENT of `until`. */
  private def childText(r: XMLStreamReader, until: String,
      want: Set[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var depth = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val n = r.getLocalName
          if (depth == 0 && want(n)) m(n) = r.getElementText.trim // consumes the end tag
          else depth += 1
        case XMLStreamConstants.END_ELEMENT =>
          if (depth == 0 && r.getLocalName == until) return m.toMap
          if (depth > 0) depth -= 1
        case _ =>
      }
    }
    m.toMap
  }

  private def parsePoint(r: XMLStreamReader, tag: String): Pt = {
    val (lat, lon) = latLon(r)
    val m = childText(r, tag, Set("ele", "time", "name"))
    Pt(lat, lon, m.get("ele").map(_.toDouble), m.get("time"), m.get("name"))
  }

  /** Parse <rte>: route-level metadata + ordered rtepts. */
  private def parseRoute(r: XMLStreamReader): (Map[String, String], Seq[Pt]) = {
    val meta = scala.collection.mutable.Map.empty[String, String]
    val pts = scala.collection.mutable.ArrayBuffer.empty[Pt]
    val metaTags = Set("name", "cmt", "desc", "number")
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "rtept" => pts += parsePoint(r, "rtept")
          case n if metaTags(n) => meta(n) = r.getElementText.trim
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "rte" => done = true
        case _ =>
      }
    }
    (meta.toMap, pts.toSeq)
  }

  /** Parse <trk>: track-level metadata + segments of trkpts. */
  private def parseTrack(r: XMLStreamReader): (Map[String, String], Seq[Seq[Pt]]) = {
    val meta = scala.collection.mutable.Map.empty[String, String]
    val segs = scala.collection.mutable.ArrayBuffer.empty[Seq[Pt]]
    val metaTags = Set("name", "cmt", "desc", "number")
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "trkseg" =>
            val seg = scala.collection.mutable.ArrayBuffer.empty[Pt]
            var segDone = false
            while (!segDone && r.hasNext) {
              r.next() match {
                case XMLStreamConstants.START_ELEMENT if r.getLocalName == "trkpt" =>
                  seg += parsePoint(r, "trkpt")
                case XMLStreamConstants.END_ELEMENT if r.getLocalName == "trkseg" => segDone = true
                case _ =>
              }
            }
            segs += seg.toSeq
          case n if metaTags(n) => meta(n) = r.getElementText.trim
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "trk" => done = true
        case _ =>
      }
    }
    (meta.toMap, segs.toSeq)
  }
}
