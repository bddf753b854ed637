package graft.sources

import org.apache.spark.sql.DataFrame
import org.locationtech.jts.geom._

import graft.functions.Jts

/**
 * KML / GPX writers — the GDAL COPY TO export side of the two XML
 * formats the engine already reads (reference
 * `gdal/functions/st_write.cpp:558-569` writes both through GDAL).
 * Single-document XML formats: rows stream through the driver
 * (`toLocalIterator`, [[DriverSink.guard]]-capped) exactly like the
 * FeatureCollection GeoJSON and Shapefile sinks; for cluster-parallel
 * output use the NDJSON/parquet writers.
 *
 * Roundtrip contract: what [[Kml.read]] / [[Gpx.read]] parse is what
 * these emit — KML Placemarks with name/description/ExtendedData and
 * Point/LineString/Polygon/MultiGeometry; GPX waypoints from Point
 * rows and tracks from LineString/MultiLineString rows (GDAL's
 * layer mapping for the format).
 */
object GeoXmlWrite {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  // ---- KML ---------------------------------------------------------------

  private def kmlCoords(cs: CoordinateSequence): String =
    (0 until cs.size).map { i =>
      val c = cs.getCoordinate(i)
      if (java.lang.Double.isNaN(c.getZ)) s"${num(c.x)},${num(c.y)}"
      else s"${num(c.x)},${num(c.y)},${num(c.getZ)}"
    }.mkString(" ")

  private def kmlGeom(g: Geometry): String = g match {
    case p: Point =>
      s"<Point><coordinates>${kmlCoords(p.getCoordinateSequence)}</coordinates></Point>"
    case l: LineString =>
      s"<LineString><coordinates>${kmlCoords(l.getCoordinateSequence)}</coordinates></LineString>"
    case p: Polygon =>
      val outer = s"<outerBoundaryIs><LinearRing><coordinates>${
        kmlCoords(p.getExteriorRing.getCoordinateSequence)}</coordinates></LinearRing></outerBoundaryIs>"
      val inners = (0 until p.getNumInteriorRing).map { i =>
        s"<innerBoundaryIs><LinearRing><coordinates>${
          kmlCoords(p.getInteriorRingN(i).getCoordinateSequence)}</coordinates></LinearRing></innerBoundaryIs>"
      }.mkString
      s"<Polygon>$outer$inners</Polygon>"
    case m: GeometryCollection =>
      val parts = (0 until m.getNumGeometries).map(i => kmlGeom(m.getGeometryN(i))).mkString
      s"<MultiGeometry>$parts</MultiGeometry>"
    case other => throw new IllegalArgumentException(
      s"cannot write ${other.getGeometryType} to KML")
  }

  /**
   * Write one KML Document of Placemarks. `name`/`description` columns
   * (when present) become the Placemark elements of the same name;
   * every other non-geometry column becomes an ExtendedData `Data`
   * entry rendered as a string. Null geometries yield geometry-less
   * Placemarks (valid KML; the reader returns them with null geom).
   */
  def writeKml(df: DataFrame, geomCol: String, path: String,
      documentName: String = "graft"): Unit = {
    DriverSink.guard(df, "KML", "GeoJSON NDJSON / GeoParquet (cluster-parallel)")
    val cols = df.columns
    val gi = df.schema.fieldIndex(geomCol)
    val ni = cols.indexOf("name")
    val di = cols.indexOf("description")
    val extIdx = cols.indices.filter(i => i != gi && i != ni && i != di)
    val out = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
    try {
      out.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      out.write("<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document>")
      out.write(s"<name>${esc(documentName)}</name>")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        out.write("<Placemark>")
        if (ni >= 0 && !r.isNullAt(ni)) out.write(s"<name>${esc(String.valueOf(r.get(ni)))}</name>")
        if (di >= 0 && !r.isNullAt(di)) out.write(s"<description>${esc(String.valueOf(r.get(di)))}</description>")
        if (extIdx.nonEmpty) {
          out.write("<ExtendedData>")
          extIdx.foreach { i =>
            if (!r.isNullAt(i))
              out.write(s"""<Data name="${esc(cols(i))}"><value>${esc(String.valueOf(r.get(i)))}</value></Data>""")
          }
          out.write("</ExtendedData>")
        }
        if (!r.isNullAt(gi)) out.write(kmlGeom(Jts.read(r.getAs[Array[Byte]](gi))))
        out.write("</Placemark>")
      }
      out.write("</Document></kml>\n")
    } finally out.close()
  }

  // ---- GPX ---------------------------------------------------------------

  /**
   * Write GPX 1.1: Point rows become `<wpt>` (with `name`/`ele`/`time`
   * columns when present), LineString / MultiLineString rows become
   * `<trk>` (one `<trkseg>` per component, `name`/`number` columns
   * honored) — GDAL's geometry-to-layer mapping for the format. Any
   * other geometry type raises. Waypoints are emitted before tracks,
   * matching the GPX schema's required element order.
   */
  def writeGpx(df: DataFrame, geomCol: String, path: String): Unit = {
    DriverSink.guard(df, "GPX", "GeoJSON NDJSON / GeoParquet (cluster-parallel)")
    val cols = df.columns
    val gi = df.schema.fieldIndex(geomCol)
    def idx(n: String) = cols.indexOf(n)
    val (ni, ei, ti, numi) = (idx("name"), idx("ele"), idx("time"), idx("number"))
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[String] =
      if (i >= 0 && !r.isNullAt(i)) Some(String.valueOf(r.get(i))) else None

    // one pass: waypoints stream straight into the output, tracks
    // spool to a sibling temp file appended afterwards (the schema
    // requires wpt before trk; buffering either in memory would scale
    // with output bytes, not rows)
    val outFile = new java.io.File(path)
    val tmp = java.io.File.createTempFile("gpx-trk", ".part",
      Option(outFile.getParentFile).getOrElse(new java.io.File(".")))
    val out = java.nio.file.Files.newBufferedWriter(outFile.toPath, java.nio.charset.StandardCharsets.UTF_8)
    val trkOut = java.nio.file.Files.newBufferedWriter(tmp.toPath, java.nio.charset.StandardCharsets.UTF_8)
    try {
      out.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      out.write("<gpx version=\"1.1\" creator=\"graft\" xmlns=\"http://www.topografix.com/GPX/1/1\">")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        if (!r.isNullAt(gi)) Jts.read(r.getAs[Array[Byte]](gi)) match {
          case p: Point =>
            out.write(s"""<wpt lat="${num(p.getY)}" lon="${num(p.getX)}">""")
            opt(r, ei).foreach(e => out.write(s"<ele>$e</ele>"))
            opt(r, ti).foreach(t => out.write(s"<time>${esc(t)}</time>"))
            opt(r, ni).foreach(n => out.write(s"<name>${esc(n)}</name>"))
            out.write("</wpt>")
          case l: LineString => trkOut.write(trkOf(Seq(l), opt(r, ni), opt(r, numi)))
          case m: MultiLineString =>
            val segs = (0 until m.getNumGeometries).map(m.getGeometryN(_).asInstanceOf[LineString])
            trkOut.write(trkOf(segs, opt(r, ni), opt(r, numi)))
          case other => throw new IllegalArgumentException(
            s"cannot write ${other.getGeometryType} to GPX (points and linestrings only)")
        }
      }
      trkOut.close()
      val rd = java.nio.file.Files.newBufferedReader(tmp.toPath, java.nio.charset.StandardCharsets.UTF_8)
      try {
        val buf = new Array[Char](65536)
        var n = rd.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = rd.read(buf) }
      } finally rd.close()
      out.write("</gpx>\n")
    } finally {
      try trkOut.close() catch { case _: Exception => }
      out.close()
      tmp.delete()
    }
  }

  private def trkOf(segs: Seq[LineString], name: Option[String], number: Option[String]): String = {
    val sb = new StringBuilder("<trk>")
    name.foreach(n => sb ++= s"<name>${esc(n)}</name>")
    number.foreach(n => sb ++= s"<number>$n</number>")
    segs.foreach { l =>
      sb ++= "<trkseg>"
      val cs = l.getCoordinateSequence
      (0 until cs.size).foreach { i =>
        val c = cs.getCoordinate(i)
        sb ++= s"""<trkpt lat="${num(c.y)}" lon="${num(c.x)}">"""
        if (!java.lang.Double.isNaN(c.getZ)) sb ++= s"<ele>${num(c.getZ)}</ele>"
        sb ++= "</trkpt>"
      }
      sb ++= "</trkseg>"
    }
    sb ++= "</trk>"
    sb.result()
  }
}
