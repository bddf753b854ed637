package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}

import graft.functions.Jts

/**
 * GMT ASCII vector reader (the OGR_GMT driver of the reference's GDAL
 * bridge — `docs/internals.md` driver table row "OGR_GMT"; format per
 * the published GMT/OGR ASCII layout):
 *
 *  - `# @VGMT1.0` version marker, `# @G<TYPE>` collection geometry
 *    type, `# @N` pipe-separated field names, `# @T` pipe-separated
 *    field types (string/integer/double — GDAL's mapping).
 *  - `>` lines separate segments; a segment carrying `# @D<values>`
 *    (pipe-separated, strings optionally double-quoted) STARTS a new
 *    feature, @D-less segments continue the previous feature's
 *    geometry (additional parts/rings).
 *  - Inside polygon types, `# @P` marks a perimeter (new shell) and
 *    `# @H` a hole of the current shell; the first ring defaults to a
 *    perimeter.
 *  - Non-comment lines are whitespace-separated lon/lat coordinates.
 *
 * Geometry assembly follows the declared @G type: POINT/MULTIPOINT
 * collect coordinates, LINESTRING/MULTILINESTRING one line per
 * segment, POLYGON/MULTIPOLYGON shells+holes per @P/@H. The unit of
 * parallelism is the FILE (directory fan-out via GeoRead's plan-level
 * union), like the other single-file text containers.
 */
object Gmt {

  final case class GmtHeader(gtype: String, fields: Seq[(String, String)])

  private def sparkType(t: String): DataType = t.toLowerCase match {
    case "string" | "char" | "datetime" => StringType
    case "integer" => LongType
    case "double" => DoubleType
    case other => throw new IllegalArgumentException(s"unsupported GMT field type '$other'")
  }

  def schemaOf(h: GmtHeader): StructType =
    StructType(h.fields.map { case (n, t) => StructField(n, sparkType(t)) } :+
      StructField("geom", BinaryType))

  def readHeader(path: String): GmtHeader = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      var gtype = ""
      var names = Seq.empty[String]
      var types = Seq.empty[String]
      val it = src.getLines()
      var scanning = true
      while (it.hasNext && scanning) {
        val line = it.next().trim
        if (line.startsWith("#")) {
          line.split("\\s+").foreach { tok =>
            if (tok.startsWith("@G")) gtype = tok.drop(2).toUpperCase
            else if (tok.startsWith("@N")) names = tok.drop(2).split("\\|").toSeq
            else if (tok.startsWith("@T")) types = tok.drop(2).split("\\|").toSeq
          }
        } else if (line.nonEmpty && !line.startsWith(">")) scanning = false
      }
      require(gtype.nonEmpty, s"$path: no @G geometry-type header")
      require(names.length == types.length,
        s"$path: ${names.length} field names vs ${types.length} types")
      GmtHeader(gtype, names.zip(types))
    } finally src.close()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val header = readHeader(path) // driver-side: schema before any job
    val schema = schemaOf(header)
    val rows = spark.sparkContext
      .parallelize(Seq(path), 1)
      .flatMap(f => parseFeatures(f, header))
    spark.createDataFrame(rows, schema)
  }

  /** One segment: field values (None = continuation), ring role
   *  (P/H/None), coordinates. */
  private final case class Seg(d: Option[Seq[String]], role: Option[Char],
      coords: Array[Coordinate])

  private[graft] def parseFeatures(path: String, header: GmtHeader): Iterator[Row] = {
    val segs = parseSegments(path)
    // group segments into features: a @D segment (or the very first)
    // starts a feature; @D-less segments extend it
    val features = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], scala.collection.mutable.ArrayBuffer[Seg])]
    segs.foreach { s =>
      if (s.d.isDefined || features.isEmpty)
        features += ((s.d.getOrElse(Seq.empty),
          scala.collection.mutable.ArrayBuffer(s)))
      else features.last._2 += s
    }
    features.iterator.map { case (dvals, fsegs) =>
      val attrs = header.fields.zipWithIndex.map { case ((_, t), i) =>
        val raw = if (i < dvals.length) dvals(i) else ""
        convert(raw, t)
      }
      Row.fromSeq(attrs :+ Jts.write(assemble(header.gtype, fsegs.toSeq, path)))
    }
  }

  private def convert(raw: String, t: String): Any = t.toLowerCase match {
    case _ if raw.isEmpty => null
    case "string" | "char" | "datetime" => raw
    case "integer" => raw.toLong
    case "double" => raw.toDouble
    case other => throw new IllegalArgumentException(s"unsupported GMT field type '$other'")
  }

  private def assemble(gtype: String, segs: Seq[Seg], path: String): Geometry = {
    def ring(cs: Array[Coordinate]): LinearRing = {
      require(cs.length >= 3, s"$path: polygon ring with ${cs.length} coordinates")
      val closed = if (cs.head.equals2D(cs.last)) cs
        else cs :+ cs.head.copy()
      Jts.gf.createLinearRing(closed)
    }
    gtype match {
      case "POINT" =>
        val cs = segs.flatMap(_.coords)
        require(cs.length == 1, s"$path: POINT feature with ${cs.length} coordinates")
        Jts.gf.createPoint(cs.head)
      case "MULTIPOINT" =>
        Jts.gf.createMultiPointFromCoords(segs.flatMap(_.coords).toArray)
      case "LINESTRING" =>
        require(segs.length == 1, s"$path: LINESTRING feature with ${segs.length} segments")
        Jts.gf.createLineString(segs.head.coords)
      case "MULTILINESTRING" =>
        Jts.gf.createMultiLineString(
          segs.map(s => Jts.gf.createLineString(s.coords)).toArray)
      case "POLYGON" | "MULTIPOLYGON" =>
        val shells = scala.collection.mutable.ArrayBuffer
          .empty[(LinearRing, scala.collection.mutable.ArrayBuffer[LinearRing])]
        segs.foreach { s =>
          val r = ring(s.coords)
          s.role match {
            case Some('H') =>
              require(shells.nonEmpty, s"$path: @H hole before any @P perimeter")
              shells.last._2 += r
            case _ => // @P or unmarked: new shell
              shells += ((r, scala.collection.mutable.ArrayBuffer.empty[LinearRing]))
          }
        }
        val polys = shells.map { case (sh, holes) => Jts.gf.createPolygon(sh, holes.toArray) }
        if (gtype == "POLYGON") {
          require(polys.length == 1, s"$path: POLYGON feature with ${polys.length} shells")
          polys.head
        } else Jts.gf.createMultiPolygon(polys.toArray)
      case other => throw new IllegalArgumentException(
        s"$path: unsupported GMT geometry type '@G$other'")
    }
  }

  /** Split a `# @D` value list: pipe-separated, strings optionally
   *  double-quoted (quotes may contain pipes; "" escapes a quote). */
  private[graft] def splitD(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < s.length && s.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else if (c == '"') inQ = true
      else if (c == '|') { out += cur.result(); cur.clear() }
      else cur += c
      i += 1
    }
    out += cur.result()
    out.result()
  }

  // ---- writer ------------------------------------------------------------

  /**
   * GMT ASCII writer (GDAL can_create parity for the OGR_GMT driver,
   * reference `gdal/functions/st_write.cpp:558-569`): emits the
   * `# @VGMT1.0 @G / @N / @T` header and `>`-separated segments this
   * object's reader parses back. The collection `@G` type is derived
   * from the data (one pass — rows spool to a sibling temp file while
   * the geometry families are observed, then header + body
   * concatenate; the GPX track writer uses the same spool pattern):
   * a homogeneous Point/LineString/Polygon family keeps its singular
   * type unless any row is a Multi — then the whole layer promotes to
   * the Multi type (GDAL's promotion; a Point read back under
   * MULTIPOINT is a 1-member MultiPoint). Mixed families are a loud
   * error — GMT files carry ONE geometry family. Field mapping is the
   * inverse of [[sparkType]]: string→string, int/long→integer,
   * float/double→double, anything else→string. Single-file format —
   * rows stream through the driver ([[DriverSink]] guard applies).
   */
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    DriverSink.guard(df, "GMT", "GeoJSON NDJSON / GeoParquet (cluster-parallel)")
    val gi = df.schema.fieldIndex(geomCol)
    val attrs = df.schema.fields.zipWithIndex.filter(_._2 != gi)
    def gmtType(dt: DataType): String = dt match {
      case IntegerType | ShortType | ByteType | LongType => "integer"
      case FloatType | DoubleType | _: DecimalType => "double"
      case _ => "string"
    }
    def fmt(d: Double): String =
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    def dField(v: Any, dt: DataType): String = (v, dt) match {
      case (null, _) => ""
      case (d: Double, _) => fmt(d)
      case (f: Float, _) => fmt(f.toDouble)
      case (d: java.math.BigDecimal, _) => fmt(d.doubleValue)
      case (x, IntegerType | ShortType | ByteType | LongType) => x.toString
      case (x, _) =>
        val s = x.toString
        if (s.contains("|") || s.contains("\"")) "\"" + s.replace("\"", "\"\"") + "\"" else s
    }
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val outFile = new java.io.File(path)
    val tmp = java.io.File.createTempFile("gmt-body", ".part",
      Option(outFile.getParentFile).getOrElse(new java.io.File(".")))
    val body = java.nio.file.Files.newBufferedWriter(tmp.toPath, utf8)
    // geometry families seen: base name (Point/LineString/Polygon) ->
    // whether any row was the Multi form
    val families = scala.collection.mutable.Map.empty[String, Boolean]
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        require(!row.isNullAt(gi),
          s"GMT writer: null geometry (GMT has no null-geometry record)")
        val g = Jts.read(row.getAs[Array[Byte]](gi))
        val d = "# @D" + attrs.map { case (f, i) =>
          dField(if (row.isNullAt(i)) null else row.get(i), f.dataType)
        }.mkString("|")
        def seg(cs: Array[Coordinate], header: Seq[String]): Unit = {
          body.write(">\n")
          header.foreach { h => body.write(h); body.write("\n") }
          cs.foreach(c => body.write(fmt(c.x) + " " + fmt(c.y) + "\n"))
        }
        def notePart(base: String, isMulti: Boolean): Unit =
          families(base) = families.getOrElse(base, false) || isMulti
        def writePoly(p: org.locationtech.jts.geom.Polygon, first: Boolean): Unit = {
          seg(p.getExteriorRing.getCoordinates,
            if (first) Seq(d, "# @P") else Seq("# @P"))
          (0 until p.getNumInteriorRing).foreach(j =>
            seg(p.getInteriorRingN(j).getCoordinates, Seq("# @H")))
        }
        g match {
          case p: org.locationtech.jts.geom.Point =>
            notePart("Point", isMulti = false); seg(p.getCoordinates, Seq(d))
          case m: org.locationtech.jts.geom.MultiPoint =>
            notePart("Point", isMulti = true); seg(m.getCoordinates, Seq(d))
          case l: org.locationtech.jts.geom.LineString =>
            notePart("LineString", isMulti = false); seg(l.getCoordinates, Seq(d))
          case m: org.locationtech.jts.geom.MultiLineString =>
            notePart("LineString", isMulti = true)
            (0 until m.getNumGeometries).foreach { i =>
              seg(m.getGeometryN(i).getCoordinates, if (i == 0) Seq(d) else Seq.empty)
            }
          case p: org.locationtech.jts.geom.Polygon =>
            notePart("Polygon", isMulti = false); writePoly(p, first = true)
          case m: org.locationtech.jts.geom.MultiPolygon =>
            notePart("Polygon", isMulti = true)
            (0 until m.getNumGeometries).foreach(i =>
              writePoly(m.getGeometryN(i).asInstanceOf[org.locationtech.jts.geom.Polygon],
                first = i == 0))
          case other => throw new IllegalArgumentException(
            s"GMT writer: unsupported geometry ${other.getGeometryType}")
        }
      }
      body.close()
      require(families.size <= 1, "GMT writer: mixed geometry families " +
        families.keys.mkString(", ") + " (GMT files carry one family)")
      val gtype = families.headOption match {
        case None => "POINT" // empty layer: any type reads back as 0 rows
        case Some((base, anyMulti)) =>
          val b = base.toUpperCase
          if (anyMulti) "MULTI" + b else b
      }
      val out = java.nio.file.Files.newBufferedWriter(outFile.toPath, utf8)
      try {
        out.write(s"# @VGMT1.0 @G$gtype\n")
        if (attrs.nonEmpty) {
          out.write("# @N" + attrs.map(_._1.name).mkString("|") + "\n")
          out.write("# @T" + attrs.map(a => gmtType(a._1.dataType)).mkString("|") + "\n")
        }
        out.write("# FEATURE_DATA\n")
        val rd = java.nio.file.Files.newBufferedReader(tmp.toPath, utf8)
        try {
          val buf = new Array[Char](8192)
          var n = rd.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = rd.read(buf) }
        } finally rd.close()
      } finally out.close()
    } finally { body.close(); tmp.delete(); () }
  }

  private def parseSegments(path: String): Vector[Seg] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val out = Vector.newBuilder[Seg]
      var d: Option[Seq[String]] = None
      var role: Option[Char] = None
      var coords = Array.newBuilder[Coordinate]
      var n = 0
      var open = false
      def flush(): Unit = {
        if (open && n > 0) out += Seg(d, role, coords.result())
        d = None; role = None; coords = Array.newBuilder[Coordinate]; n = 0
      }
      src.getLines().foreach { raw =>
        val line = raw.trim
        if (line.startsWith(">")) { flush(); open = true }
        else if (line.startsWith("#")) {
          val body = line.dropWhile(_ == '#').trim
          if (body.startsWith("@D")) d = Some(splitD(body.drop(2)))
          else if (body.startsWith("@P")) role = Some('P')
          else if (body.startsWith("@H")) role = Some('H')
          // @VGMT/@G/@N/@T/@R/@J headers: handled in readHeader / ignored
        } else if (line.nonEmpty) {
          val t = line.split("\\s+")
          coords += new Coordinate(t(0).toDouble, t(1).toDouble)
          n += 1
          open = true // headerless single-segment files still emit
        }
      }
      flush()
      out.result()
    } finally src.close()
  }
}
