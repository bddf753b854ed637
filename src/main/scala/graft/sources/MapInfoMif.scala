package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}

import graft.functions.Jts

/**
 * MapInfo Interchange Format (MIF/MID) reader — the published MapInfo
 * "Data Interchange Formats" text layout: a `.mif` file carrying the
 * header (VERSION / Charset / DELIMITER / COLUMNS / CoordSys) and the
 * geometry records after `DATA`, plus a sibling `.mid` file with one
 * delimited attribute row per geometry record. One of the GDAL
 * long-tail drivers the reference reaches through its GDAL bridge
 * (reference `gdal/functions/st_read.cpp:668-702` — "MapInfo File").
 *
 * Geometry support: POINT, LINE, PLINE (incl. MULTIPLE sections),
 * REGION (multiple rings; a ring contained in an earlier shell
 * becomes its hole, otherwise a new shell — the containment assembly
 * GDAL applies), RECT, and NONE (null geometry). Display-style
 * clauses (PEN/BRUSH/SYMBOL/SMOOTH/CENTER) are skipped. Unsupported
 * record kinds (ARC/TEXT/ELLIPSE/ROUNDRECT) raise with the kind named
 * — same contract as the CRS registry: clear error, no silent nulls.
 *
 * Column types map Char→string, Integer→int, Smallint→int,
 * Float/Decimal→double, Logical→boolean, Date→string (GDAL's
 * normalization). Like the other single-file containers the unit of
 * parallelism is the FILE — a directory of .mif pairs fans out one
 * task per file via GeoRead's plan-level union.
 */
object MapInfoMif {

  final case class MifColumn(name: String, kind: String)

  final case class MifHeader(
      delimiter: Char, columns: Seq[MifColumn], coordSys: Option[String])

  def sparkType(kind: String): DataType = {
    val k = kind.toLowerCase
    if (k.startsWith("char")) StringType
    else if (k.startsWith("integer")) IntegerType
    else if (k.startsWith("smallint")) IntegerType
    else if (k.startsWith("decimal") || k.startsWith("float")) DoubleType
    else if (k.startsWith("logical")) BooleanType
    else if (k.startsWith("date")) StringType
    else throw new IllegalArgumentException(s"unsupported MIF column type '$kind'")
  }

  def schemaOf(header: MifHeader): StructType =
    StructType(header.columns.map(c => StructField(c.name, sparkType(c.kind))) :+
      StructField("geom", BinaryType))

  def readHeader(mifPath: String): MifHeader = {
    val src = scala.io.Source.fromFile(mifPath, "UTF-8")
    try {
      val it = src.getLines()
      var delimiter = '\t' // spec default when no DELIMITER clause
      var cols = Vector.empty[MifColumn]
      var coordSys: Option[String] = None
      var done = false
      while (it.hasNext && !done) {
        val line = it.next().trim
        val upper = line.toUpperCase
        if (upper.startsWith("DELIMITER")) {
          val q = line.indexOf('"')
          require(q >= 0 && line.length > q + 1, s"malformed DELIMITER line: $line")
          delimiter = line.charAt(q + 1)
        } else if (upper.startsWith("COORDSYS")) {
          coordSys = Some(line)
        } else if (upper.startsWith("COLUMNS")) {
          val n = line.split("\\s+")(1).toInt
          cols = (0 until n).map { _ =>
            val c = it.next().trim.split("\\s+", 2)
            MifColumn(c(0), if (c.length > 1) c(1).trim else "Char(1)")
          }.toVector
        } else if (upper.startsWith("DATA")) done = true
      }
      require(done, s"$mifPath has no DATA section")
      MifHeader(delimiter, cols, coordSys)
    } finally src.close()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val header = readHeader(path) // driver-side: schema before any job
    val schema = schemaOf(header)
    val rows = spark.sparkContext
      .parallelize(Seq(path), 1)
      .flatMap(f => parsePair(f, header))
    spark.createDataFrame(rows, schema)
  }

  // ---- parsing -----------------------------------------------------------

  private val StyleKinds = Set("PEN", "BRUSH", "SYMBOL", "SMOOTH", "CENTER")

  private def parsePair(mifPath: String, header: MifHeader): Iterator[Row] = {
    val geoms = parseGeometries(mifPath)
    val attrs = parseMid(midPathOf(mifPath), header)
    require(header.columns.isEmpty || attrs.size == geoms.size,
      s"$mifPath: ${geoms.size} geometries but ${attrs.size} MID rows")
    val attrIt = if (header.columns.isEmpty) Iterator.continually(Seq.empty[Any]) else attrs.iterator
    geoms.iterator.zip(attrIt).map { case (g, a) =>
      Row.fromSeq(a :+ g.map(Jts.write).orNull)
    }
  }

  def midPathOf(mifPath: String): String = {
    val stem = mifPath.substring(0, mifPath.length - 4)
    val cands = Seq(stem + ".mid", stem + ".MID")
    cands.find(p => new java.io.File(p).exists).getOrElse(cands.head)
  }

  /** All geometry records of the DATA section, in file order; None =
   *  the NONE (null-geometry) record. */
  private def parseGeometries(mifPath: String): Vector[Option[Geometry]] = {
    val src = scala.io.Source.fromFile(mifPath, "UTF-8")
    try {
      val it = src.getLines().buffered
      // skip to DATA
      while (it.hasNext && !it.head.trim.toUpperCase.startsWith("DATA")) it.next()
      if (it.hasNext) it.next()
      val out = Vector.newBuilder[Option[Geometry]]
      while (it.hasNext) {
        val line = it.next().trim
        if (line.nonEmpty) {
          val tok = line.split("\\s+")
          val kind = tok(0).toUpperCase
          kind match {
            case _ if StyleKinds.contains(kind) => // display clause, skip
            case "NONE" => out += None
            case "POINT" =>
              out += Some(Jts.point(tok(1).toDouble, tok(2).toDouble))
            case "LINE" =>
              out += Some(Jts.gf.createLineString(Array(
                new Coordinate(tok(1).toDouble, tok(2).toDouble),
                new Coordinate(tok(3).toDouble, tok(4).toDouble))))
            case "PLINE" =>
              val sections =
                if (tok.length >= 3 && tok(1).toUpperCase == "MULTIPLE") tok(2).toInt
                else 1
              val firstCount = if (sections == 1 && tok.length >= 2) Some(tok(1).toInt) else None
              val lines = (0 until sections).map { s =>
                val n = if (s == 0 && firstCount.isDefined) firstCount.get
                        else it.next().trim.toInt
                Jts.gf.createLineString(readCoords(it, n))
              }
              out += Some(
                if (sections == 1) lines.head
                else Jts.gf.createMultiLineString(lines.toArray))
            case "REGION" =>
              val nRings = tok(1).toInt
              val rings = (0 until nRings).map { _ =>
                val n = it.next().trim.toInt
                closeRing(readCoords(it, n))
              }
              out += Some(assembleRegion(rings))
            case "RECT" =>
              val (x1, y1, x2, y2) =
                (tok(1).toDouble, tok(2).toDouble, tok(3).toDouble, tok(4).toDouble)
              val (lx, hx) = (math.min(x1, x2), math.max(x1, x2))
              val (ly, hy) = (math.min(y1, y2), math.max(y1, y2))
              out += Some(Jts.gf.createPolygon(Array(
                new Coordinate(lx, ly), new Coordinate(hx, ly),
                new Coordinate(hx, hy), new Coordinate(lx, hy),
                new Coordinate(lx, ly))))
            case other => throw new IllegalArgumentException(
              s"unsupported MIF geometry record '$other' in $mifPath " +
              "(supported: POINT, LINE, PLINE, REGION, RECT, NONE)")
          }
        }
      }
      out.result()
    } finally src.close()
  }

  private def readCoords(it: Iterator[String], n: Int): Array[Coordinate] =
    (0 until n).map { _ =>
      val p = it.next().trim.split("\\s+")
      new Coordinate(p(0).toDouble, p(1).toDouble)
    }.toArray

  private def closeRing(cs: Array[Coordinate]): LinearRing = {
    val closed = if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
    Jts.gf.createLinearRing(closed)
  }

  /** GDAL-style ring assembly: a ring inside an existing shell becomes
   *  that shell's hole; otherwise it opens a new shell. */
  private def assembleRegion(rings: Seq[LinearRing]): Geometry = {
    val shells = scala.collection.mutable.ArrayBuffer.empty[(LinearRing, scala.collection.mutable.ArrayBuffer[LinearRing])]
    rings.foreach { r =>
      val pt = Jts.gf.createPoint(r.getCoordinateN(0))
      shells.find { case (shell, _) =>
        Jts.gf.createPolygon(shell).contains(pt) ||
          Jts.gf.createPolygon(shell).getExteriorRing.equalsExact(r)
      } match {
        case Some((_, holes)) => holes += r
        case None => shells += ((r, scala.collection.mutable.ArrayBuffer.empty[LinearRing]))
      }
    }
    val polys = shells.map { case (shell, holes) =>
      Jts.gf.createPolygon(shell, holes.toArray)
    }
    if (polys.size == 1) polys.head
    else Jts.gf.createMultiPolygon(polys.toArray)
  }

  /** MID attribute rows typed per the header's column list. Char
   *  values may be double-quoted ("" escapes a quote); the delimiter
   *  inside quotes does not split. Interior empty lines are legitimate
   *  rows whose fields are all empty (a single Char column with an
   *  empty value serializes as an empty line) — only a trailing run of
   *  blank lines (file-final newline artifacts) is stripped, so
   *  all-empty records parse instead of desyncing the geometry/row
   *  count check. */
  private def parseMid(midPath: String, header: MifHeader): Vector[Seq[Any]] = {
    if (header.columns.isEmpty) return Vector.empty
    val src = scala.io.Source.fromFile(midPath, "UTF-8")
    try {
      val lines = src.getLines().toVector.reverse.dropWhile(_.isEmpty).reverse
      lines.map { line =>
        val fields = splitDelimited(line, header.delimiter)
        require(fields.size == header.columns.size,
          s"$midPath: row has ${fields.size} fields, expected ${header.columns.size}")
        fields.zip(header.columns).map { case (f, c) => convert(f, c.kind) }
      }
    } finally src.close()
  }

  private def convert(raw: String, kind: String): Any = {
    val k = kind.toLowerCase
    val v = raw.trim
    if (v.isEmpty && !k.startsWith("char")) null
    else if (k.startsWith("char") || k.startsWith("date")) v
    else if (k.startsWith("integer") || k.startsWith("smallint")) v.toInt
    else if (k.startsWith("decimal") || k.startsWith("float")) v.toDouble
    else if (k.startsWith("logical")) v.equalsIgnoreCase("T") || v.equalsIgnoreCase("true")
    else throw new IllegalArgumentException(s"unsupported MIF column type '$kind'")
  }

  // ---- writer ------------------------------------------------------------

  /**
   * MIF/MID writer (GDAL can_create parity for the "MapInfo File"
   * driver, reference `gdal/functions/st_write.cpp:558-569`): emits
   * the `.mif` header + DATA section and the sibling `.mid` attribute
   * rows this object's reader parses back losslessly. Type mapping is
   * the inverse of [[sparkType]]: string→Char(254), int/long→Integer
   * (MIF Integer is 32-bit — larger values fail the round-trip read
   * loudly rather than truncate), float/double→Float,
   * boolean→Logical, date/timestamp→Char(254). Geometry records:
   * Point→POINT, 2-point LineString→LINE, LineString→PLINE,
   * MultiLineString→PLINE MULTIPLE, Polygon/MultiPolygon→REGION
   * (shell then its holes, the containment order [[assembleRegion]]
   * reassembles), null→NONE. Single-file format — rows stream through
   * the driver (same [[DriverSink]] contract as the other text sinks).
   */
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    DriverSink.guard(df, "MIF/MID", "GeoJSON NDJSON / GeoParquet (cluster-parallel)")
    require(path.toLowerCase.endsWith(".mif"), s"MIF writer expects a .mif path, got $path")
    val gi = df.schema.fieldIndex(geomCol)
    val attrs = df.schema.fields.zipWithIndex.filter(_._2 != gi)
    def mifKind(dt: DataType): String = dt match {
      case IntegerType | ShortType | ByteType | LongType => "Integer"
      case FloatType | DoubleType | _: DecimalType => "Float"
      case BooleanType => "Logical"
      case _ => "Char(254)"
    }
    def fmt(d: Double): String =
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val mif = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path), utf8)
    val mid = java.nio.file.Files.newBufferedWriter(
      java.nio.file.Paths.get(path.substring(0, path.length - 4) + ".mid"), utf8)
    try {
      mif.write("VERSION 300\n")
      mif.write("Charset \"Neutral\"\n")
      mif.write("DELIMITER \",\"\n")
      mif.write(s"COLUMNS ${attrs.length}\n")
      attrs.foreach { case (f, _) => mif.write(s"  ${f.name} ${mifKind(f.dataType)}\n") }
      mif.write("DATA\n")
      def writeCoords(cs: Array[Coordinate]): Unit =
        cs.foreach(c => mif.write(fmt(c.x) + " " + fmt(c.y) + "\n"))
      def ringCoords(r: org.locationtech.jts.geom.LineString): Array[Coordinate] =
        r.getCoordinates
      def writeGeom(g: Geometry): Unit = g match {
        case null => mif.write("NONE\n")
        case p: org.locationtech.jts.geom.Point =>
          mif.write(s"POINT ${fmt(p.getX)} ${fmt(p.getY)}\n")
        case l: org.locationtech.jts.geom.LineString if l.getNumPoints == 2 =>
          val cs = l.getCoordinates
          mif.write(s"LINE ${fmt(cs(0).x)} ${fmt(cs(0).y)} ${fmt(cs(1).x)} ${fmt(cs(1).y)}\n")
        case l: org.locationtech.jts.geom.LineString =>
          mif.write(s"PLINE ${l.getNumPoints}\n"); writeCoords(l.getCoordinates)
        case m: org.locationtech.jts.geom.MultiLineString =>
          mif.write(s"PLINE MULTIPLE ${m.getNumGeometries}\n")
          (0 until m.getNumGeometries).foreach { i =>
            val l = m.getGeometryN(i).asInstanceOf[org.locationtech.jts.geom.LineString]
            mif.write(s"${l.getNumPoints}\n"); writeCoords(l.getCoordinates)
          }
        case p: Polygon => writeGeom(Jts.gf.createMultiPolygon(Array(p)))
        case m: org.locationtech.jts.geom.MultiPolygon =>
          val rings = (0 until m.getNumGeometries).flatMap { i =>
            val p = m.getGeometryN(i).asInstanceOf[Polygon]
            ringCoords(p.getExteriorRing) +:
              (0 until p.getNumInteriorRing).map(j => ringCoords(p.getInteriorRingN(j)))
          }
          mif.write(s"REGION ${rings.length}\n")
          rings.foreach { cs => mif.write(s"${cs.length}\n"); writeCoords(cs) }
        case other => throw new IllegalArgumentException(
          s"MIF writer: unsupported geometry ${other.getGeometryType} " +
          "(supported: Point, LineString, MultiLineString, Polygon, MultiPolygon, null)")
      }
      def midField(v: Any, dt: DataType): String = (v, dt) match {
        case (null, _) => ""
        case (b: Boolean, _) => if (b) "T" else "F"
        case (d: Double, _) => fmt(d)
        case (f: Float, _) => fmt(f.toDouble)
        case (d: java.math.BigDecimal, _) => fmt(d.doubleValue)
        case (s, StringType) => "\"" + s.toString.replace("\"", "\"\"") + "\""
        case (x, IntegerType | ShortType | ByteType | LongType) => x.toString
        case (x, _) => "\"" + x.toString.replace("\"", "\"\"") + "\""
      }
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        writeGeom(if (row.isNullAt(gi)) null else Jts.read(row.getAs[Array[Byte]](gi)))
        if (attrs.nonEmpty)
          mid.write(attrs.map { case (f, i) =>
            midField(if (row.isNullAt(i)) null else row.get(i), f.dataType)
          }.mkString(",") + "\n")
      }
    } finally { mif.close(); mid.close() }
  }

  private def splitDelimited(line: String, delim: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQ) {
        if (ch == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (ch == '"') inQ = false
        else cur += ch
      } else if (ch == '"') inQ = true
      else if (ch == delim) { out += cur.result(); cur.clear() }
      else cur += ch
      i += 1
    }
    out += cur.result()
    out.result()
  }
}
