package graft.sources

import graft.functions.Jts
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom._

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

/**
 * Native ESRI Shapefile reader (public format spec; the reference has
 * its own native reader at core/io/shapefile/read_shapefile.cpp —
 * ours is a fresh implementation against the published spec).
 *
 * Spark-first parallelism: the .shx index gives per-record offsets, so
 * the file splits into N record ranges read as independent partitions
 * (the reference's GDAL path is effectively serial — docs/internals.md
 * last paragraph; we do better by exploiting .shx).
 *
 * Supported shapes: Null(0), Point(1/11/21), PolyLine(3/13/23),
 * Polygon(5/15/25), MultiPoint(8/18/28); Z values carried, M dropped.
 * Attributes from .dbf (dBASE III: C,N,F,L,D), charset from .cpg.
 */
object Shapefile {
  import org.locationtech.jts.geom.Geometry


  private case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def readDbfHeader(raf: RandomAccessFile): (Int, Int, Int, Seq[DbfField]) = {
    val head = new Array[Byte](32)
    raf.readFully(head)
    val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xFFFF
    val recordSize = bb.getShort(10) & 0xFFFF
    val nFields = (headerSize - 33) / 32
    val fields = (0 until nFields).map { _ =>
      val fd = new Array[Byte](32)
      raf.readFully(fd)
      val nameEnd = fd.indexOf(0.toByte) match { case -1 => 11; case i => math.min(i, 11) }
      DbfField(new String(fd, 0, nameEnd, "ASCII").trim, fd(11).toChar, fd(16) & 0xFF, fd(17) & 0xFF)
    }
    (numRecords, headerSize, recordSize, fields)
  }

  private def dbfFieldType(f: DbfField): DataType = f.typ match {
    case 'N' if f.dec == 0 && f.len < 19 => LongType
    case 'N' | 'F' => DoubleType
    case 'L' => BooleanType
    case _ => StringType // C, D (dates as yyyymmdd strings), memos
  }

  /** Schema of a shapefile: dbf fields + geom (WKB). */
  def schemaOf(path: String): StructType = {
    val raf = new RandomAccessFile(sibling(path, "dbf"), "r")
    try {
      val (_, _, _, fields) = readDbfHeader(raf)
      StructType(fields.map(f => StructField(f.name, dbfFieldType(f))) :+ StructField("geom", BinaryType))
    } finally raf.close()
  }

  private def sibling(shpPath: String, ext: String): String = {
    val base = shpPath.replaceAll("\\.[sS][hH][pP]$", "")
    Seq(s"$base.$ext", s"$base.${ext.toUpperCase}").find(p => Files.exists(Paths.get(p)))
      .getOrElse(s"$base.$ext")
  }

  /** Shape-type code (shp header offset 32) → WKT-style geometry name. */
  def shapeTypeName(code: Int): String = {
    val tag = if (code >= 11 && code <= 18) " Z" else if (code >= 21 && code <= 28) " M" else ""
    (code % 10) match {
      case 0 => "Null"
      case 1 => "Point" + tag
      case 3 => "LineString" + tag
      case 5 => "Polygon" + tag
      case 8 => "MultiPoint" + tag
      case _ => s"Unknown($code)"
    }
  }

  /** Header-only metadata for ST_Read_Meta: (geometry type name,
   *  feature count from .shx, raw dbf fields (name, type char, width,
   *  decimals)). No record data is read. */
  def metaOf(path: String): (String, Long, Seq[(String, Char, Int, Int)]) = {
    val shp = new RandomAccessFile(path, "r")
    val shapeType = try { shp.seek(32); java.lang.Integer.reverseBytes(shp.readInt()) }
      finally shp.close()
    val shxFile = new java.io.File(sibling(path, "shx"))
    val count = if (shxFile.isFile) (shxFile.length() - 100) / 8 else -1L
    val dbf = new RandomAccessFile(sibling(path, "dbf"), "r")
    val fields = try readDbfHeader(dbf)._4 finally dbf.close()
    (shapeTypeName(shapeType), count, fields.map(f => (f.name, f.typ, f.len, f.dec)))
  }

  private def charsetOf(shpPath: String): String = {
    val cpg = sibling(shpPath, "cpg")
    if (Files.exists(Paths.get(cpg))) {
      val s = new String(Files.readAllBytes(Paths.get(cpg)), "ASCII").trim
      s.toUpperCase match {
        case "UTF-8" | "UTF8" => "UTF-8"
        case c if c.startsWith("885913") => "ISO-8859-13"
        case c if c.startsWith("8859") => "ISO-8859-1"
        case other => try { Charset.forName(other); other } catch { case _: Exception => "ISO-8859-1" }
      }
    } else "ISO-8859-1"
  }

  /** Read a shapefile into a DataFrame, split into `numPartitions`
   *  record ranges via the .shx index. `encoding` overrides the .cpg
   *  attribute charset (reference st_read `open_options` ENCODING);
   *  `maxBatchSize` caps records per partition (reference
   *  `max_batch_size`, st_read.cpp:676-695 — here it sets the split
   *  granularity, the Spark analog of a per-vector row cap). */
  def read(spark: SparkSession, path: String, numPartitions: Int = 0,
      encoding: String = "", maxBatchSize: Int = 0): DataFrame = {
    val schema = schemaOf(path)
    val shxBytes = Files.readAllBytes(Paths.get(sibling(path, "shx")))
    val nRecords = (shxBytes.length - 100) / 8
    val offsets = new Array[Long](nRecords)
    val shx = ByteBuffer.wrap(shxBytes).order(ByteOrder.BIG_ENDIAN)
    var i = 0
    while (i < nRecords) { offsets(i) = shx.getInt(100 + i * 8).toLong * 2; i += 1 }

    val parts = if (numPartitions > 0) numPartitions
      else if (maxBatchSize > 0) math.max(1, (nRecords + maxBatchSize - 1) / maxBatchSize)
      else math.max(1, math.min(spark.sparkContext.defaultParallelism, nRecords / 4096 + 1))
    val ranges = (0 until parts).map { p =>
      val start = p * nRecords / parts
      val end = (p + 1) * nRecords / parts
      (start, end)
    }.filter(r => r._2 > r._1)

    val charset = if (encoding.nonEmpty) {
      Charset.forName(encoding).name() // validate eagerly, driver-side
    } else charsetOf(path)
    val shpPath = path
    val dbfPath = sibling(path, "dbf")
    val offB = spark.sparkContext.broadcast(offsets)

    val rows = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (start, end) =>
      val offs = offB.value
      val shp = new RandomAccessFile(shpPath, "r")
      val dbf = new RandomAccessFile(dbfPath, "r")
      val (_, headerSize, recordSize, fields) = readDbfHeader({ dbf.seek(0); dbf })
      val iter = (start until end).iterator.map { rec =>
        // geometry record
        shp.seek(offs(rec))
        val recHead = new Array[Byte](8)
        shp.readFully(recHead)
        val contentLen = ByteBuffer.wrap(recHead).order(ByteOrder.BIG_ENDIAN).getInt(4) * 2
        val content = new Array[Byte](contentLen)
        shp.readFully(content)
        val geom = parseShape(ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN))
        // attribute record
        dbf.seek(headerSize.toLong + rec.toLong * recordSize)
        val attr = new Array[Byte](recordSize)
        dbf.readFully(attr)
        var pos = 1 // skip deletion flag
        val vals = fields.map { f =>
          val raw = new String(attr, pos, f.len, charset).trim
          pos += f.len
          f.typ match {
            case 'N' if f.dec == 0 && f.len < 19 =>
              if (raw.isEmpty || raw == "*") null else try java.lang.Long.valueOf(raw.toLong) catch { case _: Exception => null }
            case 'N' | 'F' =>
              if (raw.isEmpty || raw == "*") null else try java.lang.Double.valueOf(raw.toDouble) catch { case _: Exception => null }
            case 'L' => raw.toUpperCase match {
              case "T" | "Y" => java.lang.Boolean.TRUE
              case "F" | "N" => java.lang.Boolean.FALSE
              case _ => null
            }
            case _ => if (raw.isEmpty) null else raw
          }
        }
        Row.fromSeq(vals :+ (if (geom == null) null else Jts.write(geom)))
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = iter.hasNext; if (!h) { shp.close(); dbf.close() }; h }
        def next(): Row = iter.next()
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Parse one shape record (buffer positioned at shape type). */
  private[sources] def parseShape(bb: ByteBuffer): Geometry = {
    val gf = Jts.gf
    val shapeType = bb.getInt(0)
    val base = shapeType % 10
    val hasZ = shapeType >= 11 && shapeType <= 18
    shapeType match {
      case 0 => null
      case _ => base match {
        case 1 => // Point / PointZ / PointM
          val x = bb.getDouble(4); val y = bb.getDouble(12)
          if (hasZ && bb.capacity() >= 28) gf.createPoint(new Coordinate(x, y, bb.getDouble(20)))
          else gf.createPoint(new Coordinate(x, y))
        case 8 => // MultiPoint: bbox(32) + numPoints + points
          val n = bb.getInt(36)
          val pts = (0 until n).map { i =>
            new Coordinate(bb.getDouble(40 + i * 16), bb.getDouble(48 + i * 16))
          }
          if (hasZ) {
            // z block: zmin,zmax then n z values
            val zBase = 40 + n * 16 + 16
            (0 until n).foreach(i => pts(i).setZ(bb.getDouble(zBase + i * 8)))
          }
          gf.createMultiPoint(pts.map(gf.createPoint).toArray)
        case 3 | 5 => // PolyLine / Polygon: bbox + numParts + numPoints + parts + points
          val nParts = bb.getInt(36)
          val nPoints = bb.getInt(40)
          val partIdx = (0 until nParts).map(i => bb.getInt(44 + i * 4))
          val ptBase = 44 + nParts * 4
          val coords = new Array[Coordinate](nPoints)
          var i = 0
          while (i < nPoints) {
            coords(i) = new Coordinate(bb.getDouble(ptBase + i * 16), bb.getDouble(ptBase + 8 + i * 16))
            i += 1
          }
          if (hasZ) {
            val zBase = ptBase + nPoints * 16 + 16
            var j = 0
            while (j < nPoints) { coords(j).setZ(bb.getDouble(zBase + j * 8)); j += 1 }
          }
          val partRanges = partIdx.zip(partIdx.drop(1) :+ nPoints)
          if (base == 3) {
            val lines = partRanges.map { case (s, e) => gf.createLineString(coords.slice(s, e)) }
            if (lines.size == 1) lines.head else gf.createMultiLineString(lines.toArray)
          } else {
            assemblePolygons(partRanges.map { case (s, e) =>
              gf.createLinearRing(closeRing(coords.slice(s, e)))
            })
          }
        case other => throw new IllegalArgumentException(s"unsupported shape type: $shapeType")
      }
    }
  }

  private def closeRing(cs: Array[Coordinate]): Array[Coordinate] =
    if (cs.length >= 3 && cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()

  // ---- writer ----------------------------------------------------------

  private val MNoData = -1e39 // spec: M < -1e38 means "no data"

  /**
   * Write a shapefile set (.shp/.shx/.dbf/.cpg, UTF-8 attributes) from
   * a DataFrame with one geometry column. Shapefiles force one shape
   * class per file — the class (and Z-ness) comes from the first
   * non-null geometry; Point/MultiPoint/PolyLine/Polygon supported,
   * matching the reader. Two passes: a Spark aggregation sizes the
   * dBASE fields (max string bytes) and the extent; the records then
   * stream through the driver (single-file format, same shape as the
   * reference's GDAL COPY TO — gdal/functions/st_write.cpp:558-569).
   * Local filesystem paths (like the reader).
   */
  def write(df: DataFrame, geomCol: String, path: String): Unit =
    write(df, geomCol, path, "EPSG:4326")

  /** As `write`, with an explicit CRS for the .prj sidecar: either a
   *  supported authority code (ESRI WKT is generated — the reference's
   *  SRS copy option, gdal/functions/st_write.cpp:60-178) or a literal
   *  WKT string (detected by the '[') written verbatim. */
  def write(df: DataFrame, geomCol: String, path: String, srs: String): Unit = {
    import org.apache.spark.sql.functions.{col, count => fcount, max => fmax, octet_length}
    DriverSink.guard(df, "Shapefile", "GeoTable.writeGeoParquet")
    val prjWkt: Option[String] =
      if (srs == null || srs.isEmpty) None
      else if (srs.contains("[")) Some(srs)
      else graft.functions.Crs.esriWkt(srs).orElse(throw new IllegalArgumentException(
        s"cannot generate .prj for unsupported CRS: $srs (pass literal WKT instead)"))
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)

    // pass 1: row count, geometry extent, string field byte widths
    val aggs = Seq(fcount(col("*")).as("__n"),
      graft.GeoFunctions.st_extent_agg(col(geomCol)).as("__ext")) ++
      attrs.collect { case (f, i) if f.dataType == StringType =>
        fmax(octet_length(col(f.name))).as(s"__w$i")
      }
    val widthCols = attrs.collect { case (f, i) if f.dataType == StringType => col(s"__w$i") }
    val stat = df.agg(aggs.head, aggs.tail: _*)
      .select(Seq(col("__n"),
        graft.GeoFunctions.st_xmin(col("__ext")).as("__x0"),
        graft.GeoFunctions.st_ymin(col("__ext")).as("__y0"),
        graft.GeoFunctions.st_xmax(col("__ext")).as("__x1"),
        graft.GeoFunctions.st_ymax(col("__ext")).as("__y1")) ++ widthCols: _*)
      .collect()(0)
    val nRows = stat.getLong(0)
    def d(idx: Int): Double = if (stat.isNullAt(idx)) 0.0 else stat.getDouble(idx)
    val (x0, y0, x1, y1) = (d(1), d(2), d(3), d(4))
    val strWidth: Map[Int, Int] = attrs.collect {
      case (f, i) if f.dataType == StringType =>
        i -> math.min(254, math.max(1, stat.getAs[Any](s"__w$i") match {
          case null => 1; case n: Number => n.intValue()
        }))
    }.toMap

    // dBASE field descriptors
    case class OutField(name: String, typ: Char, len: Int, dec: Int, rowIdx: Int)
    val outFields = attrs.map { case (f, i) =>
      f.dataType match {
        // width 18 keeps the reader's integer rule (N, dec 0, len < 19 ->
        // Long); 19+-digit values overflow to the dBASE null marker
        case LongType | IntegerType | ShortType | ByteType => OutField(f.name, 'N', 18, 0, i)
        case DoubleType | FloatType => OutField(f.name, 'N', 33, 9, i)
        case BooleanType => OutField(f.name, 'L', 1, 0, i)
        case StringType => OutField(f.name, 'C', strWidth(i), 0, i)
        case other => throw new IllegalArgumentException(
          s"shapefile .dbf cannot store column ${f.name}: $other")
      }
    }

    // shape class from the first non-null geometry
    val firstGeom = df.select(col(geomCol)).filter(col(geomCol).isNotNull).head(1)
    val (baseType, hasZ) =
      if (firstGeom.isEmpty) (1, false)
      else {
        val g = Jts.read(firstGeom(0).getAs[Array[Byte]](0))
        val c = g.getCoordinate
        (shapeClassOf(g), c != null && !c.getZ.isNaN)
      }
    val shapeType = if (hasZ) baseType + 10 else baseType

    val base = path.replaceAll("\\.[sS][hH][pP]$", "")
    val shp = new RandomAccessFile(s"$base.shp", "rw"); shp.setLength(0)
    val shx = new RandomAccessFile(s"$base.shx", "rw"); shx.setLength(0)
    val dbf = new RandomAccessFile(s"$base.dbf", "rw"); dbf.setLength(0)
    try {
      writeMainHeader(shp, shapeType, x0, y0, x1, y1)
      writeMainHeader(shx, shapeType, x0, y0, x1, y1)
      writeDbfHeader(dbf, nRows.toInt, outFields.map(f => (f.name, f.typ, f.len, f.dec)))

      var recNo = 1
      var shpWords = 50L // running .shp length in 16-bit words
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val wkb = row.get(geomIdx)
        val content = shapeContent(
          if (wkb == null) null else Jts.read(wkb.asInstanceOf[Array[Byte]]), baseType, hasZ)
        val contentWords = content.length / 2
        // .shx entry: offset + content length, both in words, big-endian
        shx.writeInt(shpWords.toInt); shx.writeInt(contentWords)
        // .shp record header (big-endian) + content (little-endian)
        shp.writeInt(recNo); shp.writeInt(contentWords)
        shp.write(content)
        shpWords += 4 + contentWords
        recNo += 1
        // .dbf record
        dbf.write(' ')
        outFields.foreach { f =>
          val cell = formatDbf(row.get(f.rowIdx), f.typ, f.len, f.dec)
          dbf.write(cell)
        }
      }
      dbf.write(0x1A) // dBASE EOF

      // back-patch file lengths (16-bit words, big-endian at offset 24)
      shp.seek(24); shp.writeInt(shpWords.toInt)
      shx.seek(24); shx.writeInt(50 + (recNo - 1) * 4)
    } finally { shp.close(); shx.close(); dbf.close() }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base.cpg"),
      "UTF-8".getBytes("ASCII"))
    prjWkt.foreach(w => java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base.prj"), w.getBytes("ASCII")))
  }

  private def writeMainHeader(
      raf: RandomAccessFile, shapeType: Int,
      x0: Double, y0: Double, x1: Double, y1: Double): Unit = {
    val hdr = ByteBuffer.allocate(100)
    hdr.order(ByteOrder.BIG_ENDIAN)
    hdr.putInt(0, 9994)
    hdr.putInt(24, 50) // patched later for .shp
    hdr.order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(28, 1000)
    hdr.putInt(32, shapeType)
    hdr.putDouble(36, x0); hdr.putDouble(44, y0)
    hdr.putDouble(52, x1); hdr.putDouble(60, y1)
    // zmin/zmax/mmin/mmax left 0
    raf.write(hdr.array())
  }

  private def writeDbfHeader(
      raf: RandomAccessFile, nRecords: Int, fields: Seq[(String, Char, Int, Int)]): Unit = {
    val headerSize = 32 + fields.length * 32 + 1
    val recordSize = 1 + fields.map(_._3).sum
    val bb = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 0x03.toByte)
    bb.put(1, 26.toByte); bb.put(2, 8.toByte); bb.put(3, 12.toByte) // last-update YMD
    bb.putInt(4, nRecords)
    bb.putShort(8, headerSize.toShort)
    bb.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, typ, len, dec), i) =>
      val off = 32 + i * 32
      val nameBytes = name.getBytes("ASCII").take(10)
      var j = 0
      while (j < nameBytes.length) { bb.put(off + j, nameBytes(j)); j += 1 }
      bb.put(off + 11, typ.toByte)
      bb.put(off + 16, len.toByte)
      bb.put(off + 17, dec.toByte)
    }
    bb.put(headerSize - 1, 0x0D.toByte)
    raf.write(bb.array())
  }

  /** One fixed-width dBASE cell (space-padded; numerics right-justified). */
  private def formatDbf(v: Any, typ: Char, len: Int, dec: Int): Array[Byte] = {
    val s = (v, typ) match {
      case (null, 'L') => "?"
      case (null, _) => ""
      case (b: Boolean, 'L') => if (b) "T" else "F"
      case (n: Number, 'N') if dec == 0 =>
        val t = n.longValue().toString
        if (t.length > len) "*" else t // overflow -> dBASE null marker
      case (n: Number, 'N') =>
        val f = s"%.${dec}f".format(n.doubleValue())
        if (f.length > len) "*" else f // overflow -> dBASE null marker
      case (other, _) => other.toString
    }
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](len)
    java.util.Arrays.fill(out, ' '.toByte)
    if (typ == 'N') // right-justify
      System.arraycopy(bytes, 0, out, math.max(0, len - bytes.length),
        math.min(len, bytes.length))
    else
      System.arraycopy(bytes, 0, out, 0, math.min(len, bytes.length))
    out
  }

  private def shapeClassOf(g: Geometry): Int = g.getGeometryType match {
    case "Point" => 1
    case "LineString" | "LinearRing" | "MultiLineString" => 3
    case "Polygon" | "MultiPolygon" => 5
    case "MultiPoint" => 8
    case other => throw new IllegalArgumentException(s"shapefile cannot store $other")
  }

  /** Little-endian record content for one geometry (null -> Null shape). */
  private[sources] def shapeContent(g: Geometry, baseType: Int, hasZ: Boolean): Array[Byte] = {
    if (g == null || g.isEmpty) {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0, 0)
      return bb.array()
    }
    // a shapefile holds exactly one shape class; a row of another class
    // must fail loudly, not be silently mangled into the wrong record
    val cls = shapeClassOf(g)
    require(cls == baseType,
      s"shapefile is ${shapeClassName(baseType)} but row has ${g.getGeometryType}")
    val shapeType = if (hasZ) baseType + 10 else baseType
    val env = g.getEnvelopeInternal
    def zOf(c: Coordinate): Double = { val z = c.getZ; if (z.isNaN) 0.0 else z }

    baseType match {
      case 1 =>
        val c = g.getCoordinate
        val size = if (hasZ) 36 else 20
        val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(0, shapeType)
        bb.putDouble(4, c.x); bb.putDouble(12, c.y)
        if (hasZ) { bb.putDouble(20, zOf(c)); bb.putDouble(28, MNoData) }
        bb.array()
      case 8 =>
        val cs = g.getCoordinates
        val n = cs.length
        val size = 40 + n * 16 + (if (hasZ) 2 * (16 + n * 8) else 0)
        val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(0, shapeType)
        putBox(bb, 4, env)
        bb.putInt(36, n)
        var i = 0
        while (i < n) { bb.putDouble(40 + i * 16, cs(i).x); bb.putDouble(48 + i * 16, cs(i).y); i += 1 }
        if (hasZ) putZM(bb, 40 + n * 16, cs.map(zOf))
        bb.array()
      case 3 | 5 =>
        // parts: lines as-is; polygon rings with spec winding (shell CW,
        // holes CCW), all coordinate runs concatenated
        val parts: Seq[Array[Coordinate]] = baseType match {
          case 3 =>
            (0 until g.getNumGeometries).map(g.getGeometryN(_).getCoordinates)
          case _ =>
            (0 until g.getNumGeometries).map(g.getGeometryN(_).asInstanceOf[Polygon]).flatMap { p =>
              val shell = ringCoords(p.getExteriorRing, ccw = false)
              val holes = (0 until p.getNumInteriorRing).map(k =>
                ringCoords(p.getInteriorRingN(k), ccw = true))
              shell +: holes
            }
        }
        val nParts = parts.length
        val nPoints = parts.map(_.length).sum
        val size = 44 + nParts * 4 + nPoints * 16 + (if (hasZ) 2 * (16 + nPoints * 8) else 0)
        val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(0, shapeType)
        putBox(bb, 4, env)
        bb.putInt(36, nParts); bb.putInt(40, nPoints)
        var acc = 0
        parts.indices.foreach { i => bb.putInt(44 + i * 4, acc); acc += parts(i).length }
        val ptBase = 44 + nParts * 4
        var i = 0
        val flat = parts.flatten
        while (i < nPoints) {
          bb.putDouble(ptBase + i * 16, flat(i).x); bb.putDouble(ptBase + 8 + i * 16, flat(i).y)
          i += 1
        }
        if (hasZ) putZM(bb, ptBase + nPoints * 16, flat.map(zOf).toArray)
        bb.array()
      case other => throw new IllegalArgumentException(s"unsupported shape class $other")
    }
  }

  private def shapeClassName(base: Int): String = base match {
    case 1 => "Point"; case 3 => "PolyLine"; case 5 => "Polygon"; case 8 => "MultiPoint"
    case other => s"class $other"
  }

  private def putBox(bb: ByteBuffer, off: Int, env: Envelope): Unit = {
    bb.putDouble(off, env.getMinX); bb.putDouble(off + 8, env.getMinY)
    bb.putDouble(off + 16, env.getMaxX); bb.putDouble(off + 24, env.getMaxY)
  }

  /** Z block (zmin,zmax,z[]) followed by an M block of no-data. */
  private def putZM(bb: ByteBuffer, off: Int, zs: Array[Double]): Unit = {
    val n = zs.length
    bb.putDouble(off, if (n == 0) 0 else zs.min)
    bb.putDouble(off + 8, if (n == 0) 0 else zs.max)
    var i = 0
    while (i < n) { bb.putDouble(off + 16 + i * 8, zs(i)); i += 1 }
    val mOff = off + 16 + n * 8
    bb.putDouble(mOff, MNoData); bb.putDouble(mOff + 8, MNoData)
    i = 0
    while (i < n) { bb.putDouble(mOff + 16 + i * 8, MNoData); i += 1 }
  }

  private def ringCoords(ring: LineString, ccw: Boolean): Array[Coordinate] = {
    val cs = closeRing(ring.getCoordinates)
    val isCcw = org.locationtech.jts.algorithm.Orientation.isCCW(
      Jts.gf.getCoordinateSequenceFactory.create(cs))
    if (isCcw == ccw) cs else cs.reverse
  }

  /** Shapefile winding: clockwise rings are shells, counter-clockwise
   *  holes; each hole belongs to the shell that contains it. */
  private def assemblePolygons(rings: Seq[LinearRing]): Geometry = {
    val gf = Jts.gf
    val (shells, holes) = rings.partition(r =>
      !org.locationtech.jts.algorithm.Orientation.isCCW(r.getCoordinateSequence))
    if (shells.isEmpty) {
      // degenerate: all CCW — treat each ring as its own polygon
      if (holes.size == 1) return gf.createPolygon(holes.head)
      return gf.createMultiPolygon(holes.map(h => gf.createPolygon(h)).toArray)
    }
    val shellPolys = shells.map(s => gf.createPolygon(s))
    val assigned = shells.map(_ => scala.collection.mutable.ArrayBuffer[LinearRing]())
    holes.foreach { h =>
      val pt = gf.createPoint(h.getCoordinateN(0))
      val owner = shellPolys.indexWhere(_.covers(pt))
      if (owner >= 0) assigned(owner) += h
    }
    val polys = shells.indices.map(i => gf.createPolygon(shells(i), assigned(i).toArray))
    if (polys.size == 1) polys.head else gf.createMultiPolygon(polys.toArray)
  }
}
