package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Geometry, LineString, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}

/**
 * ESRI File Geodatabase (OpenFileGDB) writer — the can_create symmetry
 * for [[OpenFileGdb]] (the reference writes FGDB through GDAL's
 * OpenFileGDB driver, `gdal/functions/st_write.cpp:558-569`). Authors
 * the same published reverse-engineered table layout the reader and
 * `tools/make_gdb_fixture.py` implement: a `.gdb` directory with
 * `a00000001` = GDB_SystemCatalog and one `a%08x` .gdbtable/.gdbtablx
 * pair per layer, rows as size-prefixed blobs (null bitmap over the
 * nullable fields, values in field order, OID implicit), geometry in
 * the Esri compressed-shape encoding (scaled varuints, signed-varint
 * vertex deltas running across parts, shells clockwise / holes
 * counter-clockwise).
 *
 * Coordinates quantize to the layer's xyscale grid (default 1e-4 —
 * FGDB stores scaled integers by design); callers needing exact
 * doubles use GeoParquet. Single-file-family format → rows stream
 * through the driver like the gpkg/shp/sqlite writers.
 */
object GdbWrite {

  private val Wgs84Wkt =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",""" +
    """SPHEROID["WGS_1984",6378137.0,298.257223563]],""" +
    """PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  // ---- primitive encoders (the published FGDB varints) -------------------

  private def varuint(n0: Long): Array[Byte] = {
    require(n0 >= 0, s"varuint of negative $n0")
    var n = n0
    val out = new java.io.ByteArrayOutputStream(10)
    var done = false
    while (!done) {
      val b = (n & 0x7F).toInt
      n >>>= 7
      if (n != 0) out.write(b | 0x80) else { out.write(b); done = true }
    }
    out.toByteArray
  }

  /** FGDB signed varint: first byte carries the sign in 0x40 and 6
   *  value bits; later bytes 7 bits; 0x80 = continuation everywhere. */
  private def varint(n0: Long): Array[Byte] = {
    val sign = if (n0 < 0) 0x40 else 0
    var n = if (n0 < 0) -n0 else n0
    val first = ((n & 0x3F).toInt | sign)
    n >>>= 6
    val out = new java.io.ByteArrayOutputStream(10)
    if (n != 0) {
      out.write(first | 0x80)
      var done = false
      while (!done) {
        val b = (n & 0x7F).toInt
        n >>>= 7
        if (n != 0) out.write(b | 0x80) else { out.write(b); done = true }
      }
    } else out.write(first)
    out.toByteArray
  }

  private def utf16Name(s: String): Array[Byte] = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    require(b.length / 2 < 256, s"FGDB name too long: $s")
    Array((b.length / 2).toByte) ++ b
  }

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le64(v: Long): Array[Byte] =
    (0 to 7).map(i => (v >> (8 * i)).toByte).toArray
  private def leF32(v: Float): Array[Byte] = le32(java.lang.Float.floatToIntBits(v))
  private def leF64(v: Double): Array[Byte] = le64(java.lang.Double.doubleToLongBits(v))

  // ---- field descriptors --------------------------------------------------

  private def fieldDesc(name: String, ftype: Int, nullable: Boolean): Array[Byte] = {
    val flags = if (nullable) 1 else 0
    val head = utf16Name(name) ++ utf16Name("") :+ ftype.toByte
    ftype match {
      case 6 => head ++ Array[Byte](4, 2)
      case 4 => head ++ le32(254) :+ flags.toByte
      case 0 | 1 | 2 | 3 | 5 =>
        val width = Map(0 -> 2, 1 -> 4, 2 -> 4, 3 -> 8, 5 -> 8)(ftype)
        head ++ Array(width.toByte, flags.toByte)
      case other => throw new IllegalArgumentException(s"FGDB field type $other")
    }
  }

  private def geomFieldDesc(name: String, wkt: String, nullable: Boolean,
      xOrigin: Double, yOrigin: Double, xyScale: Double,
      extent: (Double, Double, Double, Double)): Array[Byte] = {
    val w = wkt.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    utf16Name(name) ++ utf16Name("") ++
      Array[Byte](7, 0, if (nullable) 1 else 0) ++
      le16(w.length / 2) ++ w ++
      Array[Byte](0) ++ // no Z, no M
      leF64(xOrigin) ++ leF64(yOrigin) ++ leF64(xyScale) ++
      leF64(0.001) ++ // xytolerance
      leF64(extent._1) ++ leF64(extent._2) ++ leF64(extent._3) ++ leF64(extent._4) ++
      (Array[Byte](0) ++ le32(1) ++ leF64(0.0)) // spatial-index grids
  }

  // ---- Esri compressed-shape encode --------------------------------------

  private final class ShapeEnc(xOrigin: Double, yOrigin: Double, scale: Double) {
    private def sx(x: Double): Long = math.round((x - xOrigin) * scale)
    private def sy(y: Double): Long = math.round((y - yOrigin) * scale)

    def point(p: Point): Array[Byte] =
      varuint(1) ++ varuint(sx(p.getX) + 1) ++ varuint(sy(p.getY) + 1)

    def multipoint(m: MultiPoint): Array[Byte] = {
      val cs = (0 until m.getNumGeometries).map(i =>
        m.getGeometryN(i).asInstanceOf[Point].getCoordinate)
      val xs = cs.map(c => sx(c.x)); val ys = cs.map(c => sy(c.y))
      val out = new java.io.ByteArrayOutputStream()
      out.write(varuint(8)); out.write(varuint(cs.length))
      out.write(varuint(xs.min)); out.write(varuint(ys.min))
      out.write(varuint(xs.max - xs.min)); out.write(varuint(ys.max - ys.min))
      var px = 0L; var py = 0L
      cs.indices.foreach { i =>
        out.write(varint(xs(i) - px)); out.write(varint(ys(i) - py))
        px = xs(i); py = ys(i)
      }
      out.toByteArray
    }

    /** shapeType 3 = polyline, 5 = polygon; deltas run ACROSS parts. */
    def multipart(shapeType: Int, parts: Seq[Array[org.locationtech.jts.geom.Coordinate]]): Array[Byte] = {
      val pts = parts.flatten
      val xs = pts.map(c => sx(c.x)); val ys = pts.map(c => sy(c.y))
      val out = new java.io.ByteArrayOutputStream()
      out.write(varuint(shapeType))
      out.write(varuint(pts.length)); out.write(varuint(parts.length))
      out.write(varuint(xs.min)); out.write(varuint(ys.min))
      out.write(varuint(xs.max - xs.min)); out.write(varuint(ys.max - ys.min))
      parts.dropRight(1).foreach(p => out.write(varuint(p.length)))
      var px = 0L; var py = 0L
      pts.indices.foreach { i =>
        out.write(varint(xs(i) - px)); out.write(varint(ys(i) - py))
        px = xs(i); py = ys(i)
      }
      out.toByteArray
    }

    /** Esri ring order: shells clockwise, holes counter-clockwise. */
    private def rings(p: Polygon): Seq[Array[org.locationtech.jts.geom.Coordinate]] = {
      def oriented(r: LineString, wantCcw: Boolean): Array[org.locationtech.jts.geom.Coordinate] = {
        val cs = r.getCoordinates
        if (Orientation.isCCW(cs) == wantCcw) cs else cs.reverse
      }
      oriented(p.getExteriorRing, wantCcw = false) +:
        (0 until p.getNumInteriorRing).map(i => oriented(p.getInteriorRingN(i), wantCcw = true))
    }

    def geometry(g: Geometry): Array[Byte] = g match {
      case p: Point => point(p)
      case m: MultiPoint => multipoint(m)
      case l: LineString => multipart(3, Seq(l.getCoordinates))
      case m: MultiLineString =>
        multipart(3, (0 until m.getNumGeometries).map(i =>
          m.getGeometryN(i).asInstanceOf[LineString].getCoordinates))
      case p: Polygon => multipart(5, rings(p))
      case m: MultiPolygon =>
        multipart(5, (0 until m.getNumGeometries)
          .flatMap(i => rings(m.getGeometryN(i).asInstanceOf[Polygon])))
      case other => throw new IllegalArgumentException(
        s"FGDB writer: unsupported geometry ${other.getGeometryType}")
    }
  }

  // ---- table assembly ------------------------------------------------------

  /** fields include the OID; rows are pre-encoded value arrays
   *  (null = NULL; geometry pre-packed bytes; OID never stored). */
  private def writeTable(pathBase: String, geomTypeByte: Int,
      fields: Seq[(String, Int, Boolean, Array[Byte])], // name, type, nullable, desc
      rows: Iterator[(Seq[Array[Byte]], Seq[Boolean])]): Int = {
    val fdesc = fields.map(_._4).reduce(_ ++ _)
    val section = le32(4) ++ Array(geomTypeByte.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      le16(fields.length) ++ fdesc
    val nNullable = fields.count { case (_, t, nullable, _) => nullable && t != 6 }
    val bitmapBytes = (nNullable + 7) / 8

    val data = new java.io.ByteArrayOutputStream()
    data.write(le32(section.length)); data.write(section)
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    var pos = 40L + 4 + section.length
    var maxBlob = 0
    var nRows = 0
    rows.foreach { case (vals, nulls) =>
      val bitmap = new Array[Byte](bitmapBytes)
      nulls.zipWithIndex.foreach { case (isNull, j) =>
        if (isNull) bitmap(j / 8) = (bitmap(j / 8) | (1 << (j % 8))).toByte
      }
      val body = new java.io.ByteArrayOutputStream()
      body.write(bitmap)
      vals.foreach(v => if (v != null) body.write(v))
      val blob = body.toByteArray
      offsets += pos
      data.write(le32(blob.length)); data.write(blob)
      pos += 4 + blob.length
      maxBlob = math.max(maxBlob, blob.length)
      nRows += 1
    }
    val fileSize = 40L + data.size()
    val header = le32(3) ++ le32(nRows) ++ le32(maxBlob) ++
      le32(5) ++ le32(0) ++ le32(0) ++ le64(fileSize) ++ le64(40L)
    val fos = new java.io.FileOutputStream(pathBase + ".gdbtable")
    try { fos.write(header); data.writeTo(fos) } finally fos.close()

    val nBlocks = (nRows + 1023) / 1024
    val tx = new java.io.FileOutputStream(pathBase + ".gdbtablx")
    try {
      tx.write(le32(3)); tx.write(le32(nBlocks))
      tx.write(le32(nRows)); tx.write(le32(5))
      (0 until nBlocks * 1024).foreach { i =>
        val off = if (i < offsets.length) offsets(i) else 0L
        tx.write(le64(off).take(5))
      }
      tx.write(new Array[Byte](16))
    } finally tx.close()
    nRows
  }

  /**
   * Write `df` as a one-layer `.gdb` directory. `geomCol` holds WKB;
   * the OBJECTID carries the rowid implicitly. `xyScale` is the
   * coordinate quantization grid (FGDB stores scaled integers).
   */
  def write(df: DataFrame, geomCol: String, path: String,
      layer: String = "layer", srsWkt: String = Wgs84Wkt,
      xyScale: Double = 10000.0): Unit = {
    DriverSink.guard(df, "FileGDB", "GeoTable.writeGeoParquet")
    require(path.toLowerCase.stripSuffix("/").endsWith(".gdb"),
      s"FGDB writer: path must end in .gdb ($path)")
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    def ftypeOf(dt: DataType): Int = dt match {
      case ShortType => 0
      case IntegerType | LongType | ByteType | BooleanType => 1
      case FloatType => 2
      case DoubleType => 3
      case TimestampType => 5
      case StringType => 4
      case other => throw new IllegalArgumentException(
        s"FGDB writer: unsupported attribute type ${other.simpleString}")
    }

    // one pass for the spatial frame (extent + geometry class), then
    // the driver-streamed row pass — same shape as the other writers
    val geoms = df.select(org.apache.spark.sql.functions.col(geomCol))
      .filter(org.apache.spark.sql.functions.col(geomCol).isNotNull)
    val (x0, y0, x1, y1) = GeoTable.extentOf(geoms.toDF(geomCol), geomCol)
    val firstGeom = geoms.head(1)
    val geomTypeByte =
      if (firstGeom.isEmpty) 0
      else graft.functions.Jts.read(firstGeom(0).getAs[Array[Byte]](0)).getGeometryType match {
        case "Point" => 1
        case "MultiPoint" => 2
        case "LineString" | "MultiLineString" | "LinearRing" => 3
        case "Polygon" | "MultiPolygon" => 4
        case other => throw new IllegalArgumentException(s"FGDB writer: $other")
      }
    // scaled varuints must be non-negative: origins at/below the extent
    val xOrigin = math.floor(x0) - 1.0
    val yOrigin = math.floor(y0) - 1.0
    val enc = new ShapeEnc(xOrigin, yOrigin, xyScale)

    val dir = new java.io.File(path.stripSuffix("/"))
    if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()

    // GDB_SystemCatalog (a00000001): 8 system names, user tables at 9+
    val systemNames = Seq("GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs",
      "GDB_Items", "GDB_ItemTypes", "GDB_ItemRelationships",
      "GDB_ItemRelationshipTypes", "GDB_ReplicaLog")
    val catFields = Seq(
      ("ID", 6, false, fieldDesc("ID", 6, nullable = false)),
      ("Name", 4, true, fieldDesc("Name", 4, nullable = true)),
      ("FileFormat", 1, true, fieldDesc("FileFormat", 1, nullable = true)))
    val catRows = (systemNames :+ layer).map { n =>
      (Seq[Array[Byte]](null,
        varuint(n.getBytes("UTF-8").length) ++ n.getBytes("UTF-8"), le32(0)),
        Seq(false, false))
    }
    writeTable(new java.io.File(dir, "a00000001").getPath, 0, catFields,
      catRows.iterator)

    val layerFields =
      attrs.map { case (f, _) =>
        (f.name, ftypeOf(f.dataType), true, fieldDesc(f.name, ftypeOf(f.dataType), nullable = true))
      }.toSeq
    val fields =
      ("OBJECTID", 6, false, fieldDesc("OBJECTID", 6, nullable = false)) +:
      layerFields :+
      (geomCol, 7, true, geomFieldDesc(geomCol, srsWkt, nullable = true,
        xOrigin, yOrigin, xyScale, (x0, y0, x1, y1)))

    var declared = "" // one geometry class per layer, like gpkg/sqlite
    val rowsIt = df.toLocalIterator().asScala.map { row =>
      val attrVals: Seq[Array[Byte]] = attrs.toIndexedSeq.map { case (f, i) =>
        if (row.isNullAt(i)) null
        else (row.get(i), ftypeOf(f.dataType)) match {
          case (v: java.lang.Number, 0) => le16(v.intValue())
          case (v: java.lang.Number, 1) =>
            val l = v.longValue()
            require(l >= Int.MinValue && l <= Int.MaxValue,
              s"FGDB int32 overflow in ${f.name}: $l")
            le32(l.toInt)
          case (v: Boolean, 1) => le32(if (v) 1 else 0)
          case (v: java.lang.Number, 2) => leF32(v.floatValue())
          case (v: java.lang.Number, 3) => leF64(v.doubleValue())
          case (v: java.sql.Timestamp, 5) =>
            leF64(v.getTime / 86400000.0 + 25569.0) // days since 1899-12-30
          case (v, 4) =>
            val b = String.valueOf(v).getBytes("UTF-8")
            varuint(b.length) ++ b
          case (v, t) => throw new IllegalArgumentException(
            s"FGDB writer: cannot encode $v as type $t")
        }
      }
      val geomVal =
        if (row.isNullAt(geomIdx)) null
        else {
          val jts = graft.functions.Jts.read(row.getAs[Array[Byte]](geomIdx))
          val cls = jts.getGeometryType match {
            case "Point" => "1"; case "MultiPoint" => "2"
            case "LineString" | "MultiLineString" | "LinearRing" => "3"
            case _ => "4"
          }
          if (declared.isEmpty) declared = cls
          require(declared == cls,
            s"layer '$layer' mixes geometry classes ($declared vs $cls)")
          val packed = enc.geometry(jts)
          varuint(packed.length) ++ packed
        }
      (Seq[Array[Byte]](null) ++ attrVals :+ geomVal,
        attrVals.map(_ == null) :+ (geomVal == null))
    }
    writeTable(new java.io.File(dir, "a00000009").getPath, geomTypeByte,
      fields, rowsIt)
  }
}
