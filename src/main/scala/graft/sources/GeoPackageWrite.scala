package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

/**
 * GeoPackage (.gpkg) writer: a minimal single-pass SQLite database
 * writer (public file format, sqlite.org/fileformat2.html) plus the
 * GeoPackage catalog tables. Writes table b-trees bottom-up with
 * sequential rowids — leaves fill greedily in rowid order, interior
 * levels assemble over them (same construction the packed R-tree
 * writer uses); large cells spill to standard overflow chains. No
 * freelist, no indices, schema format 4, UTF-8.
 *
 * Single-file format → features stream through the driver
 * (`toLocalIterator`), like the FlatGeobuf/Shapefile writers and the
 * reference's single-writer COPY TO (gdal/functions/st_write.cpp:
 * 558-569). Local filesystem paths.
 */
object GeoPackageWrite {

  private val PageSize = 4096
  private val Usable = PageSize // reserved-per-page = 0
  private val MaxLocal = Usable - 35
  private val MinLocal = (Usable - 12) * 32 / 255 - 23

  // ---- record encoding -------------------------------------------------

  private def varintBytes(v: Long): Array[Byte] = {
    require(v >= 0, "negative varints unsupported here (rowids/lengths only)")
    if (v == 0) return Array(0.toByte)
    var groups = List.empty[Byte]
    var x = v
    while (x != 0) { groups ::= (x & 0x7F).toByte; x >>>= 7 }
    groups.zipWithIndex.map { case (b, i) =>
      if (i < groups.length - 1) (b | 0x80).toByte else b
    }.toArray
  }

  /** One record payload (header of serial types + values). `null`
   *  values encode serial 0; the rowid-alias column passes null. */
  private def record(raw: Seq[Any]): Array[Byte] = {
    val values = raw.map {
      case i: Int => i.toLong; case s: Short => s.toLong; case b: Byte => b.toLong
      case f: Float => f.toDouble
      case v => v
    }
    val bodies = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val serials = values.map {
      case null => bodies += Array.empty[Byte]; 0L
      case b: Boolean => bodies += Array.empty[Byte]; if (b) 9L else 8L
      case l: Long =>
        if (l >= -128 && l <= 127) { bodies += Array(l.toByte); 1L }
        else if (l >= -32768 && l <= 32767) {
          bodies += Array((l >> 8).toByte, l.toByte); 2L
        } else if (l >= Int.MinValue && l <= Int.MaxValue) {
          bodies += Array((l >> 24).toByte, (l >> 16).toByte, (l >> 8).toByte, l.toByte); 4L
        } else {
          bodies += (7 to 0 by -1).map(i => (l >> (8 * i)).toByte).toArray; 6L
        }
      case d: Double =>
        val bits = java.lang.Double.doubleToLongBits(d)
        bodies += (7 to 0 by -1).map(i => (bits >> (8 * i)).toByte).toArray; 7L
      case s: String =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        bodies += b; 13L + 2L * b.length
      case b: Array[Byte] => bodies += b; 12L + 2L * b.length
      case other => throw new IllegalArgumentException(s"gpkg writer: unsupported value $other")
    }
    val serialBytes = serials.flatMap(varintBytes).toArray
    // header length varint includes itself — sizes here stay < 2 GiB so
    // the fixed-point iteration converges in <= 2 steps
    var hdrLen = serialBytes.length + 1
    if (varintBytes(hdrLen).length > 1) hdrLen = serialBytes.length + varintBytes(hdrLen).length
    val out = new java.io.ByteArrayOutputStream()
    out.write(varintBytes(hdrLen))
    out.write(serialBytes)
    bodies.foreach(out.write)
    out.toByteArray
  }

  // ---- page-level writer -----------------------------------------------

  private final class Db(raf: RandomAccessFile) {
    private var nPages = 0
    def pageCount: Int = nPages
    def alloc(): Int = { nPages += 1; nPages }
    def writePage(n: Int, data: Array[Byte]): Unit = {
      require(data.length == PageSize)
      raf.seek((n - 1).toLong * PageSize)
      raf.write(data)
    }
  }

  /** Append one cell's payload, spilling to overflow pages as needed.
   *  Returns (localPart, overflowPageOrZero). */
  private def spill(db: Db, payload: Array[Byte]): (Array[Byte], Int) = {
    if (payload.length <= MaxLocal) return (payload, 0)
    val k = MinLocal + (payload.length - MinLocal) % (Usable - 4)
    val local = if (k <= MaxLocal) k else MinLocal
    var rest = payload.drop(local)
    // chain pages front-to-back: allocate all, then link
    val chain = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    while (rest.nonEmpty) {
      val take = math.min(Usable - 4, rest.length)
      chain += ((db.alloc(), rest.take(take)))
      rest = rest.drop(take)
    }
    chain.zipWithIndex.foreach { case ((page, data), i) =>
      val bb = ByteBuffer.allocate(PageSize)
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0, if (i + 1 < chain.length) chain(i + 1)._1 else 0)
      System.arraycopy(data, 0, bb.array(), 4, data.length)
      db.writePage(page, bb.array())
    }
    (payload.take(local), chain.head._1)
  }

  /** Build a table b-tree from (rowid, recordPayload) pairs in rowid
   *  order; returns the root page. `reserveRoot` forces the root onto
   *  a pre-allocated page (page 1 for sqlite_master). */
  private def writeTable(
      db: Db, rows: Iterator[(Long, Array[Byte])], reservedRoot: Int = 0): Int = {
    case class Leaf(page: Int, maxRowid: Long)
    val leaves = scala.collection.mutable.ArrayBuffer[Leaf]()
    val cells = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var cellBytes = 0
    var lastRowid = 0L
    def headerRoom(page: Int) = if (page == 1) 100 else 0

    def flushLeaf(target: Int = 0): Unit = {
      if (cells.isEmpty) return
      val page = if (target != 0) target else db.alloc()
      val hdrOff = headerRoom(page)
      val bb = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
      bb.put(hdrOff, 0x0D.toByte)
      bb.putShort(hdrOff + 3, cells.length.toShort)
      var content = PageSize
      val ptrBase = hdrOff + 8
      cells.zipWithIndex.foreach { case (c, i) =>
        content -= c.length
        System.arraycopy(c, 0, bb.array(), content, c.length)
        bb.putShort(ptrBase + 2 * i, content.toShort)
      }
      bb.putShort(hdrOff + 5, content.toShort)
      db.writePage(page, bb.array())
      leaves += Leaf(page, lastRowid)
      cells.clear(); cellBytes = 0
    }

    while (rows.hasNext) {
      val (rowid, payload) = rows.next()
      val (local, overflow) = spill(db, payload)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(varintBytes(payload.length))
      bos.write(varintBytes(rowid))
      bos.write(local)
      if (overflow != 0) {
        val ob = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        ob.putInt(0, overflow)
        bos.write(ob.array())
      }
      val cell = bos.toByteArray
      // leaf capacity: header + 2-byte pointer per cell + content; a
      // reserved-root table keeps a 100-byte margin so its single leaf
      // can live on page 1 (which carries the database header)
      val hdrMargin = if (reservedRoot != 0) 108 else 8
      if (cells.nonEmpty &&
          hdrMargin + 2 * (cells.length + 1) + cellBytes + cell.length > PageSize - 8)
        flushLeaf()
      cells += cell; cellBytes += cell.length; lastRowid = rowid
    }
    // a reserved-root table that never spilled gets its leaf AS the root
    if (reservedRoot != 0 && leaves.isEmpty && cells.nonEmpty) {
      flushLeaf(reservedRoot)
      return reservedRoot
    }
    flushLeaf()
    if (leaves.isEmpty) { // empty table: a single empty leaf
      val page = if (reservedRoot != 0) reservedRoot else db.alloc()
      val hdrOff = headerRoom(page)
      val bb = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
      bb.put(hdrOff, 0x0D.toByte)
      bb.putShort(hdrOff + 5, PageSize.toShort)
      db.writePage(page, bb.array())
      return page
    }

    // interior levels bottom-up until a single root remains
    var level: Seq[(Int, Long)] = leaves.map(l => (l.page, l.maxRowid)).toSeq
    while (level.length > 1) {
      val parents = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      // an interior page holds ~ (PageSize-12)/(4+9+2) children minimum;
      // cap conservatively at 200 per parent
      level.grouped(200).foreach { group =>
        val isRootCandidate = level.length <= 200 && reservedRoot != 0
        val page = if (isRootCandidate) reservedRoot else db.alloc()
        val hdrOff = headerRoom(page)
        val bb = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
        bb.put(hdrOff, 0x05.toByte)
        val kids = group.dropRight(1)
        bb.putShort(hdrOff + 3, kids.length.toShort)
        bb.putInt(hdrOff + 8, group.last._1) // right-most pointer
        var content = PageSize
        val ptrBase = hdrOff + 12
        kids.zipWithIndex.foreach { case ((child, maxRowid), i) =>
          val cell = {
            val bos = new java.io.ByteArrayOutputStream()
            val cb = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
            cb.putInt(0, child)
            bos.write(cb.array()); bos.write(varintBytes(maxRowid))
            bos.toByteArray
          }
          content -= cell.length
          System.arraycopy(cell, 0, bb.array(), content, cell.length)
          bb.putShort(ptrBase + 2 * i, content.toShort)
        }
        bb.putShort(hdrOff + 5, content.toShort)
        db.writePage(page, bb.array())
        parents += ((page, group.last._2))
      }
      level = parents.toSeq
    }
    val rootPage = level.head._1
    if (reservedRoot != 0 && rootPage != reservedRoot) {
      // single-leaf table whose root must live on the reserved page:
      // rebuild impossible here, so point a 0-cell interior at it
      val hdrOff = headerRoom(reservedRoot)
      val bb = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
      bb.put(hdrOff, 0x05.toByte)
      bb.putInt(hdrOff + 8, rootPage)
      bb.putShort(hdrOff + 5, PageSize.toShort)
      db.writePage(reservedRoot, bb.array())
      return reservedRoot
    }
    rootPage
  }

  // ---- GeoPackage assembly ---------------------------------------------

  private def sqlTypeOf(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType => "INTEGER"
    case DoubleType | FloatType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case _ => "TEXT"
  }

  private def gpb(wkb: Array[Byte], srsId: Int): Array[Byte] = {
    if (wkb == null) return null
    val bb = ByteBuffer.allocate(8 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 'G'.toByte); bb.put(1, 'P'.toByte); bb.put(2, 0.toByte)
    bb.put(3, 0x01.toByte) // LE, no envelope
    bb.putInt(4, srsId)
    System.arraycopy(wkb, 0, bb.array(), 8, wkb.length)
    bb.array()
  }

  /**
   * Write `df` as a one-layer GeoPackage. `geomCol` holds WKB; all
   * other columns become typed attribute columns; an implicit `fid`
   * INTEGER PRIMARY KEY carries the rowid.
   */
  def write(df: DataFrame, geomCol: String, path: String,
      layer: String = "layer", srsId: Int = 4326): Unit = {
    DriverSink.guard(df, "GeoPackage", "GeoTable.writeGeoParquet")
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    val geomType = {
      val first = df.select(org.apache.spark.sql.functions.col(geomCol))
        .filter(org.apache.spark.sql.functions.col(geomCol).isNotNull).head(1)
      if (first.isEmpty) "GEOMETRY"
      else graft.functions.Jts.read(first(0).getAs[Array[Byte]](0))
        .getGeometryType match {
          case "LinearRing" => "LINESTRING"
          case t => t.toUpperCase
        }
    }
    val (x0, y0, x1, y1) = GeoTable.extentOf(
      df.filter(org.apache.spark.sql.functions.col(geomCol).isNotNull), geomCol)

    val colDefs = attrs.map { case (f, _) => s""""${f.name}" ${sqlTypeOf(f.dataType)}""" }
    val createSql =
      s"""CREATE TABLE "$layer" ("fid" INTEGER PRIMARY KEY, """ +
        (colDefs :+ s""""$geomCol" $geomType""").mkString(", ") + ")"

    val file = new java.io.File(path)
    if (file.exists()) file.delete()
    val raf = new RandomAccessFile(file, "rw")
    try {
      val db = new Db(raf)
      val page1 = db.alloc() // sqlite_master root, filled last
      require(page1 == 1)

      // feature table
      var rowid = 0L
      val featureRoot = writeTable(db, df.toLocalIterator().asScala.map { row =>
        rowid += 1
        // one declared class per layer: a row of another class must fail
        // loudly, never be silently written under the wrong declaration
        row.get(geomIdx) match {
          case b: Array[Byte] if geomType != "GEOMETRY" =>
            val t = graft.functions.Jts.read(b).getGeometryType.toUpperCase
            require(t == geomType || (t == "LINEARRING" && geomType == "LINESTRING"),
              s"layer '$layer' is declared $geomType but row $rowid has $t")
          case _ =>
        }
        val vals = Seq[Any](null) ++ // fid = rowid alias
          attrs.map { case (f, i) =>
            (row.get(i), f.dataType) match {
              case (null, _) => null
              case (v: java.lang.Number, LongType | IntegerType | ShortType | ByteType) => v.longValue()
              case (v: java.lang.Number, DoubleType | FloatType) => v.doubleValue()
              case (v: Boolean, _) => v
              case (v: Array[Byte], _) => v
              case (v, _) => v.toString
            }
          } ++ Seq(gpb(row.get(geomIdx) match {
            case null => null; case b => b.asInstanceOf[Array[Byte]]
          }, srsId))
        (rowid, record(vals))
      })

      // gpkg catalog tables (spec-required srs rows -1, 0, plus the CRS).
      // Catalog DDL is written WITHOUT the spec's TEXT PRIMARY KEY /
      // UNIQUE constraints: those imply sqlite auto-indexes this writer
      // does not build, and their absence makes sqlite report the file
      // malformed. Readers introspect via SELECT, not constraints.
      // (fid INTEGER PRIMARY KEY is fine — a rowid alias needs no index.)
      val srsSql = """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)"""
      val srsRoot = writeTable(db, Iterator(
        (1L, record(Seq[Any]("Undefined cartesian SRS", -1L, "NONE", -1L, "undefined", null))),
        (2L, record(Seq[Any]("Undefined geographic SRS", 0L, "NONE", 0L, "undefined", null))),
        (3L, record(Seq[Any](s"EPSG:$srsId", srsId.toLong, "EPSG", srsId.toLong, "GEOGCS[\"WGS 84\"]", null)))))
      val contentsSql = """CREATE TABLE gpkg_contents (table_name TEXT NOT NULL, data_type TEXT NOT NULL, identifier TEXT, description TEXT DEFAULT '', last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
      val contentsRoot = writeTable(db, Iterator(
        (1L, record(Seq[Any](layer, "features", layer, "", "2026-01-01T00:00:00Z", x0, y0, x1, y1, srsId.toLong)))))
      val gcSql = """CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL)"""
      val gcRoot = writeTable(db, Iterator(
        (1L, record(Seq[Any](layer, geomCol, geomType, srsId.toLong, 0L, 0L)))))

      // sqlite_master on page 1
      val master = Seq(
        ("gpkg_spatial_ref_sys", srsRoot, srsSql),
        ("gpkg_contents", contentsRoot, contentsSql),
        ("gpkg_geometry_columns", gcRoot, gcSql),
        (layer, featureRoot, createSql))
      writeTable(db, master.zipWithIndex.iterator.map { case ((name, root, sql), i) =>
        ((i + 1).toLong,
          record(Seq[Any]("table", name, name, root.toLong, sql)))
      }, reservedRoot = page1)

      // database header over page 1's first 100 bytes
      raf.seek(0)
      val hdr = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      hdr.put("SQLite format 3\u0000".getBytes("ISO-8859-1"))
      hdr.putShort(16, PageSize.toShort)
      hdr.put(18, 1.toByte); hdr.put(19, 1.toByte) // file format versions
      hdr.put(21, 64.toByte); hdr.put(22, 32.toByte); hdr.put(23, 32.toByte)
      hdr.putInt(24, 1) // change counter
      hdr.putInt(28, db.pageCount)
      hdr.putInt(40, 1) // schema cookie
      hdr.putInt(44, 4) // schema format
      hdr.putInt(56, 1) // text encoding UTF-8
      hdr.putInt(60, 10300) // user_version: GeoPackage 1.3
      hdr.putInt(68, 0x47504B47) // application_id 'GPKG' (68, NOT 64 = vacuum flag)
      hdr.putInt(92, 1) // version-valid-for = change counter
      hdr.putInt(96, 3045001) // a plausible sqlite version number
      raf.write(hdr.array())
      raf.setLength(db.pageCount.toLong * PageSize)
    } finally raf.close()
  }

  /**
   * Write `df` as a one-layer SpatiaLite database (.sqlite) — the
   * can_create symmetry for the Gaia reader [[Spatialite]] (reference
   * COPY TO writes through any can_create GDAL driver,
   * gdal/functions/st_write.cpp:558-569). Same single-pass SQLite
   * b-tree core as the GeoPackage writer; only the catalog tables
   * (spatial_ref_sys, geometry_columns) and the geometry encoding
   * (Gaia blobs instead of GPB) differ.
   */
  def writeSpatialite(df: DataFrame, geomCol: String, path: String,
      layer: String = "layer", srid: Int = 4326): Unit = {
    DriverSink.guard(df, "SpatiaLite", "GeoTable.writeGeoParquet")
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    val firstGeom = df.select(org.apache.spark.sql.functions.col(geomCol))
      .filter(org.apache.spark.sql.functions.col(geomCol).isNotNull).head(1)
    val (gaiaClass, geomDecl) =
      if (firstGeom.isEmpty) (0, "GEOMETRY")
      else graft.functions.Jts.read(firstGeom(0).getAs[Array[Byte]](0))
        .getGeometryType match {
          case "Point" => (1, "POINT")
          case "LineString" | "LinearRing" => (2, "LINESTRING")
          case "Polygon" => (3, "POLYGON")
          case "MultiPoint" => (4, "MULTIPOINT")
          case "MultiLineString" => (5, "MULTILINESTRING")
          case "MultiPolygon" => (6, "MULTIPOLYGON")
          case _ => (7, "GEOMETRYCOLLECTION")
        }

    val colDefs = attrs.map { case (f, _) => s""""${f.name}" ${sqlTypeOf(f.dataType)}""" }
    val createSql =
      s"""CREATE TABLE "$layer" ("pk" INTEGER PRIMARY KEY, """ +
        (colDefs :+ s""""$geomCol" $geomDecl""").mkString(", ") + ")"

    val file = new java.io.File(path)
    if (file.exists()) file.delete()
    val raf = new RandomAccessFile(file, "rw")
    try {
      val db = new Db(raf)
      val page1 = db.alloc()
      require(page1 == 1)

      var rowid = 0L
      val featureRoot = writeTable(db, df.toLocalIterator().asScala.map { row =>
        rowid += 1
        val vals = Seq[Any](null) ++ // pk = rowid alias
          attrs.map { case (f, i) =>
            (row.get(i), f.dataType) match {
              case (null, _) => null
              case (v: java.lang.Number, LongType | IntegerType | ShortType | ByteType) => v.longValue()
              case (v: java.lang.Number, DoubleType | FloatType) => v.doubleValue()
              case (v: Boolean, _) => v
              case (v: Array[Byte], _) => v
              case (v, _) => v.toString
            }
          } ++ Seq(row.get(geomIdx) match {
            case null => null
            case b: Array[Byte] =>
              val jts = graft.functions.Jts.read(b)
              // one declared class per layer, like the gpkg writer
              val cls = jts.getGeometryType match {
                case "LinearRing" => 2
                case t => Seq("Point", "LineString", "Polygon", "MultiPoint",
                  "MultiLineString", "MultiPolygon", "GeometryCollection").indexOf(t) + 1
              }
              require(gaiaClass == 0 || cls == gaiaClass,
                s"layer '$layer' is declared $geomDecl but row $rowid has ${jts.getGeometryType}")
              Spatialite.jtsToGaia(jts, srid)
          })
        (rowid, record(vals))
      })

      // legacy-compatible catalog: geometry_columns with INTEGER
      // geometry_type (spatialite >= 4 schema — the reader accepts
      // both int and name forms), plus a one-row spatial_ref_sys
      val srsSql = """CREATE TABLE spatial_ref_sys (srid INTEGER NOT NULL, auth_name TEXT NOT NULL, auth_srid INTEGER NOT NULL, ref_sys_name TEXT NOT NULL DEFAULT 'Unknown', proj4text TEXT NOT NULL, srtext TEXT NOT NULL DEFAULT 'Undefined')"""
      val proj4 =
        if (srid == 4326) "+proj=longlat +datum=WGS84 +no_defs"
        else if (srid == 3857) "+proj=webmerc +datum=WGS84 +units=m +no_defs"
        else ""
      val srsRoot = writeTable(db, Iterator(
        (1L, record(Seq[Any](srid.toLong, "EPSG", srid.toLong, s"EPSG:$srid", proj4, "Undefined")))))
      val gcSql = """CREATE TABLE geometry_columns (f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT NULL, geometry_type INTEGER NOT NULL, coord_dimension INTEGER NOT NULL, srid INTEGER NOT NULL, spatial_index_enabled INTEGER NOT NULL)"""
      val gcRoot = writeTable(db, Iterator(
        (1L, record(Seq[Any](layer, geomCol, gaiaClass.toLong, 2L, srid.toLong, 0L)))))

      val master = Seq(
        ("spatial_ref_sys", srsRoot, srsSql),
        ("geometry_columns", gcRoot, gcSql),
        (layer, featureRoot, createSql))
      writeTable(db, master.zipWithIndex.iterator.map { case ((name, root, sql), i) =>
        ((i + 1).toLong,
          record(Seq[Any]("table", name, name, root.toLong, sql)))
      }, reservedRoot = page1)

      raf.seek(0)
      val hdr = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      hdr.put("SQLite format 3\u0000".getBytes("ISO-8859-1"))
      hdr.putShort(16, PageSize.toShort)
      hdr.put(18, 1.toByte); hdr.put(19, 1.toByte)
      hdr.put(21, 64.toByte); hdr.put(22, 32.toByte); hdr.put(23, 32.toByte)
      hdr.putInt(24, 1)
      hdr.putInt(28, db.pageCount)
      hdr.putInt(40, 1)
      hdr.putInt(44, 4)
      hdr.putInt(56, 1)
      hdr.putInt(92, 1)
      hdr.putInt(96, 3045001)
      raf.write(hdr.array())
      raf.setLength(db.pageCount.toLong * PageSize)
    } finally raf.close()
  }

}
