package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * GeoPackage (.gpkg) reader. A GeoPackage is an SQLite database with
 * feature tables (public specs: sqlite.org/fileformat2.html,
 * opengeospatial.org geopackage). The reference replacement-scans it
 * through GDAL (gdal/functions/st_read.cpp:598-613); here the minimal
 * read path is hand-rolled — a read-only SQLite table-b-tree walker
 * (varints, record serial types, overflow chains) plus the GeoPackage
 * layer tables (`gpkg_contents`, `gpkg_geometry_columns`) and the GPB
 * geometry blob header. No new dependencies.
 *
 * Scale shape: one .gpkg is one file, but the table b-tree's root
 * children partition the rowid space — each Spark task walks its own
 * subtree (its own opened stream), so a large layer reads in parallel
 * without a driver bottleneck. (Same idea as FlatGeobuf's index-based
 * byte-range splitting.)
 */
object GeoPackage {

  // ---- SQLite file-format primitives -----------------------------------

  /** Read-only random-access view of one SQLite file. */
  private[sources] final class Db(readAt: (Long, Array[Byte]) => Unit) {
    val (pageSize, usableSize) = {
      val hdr = new Array[Byte](100)
      readAt(0, hdr)
      require(new String(hdr, 0, 15, "US-ASCII") == "SQLite format 3", "not an SQLite file")
      val ps0 = ((hdr(16) & 0xFF) << 8) | (hdr(17) & 0xFF)
      val ps = if (ps0 == 1) 65536 else ps0
      (ps, ps - (hdr(20) & 0xFF))
    }
    def page(n: Long): Array[Byte] = {
      val buf = new Array[Byte](pageSize)
      readAt((n - 1) * pageSize, buf)
      buf
    }
  }

  private[sources] def openDb(fs: org.apache.hadoop.fs.FileSystem, path: org.apache.hadoop.fs.Path)
      : (Db, java.io.Closeable) = {
    val stream = fs.open(path)
    (new Db((p, buf) => stream.readFully(p, buf)), stream)
  }

  /** SQLite varint: 1-9 bytes, big-endian 7-bit groups (9th byte = 8 bits).
   *  Returns (value, bytesConsumed). */
  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val c = b(off + i)
      v = (v << 7) | (c & 0x7F)
      i += 1
      if ((c & 0x80) == 0) return (v, i)
    }
    ((v << 8) | (b(off + 8) & 0xFF), 9)
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  /** Assemble a cell payload, following the overflow chain if needed. */
  private def payloadOf(
      db: Db, page: Array[Byte], payloadLen: Long, localStart: Int): Array[Byte] = {
    val usable = db.usableSize
    val maxLocal = usable - 35
    val out = new Array[Byte](payloadLen.toInt)
    if (payloadLen <= maxLocal) {
      System.arraycopy(page, localStart, out, 0, payloadLen.toInt)
      out
    } else {
      val minLocal = (usable - 12) * 32 / 255 - 23
      val k = minLocal + ((payloadLen - minLocal) % (usable - 4)).toInt
      val local = if (k <= maxLocal) k else minLocal
      System.arraycopy(page, localStart, out, 0, local)
      var written = local
      var next = u32(page, localStart + local)
      while (next != 0 && written < payloadLen) {
        val op = db.page(next)
        next = u32(op, 0)
        val n = math.min(usable - 4, payloadLen.toInt - written)
        System.arraycopy(op, 4, out, written, n)
        written += n
      }
      out
    }
  }

  /** Walk a table b-tree rooted at `root`, emitting (rowid, payload). */
  private[sources] def walkTable(db: Db, root: Long): Iterator[(Long, Array[Byte])] = {
    val page = db.page(root)
    val hdrOff = if (root == 1) 100 else 0
    val pageType = page(hdrOff) & 0xFF
    val nCells = u16(page, hdrOff + 3)
    pageType match {
      case 0x0D => // leaf table
        (0 until nCells).iterator.map { i =>
          val cellOff = u16(page, hdrOff + 8 + 2 * i)
          val (payloadLen, n1) = varint(page, cellOff)
          val (rowid, n2) = varint(page, cellOff + n1)
          (rowid, payloadOf(db, page, payloadLen, cellOff + n1 + n2))
        }
      case 0x05 => // interior table
        val children = (0 until nCells).map { i =>
          val cellOff = u16(page, hdrOff + 12 + 2 * i)
          u32(page, cellOff)
        } :+ u32(page, hdrOff + 8) // right-most pointer
        children.iterator.flatMap(walkTable(db, _))
      case other => throw new IllegalStateException(s"unexpected SQLite page type $other")
    }
  }

  /** Root-page subtrees for parallel scanning: the root's children (or
   *  the root itself when it is already a leaf). */
  private[sources] def subtrees(db: Db, root: Long): Seq[Long] = {
    val page = db.page(root)
    val hdrOff = if (root == 1) 100 else 0
    if ((page(hdrOff) & 0xFF) == 0x05) {
      val nCells = u16(page, hdrOff + 3)
      (0 until nCells).map { i => u32(page, u16(page, hdrOff + 12 + 2 * i)) } :+
        u32(page, hdrOff + 8)
    } else Seq(root)
  }

  /** Decode a record payload into column values (SQLite record format:
   *  header of serial-type varints, then values). */
  private[sources] def decodeRecord(payload: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = varint(payload, 0)
    val types = scala.collection.mutable.ArrayBuffer[Long]()
    var p = n0
    while (p < hdrLen) {
      val (t, n) = varint(payload, p)
      types += t
      p += n
    }
    val out = new Array[Any](types.length)
    var pos = hdrLen.toInt
    var i = 0
    while (i < types.length) {
      val t = types(i)
      t match {
        case 0 => out(i) = null
        case 1 => out(i) = payload(pos).toLong; pos += 1
        case 2 =>
          out(i) = ((payload(pos).toLong << 8) | (payload(pos + 1) & 0xFFL)); pos += 2
        case 3 =>
          out(i) = (payload(pos).toLong << 16) | ((payload(pos + 1) & 0xFFL) << 8) |
            (payload(pos + 2) & 0xFFL); pos += 3
        case 4 =>
          out(i) = (payload(pos).toLong << 24) | ((payload(pos + 1) & 0xFFL) << 16) |
            ((payload(pos + 2) & 0xFFL) << 8) | (payload(pos + 3) & 0xFFL); pos += 4
        case 5 =>
          var v = payload(pos).toLong
          var k = 1
          while (k < 6) { v = (v << 8) | (payload(pos + k) & 0xFFL); k += 1 }
          out(i) = v; pos += 6
        case 6 =>
          var v = payload(pos).toLong
          var k = 1
          while (k < 8) { v = (v << 8) | (payload(pos + k) & 0xFFL); k += 1 }
          out(i) = v; pos += 8
        case 7 =>
          var v = payload(pos).toLong
          var k = 1
          while (k < 8) { v = (v << 8) | (payload(pos + k) & 0xFFL); k += 1 }
          out(i) = java.lang.Double.longBitsToDouble(v); pos += 8
        case 8 => out(i) = 0L
        case 9 => out(i) = 1L
        case blob if blob >= 12 && blob % 2 == 0 =>
          val len = ((blob - 12) / 2).toInt
          out(i) = java.util.Arrays.copyOfRange(payload, pos, pos + len); pos += len
        case text if text >= 13 =>
          val len = ((text - 13) / 2).toInt
          out(i) = new String(payload, pos, len, java.nio.charset.StandardCharsets.UTF_8)
          pos += len
        case other => throw new IllegalStateException(s"reserved serial type $other")
      }
      i += 1
    }
    out
  }

  // ---- schema ----------------------------------------------------------

  private[sources] case class MasterRow(typ: String, name: String, tblName: String, rootpage: Long, sql: String)

  private[sources] def master(db: Db): Seq[MasterRow] =
    walkTable(db, 1L).map { case (_, payload) =>
      val v = decodeRecord(payload)
      MasterRow(str(v(0)), str(v(1)), str(v(2)),
        v(3) match { case l: Long => l; case _ => 0L },
        str(v(4)))
    }.toSeq

  private def str(a: Any): String = a match { case s: String => s; case null => null; case o => o.toString }

  private[sources] case class ColDef(name: String, declType: String, isRowidAlias: Boolean)

  /** Column list from a CREATE TABLE statement (top-level comma split;
   *  table constraints skipped). */
  private[sources] def parseCreateTable(sql: String): Seq[ColDef] = {
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var inQuote: Char = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQuote != 0) { if (c == inQuote) inQuote = 0 }
      else c match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '\'' | '"' | '`' => inQuote = c
        case ',' if depth == 0 => parts += body.substring(start, i); start = i + 1
        case '[' => inQuote = ']'
        case _ =>
      }
      i += 1
    }
    parts += body.substring(start)
    val constraintKw = Set("primary", "unique", "check", "foreign", "constraint")
    parts.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      val unq = if (p.head == '"' || p.head == '`' || p.head == '\'') {
        val q = p.head
        val endQ = p.indexOf(q, 1)
        (p.substring(1, endQ), p.substring(endQ + 1).trim)
      } else if (p.head == '[') {
        val endQ = p.indexOf(']')
        (p.substring(1, endQ), p.substring(endQ + 1).trim)
      } else {
        val sp = p.indexWhere(ch => ch.isWhitespace)
        if (sp < 0) (p, "") else (p.substring(0, sp), p.substring(sp + 1).trim)
      }
      val (name, rest) = unq
      if (constraintKw.contains(name.toLowerCase)) None
      else {
        val decl = rest.split("\\s+").takeWhile(t =>
          !Set("primary", "not", "unique", "default", "check", "references", "autoincrement",
            "collate", "generated").contains(t.toLowerCase)).mkString(" ")
        // `x INTEGER PRIMARY KEY` aliases the rowid (value stored as NULL)
        val isAlias = decl.equalsIgnoreCase("INTEGER") &&
          rest.toUpperCase.contains("PRIMARY KEY")
        Some(ColDef(name, decl, isAlias))
      }
    }.toSeq
  }

  /** SQLite type-affinity rules → Spark type (geometry columns handled
   *  separately). */
  private[sources] def affinityType(decl: String): DataType = {
    val d = decl.toUpperCase
    if (d.contains("INT")) LongType
    else if (d.contains("CHAR") || d.contains("CLOB") || d.contains("TEXT")) StringType
    else if (d.isEmpty || d.contains("BLOB")) BinaryType
    else if (d.contains("REAL") || d.contains("FLOA") || d.contains("DOUB")) DoubleType
    else if (d.contains("BOOL")) BooleanType
    else if (d.contains("DATE") || d.contains("TIME")) StringType
    else DoubleType // NUMERIC affinity
  }

  /** Strip the GeoPackage binary header (GP magic · version · flags ·
   *  srs_id · optional envelope) → raw WKB, null for empty/null geoms. */
  private def gpbToWkb(blob: Array[Byte]): Array[Byte] = {
    if (blob == null || blob.length < 8 || blob(0) != 'G' || blob(1) != 'P') return blob
    val flags = blob(3) & 0xFF
    if (((flags >> 5) & 1) == 1) return null // ExtendedGeoPackageBinary: unsupported
    if (((flags >> 4) & 1) == 1) return null // empty-geometry flag
    val envSize = ((flags >> 1) & 7) match {
      case 0 => 0; case 1 => 32; case 2 | 3 => 48; case 4 => 64
      case _ => return null // invalid indicator
    }
    java.util.Arrays.copyOfRange(blob, 8 + envSize, blob.length)
  }

  // ---- public API ------------------------------------------------------

  /** Feature layers: (table_name, geometry_column, geometry_type, srs_id). */
  def layers(spark: SparkSession, path: String): Seq[(String, String, String, Long)] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (db, closer) = openDb(fs, hPath)
    try {
      val m = master(db)
      m.find(r => r.typ == "table" && r.name == "gpkg_geometry_columns") match {
        case None => Seq.empty
        case Some(gc) =>
          walkTable(db, gc.rootpage).map { case (_, p) =>
            val v = decodeRecord(p)
            (str(v(0)), str(v(1)), str(v(2)), v(3) match { case l: Long => l; case _ => 0L })
          }.toSeq
      }
    } finally closer.close()
  }

  /** Per-layer metadata for ST_Read_Meta: layer name, geometry column,
   *  geometry type name, srs (name, organization, code, definition WKT),
   *  feature count (b-tree walk, no payload decode), and the declared
   *  attribute columns (name, declared type, rowid-alias flag). */
  case class LayerMeta(
      name: String, geomColumn: String, geomType: String,
      srsName: String, srsOrg: String, srsCode: Long, srsWkt: String,
      featureCount: Long, fields: Seq[(String, String, Boolean)])

  def layerMetas(spark: SparkSession, path: String): Seq[LayerMeta] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (db, closer) = openDb(fs, hPath)
    try {
      val m = master(db)
      // gpkg_spatial_ref_sys: srs_name, srs_id, organization, organization_coordsys_id, definition
      val srs: Map[Long, (String, String, Long, String)] =
        m.find(r => r.typ == "table" && r.name == "gpkg_spatial_ref_sys").map { t =>
          walkTable(db, t.rootpage).map { case (_, p) =>
            val v = decodeRecord(p)
            val id = v(1) match { case l: Long => l; case _ => -1L }
            id -> ((str(v(0)),
              str(v(2)),
              v(3) match { case l: Long => l; case _ => -1L },
              str(v(4))))
          }.toMap
        }.getOrElse(Map.empty)
      layers(spark, path).map { case (tbl, geomCol, geomType, srsId) =>
        val row = m.find(r => r.typ == "table" && r.name == tbl)
        val fields = row.map(r => parseCreateTable(r.sql)).getOrElse(Seq.empty)
          .map(c => (c.name, c.declType, c.isRowidAlias))
        val count = row.map(r => walkTable(db, r.rootpage).size.toLong).getOrElse(-1L)
        val (sn, so, sc, sw) = srs.getOrElse(srsId, ("", "", srsId, ""))
        LayerMeta(tbl, geomCol, geomType, sn, so, sc, sw, count, fields)
      }
    } finally closer.close()
  }

  /**
   * Read one feature layer (default: the first in
   * `gpkg_geometry_columns`) as (columns..., geometry as WKB binary).
   * The scan parallelizes over the table b-tree's root subtrees.
   */
  def read(spark: SparkSession, path: String, layer: String = ""): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val (db, closer) = openDb(fs, hPath)
    val (rootpage, cols, geomIdx, fidIdx) =
      try {
        val ls = layers(spark, path)
        require(ls.nonEmpty, s"$path: no feature layers in gpkg_geometry_columns")
        val (tbl, geomCol, _, _) =
          if (layer.isEmpty) ls.head
          else ls.find(_._1 == layer).getOrElse(
            throw new IllegalArgumentException(
              s"layer '$layer' not found; available: ${ls.map(_._1).mkString(", ")}"))
        val m = master(db)
        val row = m.find(r => r.typ == "table" && r.name == tbl).getOrElse(
          throw new IllegalArgumentException(s"table $tbl missing from sqlite_master"))
        val defs = parseCreateTable(row.sql)
        val gIdx = defs.indexWhere(_.name.equalsIgnoreCase(geomCol))
        val fIdx = defs.indexWhere(_.isRowidAlias)
        (row.rootpage, defs, gIdx, fIdx)
      } finally closer.close()

    val schema = StructType(cols.zipWithIndex.map { case (c, i) =>
      StructField(c.name, if (i == geomIdx) BinaryType else affinityType(c.declType))
    })

    val pathStr = path
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val roots = {
      val (db2, c2) = openDb(fs, hPath)
      try subtrees(db2, rootpage) finally c2.close()
    }
    val nCols = cols.length
    val fieldTypes = schema.fields.map(_.dataType)

    val rows = spark.sparkContext.parallelize(roots.toIndexedSeq, roots.length).flatMap { sub =>
      val p = new org.apache.hadoop.fs.Path(pathStr)
      val fsL = p.getFileSystem(confBc.value.value)
      val (dbL, closerL) = openDb(fsL, p)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closerL.close()))
      walkTable(dbL, sub).map { case (rowid, payload) =>
        val rec = decodeRecord(payload)
        val vals = new Array[Any](nCols)
        var i = 0
        while (i < nCols) {
          val raw = if (i < rec.length) rec(i) else null
          vals(i) =
            if (i == fidIdx && raw == null) rowid // rowid-alias column
            else if (i == geomIdx) raw match {
              case b: Array[Byte] => gpbToWkb(b)
              case _ => null // non-blob value in a geometry column
            }
            else coerce(raw, fieldTypes(i))
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** SQLite's dynamic typing → declared column type. Any legal stored
   *  class may appear under any declared affinity; values that cannot
   *  be represented in the declared Spark type become null (never a
   *  mistyped external object, which would fail the whole task). */
  private[sources] def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, DoubleType) => l.toDouble
    case (l: Long, BooleanType) => l != 0L
    case (l: Long, StringType) => l.toString
    case (d: Double, DoubleType) => d
    case (d: Double, LongType) => d.toLong
    case (d: Double, BooleanType) => d != 0.0
    case (d: Double, StringType) => d.toString
    case (s: String, StringType) => s
    case (s: String, DoubleType) => try s.toDouble catch { case _: Exception => null }
    case (s: String, LongType) => try s.toLong catch { case _: Exception => null }
    case (s: String, BooleanType) => s.equalsIgnoreCase("true") || s == "1"
    case (s: String, BinaryType) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case (b: Array[Byte], BinaryType) => b
    case (b: Array[Byte], StringType) =>
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case (other, StringType) => other.toString
    case (_, _) => null
  }
}
