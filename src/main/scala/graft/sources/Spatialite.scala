package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, LineString, Point, Polygon}

import graft.functions.Jts

/**
 * SpatiaLite reader — SQLite databases carrying geometry in the
 * published Gaia BLOB-Geometry format (the "SQLite" driver row of the
 * reference's GDAL bridge, `gdal/functions/st_read.cpp:668-702`;
 * named in the r9 verdict as the next long-tail format after
 * OpenFileGDB). The SQLite container machinery (page walk, record
 * decode, overflow chains, parallel root-subtree scan) is shared with
 * [[GeoPackage]] — only the discovery tables and the geometry blob
 * encoding differ:
 *
 *  - layers come from the `geometry_columns` registry
 *    (f_table_name, f_geometry_column, geometry_type, srid — the
 *    legacy SpatiaLite schema; a file without that table is refused
 *    with a pointer at the GeoPackage reader).
 *  - geometry values are Gaia blobs: 0x00 START byte, an endianness
 *    byte (0x01 LE / 0x00 BE) governing EVERY number in the blob, an
 *    int32 SRID, the double[4] MBR, the 0x7C MBR-end marker, an int32
 *    geometry class (1-7 +1000·Z +2000·M +3000·ZM), then a WKB-like
 *    body with NO per-geometry endian bytes — nested entities of
 *    collections are each introduced by a 0x69 ENTITY marker + class
 *    int — and a 0xFE END byte.
 *
 * Schema: declared-affinity columns (rowid alias filled from the
 * b-tree rowid) with the geometry column as WKB `geom`. Unit of
 * parallelism: root-page subtrees, same as GeoPackage.
 */
object Spatialite {

  import GeoPackage.{affinityType, coerce, decodeRecord, master, openDb, parseCreateTable, subtrees, walkTable}

  /** (table, geometryColumn, classCode, srid) rows of geometry_columns. */
  def layers(spark: SparkSession, path: String): Seq[(String, String, Int, Int)] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (db, closer) = openDb(fs, hPath)
    try {
      val m = master(db)
      val gc = m.find(r => r.typ == "table" && r.name.equalsIgnoreCase("geometry_columns"))
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no geometry_columns table — not a SpatiaLite database " +
            "(GeoPackage files use st_read('*.gpkg'))"))
      val cols = parseCreateTable(gc.sql).map(_.name.toLowerCase)
      val ti = cols.indexOf("f_table_name")
      val gi = cols.indexOf("f_geometry_column")
      val yi = cols.indexOf("geometry_type")
      val si = cols.indexOf("srid")
      require(ti >= 0 && gi >= 0, s"$path: malformed geometry_columns schema")
      walkTable(db, gc.rootpage).map { case (_, payload) =>
        val v = decodeRecord(payload)
        def s(i: Int) = v(i) match { case x: String => x; case x => String.valueOf(x) }
        def n(i: Int) = if (i < 0 || i >= v.length) 0 else v(i) match {
          case l: Long => l.toInt
          case s: String =>
            // legacy (spatialite 2.x/3.x) files store TYPE NAMES, and
            // some store numbers as text — map both, never throw
            s.trim.toUpperCase match {
              case "POINT" => 1
              case "LINESTRING" => 2
              case "POLYGON" => 3
              case "MULTIPOINT" => 4
              case "MULTILINESTRING" => 5
              case "MULTIPOLYGON" => 6
              case "GEOMETRYCOLLECTION" | "GEOMETRY" => 7
              case t => try t.toDouble.toInt catch { case _: Exception => 0 }
            }
          case _ => 0
        }
        (s(ti), s(gi),
          if (yi >= 0) n(yi) else 0, if (si >= 0) n(si) else 0)
      }.toSeq
    } finally closer.close()
  }

  def read(spark: SparkSession, path: String, layer: String = ""): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val ls = layers(spark, path)
    require(ls.nonEmpty, s"$path: geometry_columns lists no layers")
    val (tbl, geomCol, _, _) =
      if (layer.isEmpty) ls.head
      else ls.find(_._1.equalsIgnoreCase(layer)).getOrElse(
        throw new IllegalArgumentException(
          s"layer '$layer' not found; available: ${ls.map(_._1).mkString(", ")}"))
    val (db, closer) = openDb(fs, hPath)
    val (rootpage, cols, geomIdx, fidIdx) =
      try {
        val row = master(db).find(r => r.typ == "table" && r.name == tbl).getOrElse(
          throw new IllegalArgumentException(s"table $tbl missing from sqlite_master"))
        val defs = parseCreateTable(row.sql)
        (row.rootpage, defs,
          defs.indexWhere(_.name.equalsIgnoreCase(geomCol)),
          defs.indexWhere(_.isRowidAlias))
      } finally closer.close()

    val schema = StructType(cols.zipWithIndex.map { case (c, i) =>
      StructField(if (i == geomIdx) "geom" else c.name,
        if (i == geomIdx) BinaryType else affinityType(c.declType))
    })
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val roots = {
      val (db2, c2) = openDb(fs, hPath)
      try subtrees(db2, rootpage) finally c2.close()
    }
    val nCols = cols.length
    val fieldTypes = schema.fields.map(_.dataType)
    val pathStr = path
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
            if (i == fidIdx && raw == null) rowid
            else if (i == geomIdx) raw match {
              case b: Array[Byte] => Jts.write(gaiaToJts(b))
              case _ => null
            }
            else coerce(raw, fieldTypes(i))
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  // ---- Gaia BLOB-Geometry decode -----------------------------------------

  private final class GaiaBuf(val b: Array[Byte], var p: Int, val le: Boolean) {
    def u8(): Int = { val v = b(p) & 0xFF; p += 1; v }
    def i32(): Int = {
      val v =
        if (le) (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
          ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
        else (b(p + 3) & 0xFF) | ((b(p + 2) & 0xFF) << 8) |
          ((b(p + 1) & 0xFF) << 16) | ((b(p) & 0xFF) << 24)
      p += 4; v
    }
    def f64(): Double = {
      var bits = 0L
      var i = 0
      if (le) while (i < 8) { bits |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
      else while (i < 8) { bits |= (b(p + i) & 0xFFL) << (8 * (7 - i)); i += 1 }
      p += 8
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  private[sources] def gaiaToJts(blob: Array[Byte]): Geometry = {
    require(blob.length >= 45 && (blob(0) & 0xFF) == 0x00,
      s"not a Gaia geometry blob (${blob.length} bytes)")
    val le = (blob(1) & 0xFF) match {
      case 0x01 => true
      case 0x00 => false
      case other => throw new IllegalArgumentException(s"Gaia blob: bad endian byte $other")
    }
    val g = new GaiaBuf(blob, 2, le)
    g.i32() // srid
    g.p += 32 // MBR doubles
    require(g.u8() == 0x7C, "Gaia blob: missing MBR end marker")
    val geom = readClass(g, g.i32())
    require((blob(blob.length - 1) & 0xFF) == 0xFE, "Gaia blob: missing END byte")
    geom
  }

  private def readClass(g: GaiaBuf, cls: Int): Geometry = {
    val dims = cls / 1000 match {
      case 0 => 2
      case 1 => 3 // Z
      case 2 => 3 // M
      case 3 => 4 // ZM
      case other => throw new IllegalArgumentException(s"Gaia class $cls")
    }
    val hasZ = cls / 1000 == 1 || cls / 1000 == 3
    def coord(): Coordinate = {
      val x = g.f64(); val y = g.f64()
      val c = if (dims >= 3 && hasZ) new Coordinate(x, y, g.f64()) else new Coordinate(x, y)
      // skip M (and Z when only M declared — stored but unmapped)
      var skip = dims - (if (hasZ) 3 else 2)
      while (skip > 0) { g.f64(); skip -= 1 }
      c
    }
    def coords(n: Int): Array[Coordinate] = Array.fill(n)(coord())
    def ring(): LinearRing = {
      val cs = coords(g.i32())
      Jts.gf.createLinearRing(if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy())
    }
    cls % 1000 match {
      case 1 => Jts.gf.createPoint(coord())
      case 2 => Jts.gf.createLineString(coords(g.i32()))
      case 3 =>
        val n = g.i32()
        require(n >= 1, "Gaia polygon with no rings")
        val shell = ring()
        Jts.gf.createPolygon(shell, Array.fill(n - 1)(ring()))
      case 4 | 5 | 6 | 7 =>
        val n = g.i32()
        val parts = (0 until n).map { _ =>
          require(g.u8() == 0x69, "Gaia blob: missing ENTITY marker")
          readClass(g, g.i32())
        }
        cls % 1000 match {
          case 4 => Jts.gf.createMultiPoint(parts.collect { case p: Point => p }.toArray)
          case 5 => Jts.gf.createMultiLineString(
            parts.collect { case l: LineString => l }.toArray)
          case 6 => Jts.gf.createMultiPolygon(parts.collect { case p: Polygon => p }.toArray)
          case _ => Jts.collect(parts)
        }
      case other => throw new IllegalArgumentException(s"Gaia geometry class $other")
    }
  }

  // ---- Gaia BLOB-Geometry encode -----------------------------------------

  private def gaiaClassOf(g: Geometry): Int = g.getGeometryType match {
    case "Point" => 1
    case "LineString" | "LinearRing" => 2
    case "Polygon" => 3
    case "MultiPoint" => 4
    case "MultiLineString" => 5
    case "MultiPolygon" => 6
    case "GeometryCollection" => 7
    case t => throw new IllegalArgumentException(s"Gaia encoder: $t")
  }

  /** Encode a JTS geometry as a little-endian Gaia blob — the exact
   *  inverse of [[gaiaToJts]] (XY only; writers carry 2D like the
   *  shapefile/gpkg paths). */
  private[sources] def jtsToGaia(geom: Geometry, srid: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    def i32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def f64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { out.write(((bits >> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def coords(cs: Array[Coordinate]): Unit = cs.foreach { c => f64(c.x); f64(c.y) }
    def body(g: Geometry): Unit = g match {
      case p: Point => f64(p.getX); f64(p.getY)
      case l: LineString => i32(l.getNumPoints); coords(l.getCoordinates)
      case p: Polygon =>
        i32(1 + p.getNumInteriorRing)
        def ring(r: LineString): Unit = { i32(r.getNumPoints); coords(r.getCoordinates) }
        ring(p.getExteriorRing)
        (0 until p.getNumInteriorRing).foreach(i => ring(p.getInteriorRingN(i)))
      case m => // multi* / collection: ENTITY marker + class + body per part
        i32(m.getNumGeometries)
        (0 until m.getNumGeometries).foreach { i =>
          val part = m.getGeometryN(i)
          out.write(0x69); i32(gaiaClassOf(part)); body(part)
        }
    }
    val env = geom.getEnvelopeInternal
    out.write(0x00); out.write(0x01) // START, little-endian
    i32(srid)
    f64(env.getMinX); f64(env.getMinY); f64(env.getMaxX); f64(env.getMaxY)
    out.write(0x7C) // MBR end marker
    i32(gaiaClassOf(geom))
    body(geom)
    out.write(0xFE) // END
    out.toByteArray
  }

  /** Layer metadata for st_read_meta: (name, geom type name, srid,
   *  field (name, declType) pairs). */
  private[sources] def layerMetas(spark: SparkSession, path: String)
      : Seq[(String, String, Int, Seq[(String, String)])] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val named = Map(1 -> "Point", 2 -> "Line String", 3 -> "Polygon",
      4 -> "Multi Point", 5 -> "Multi Line String", 6 -> "Multi Polygon",
      7 -> "Geometry Collection")
    layers(spark, path).map { case (tbl, geomCol, cls, srid) =>
      val (db, closer) = openDb(fs, hPath)
      val fields = try {
        master(db).find(r => r.typ == "table" && r.name == tbl)
          .map(r => parseCreateTable(r.sql)
            .filterNot(_.name.equalsIgnoreCase(geomCol))
            .map(c => (c.name, c.declType)))
          .getOrElse(Seq.empty)
      } finally closer.close()
      (tbl, named.getOrElse(cls % 1000, "Unknown"), srid, fields)
    }
  }
}
