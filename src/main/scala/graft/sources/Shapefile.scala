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
   *  record ranges via the .shx index. */
  def read(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    val schema = schemaOf(path)
    val shxBytes = Files.readAllBytes(Paths.get(sibling(path, "shx")))
    val nRecords = (shxBytes.length - 100) / 8
    val offsets = new Array[Long](nRecords)
    val shx = ByteBuffer.wrap(shxBytes).order(ByteOrder.BIG_ENDIAN)
    var i = 0
    while (i < nRecords) { offsets(i) = shx.getInt(100 + i * 8).toLong * 2; i += 1 }

    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism, nRecords / 4096 + 1))
    val ranges = (0 until parts).map { p =>
      val start = p * nRecords / parts
      val end = (p + 1) * nRecords / parts
      (start, end)
    }.filter(r => r._2 > r._1)

    val charset = charsetOf(path)
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
