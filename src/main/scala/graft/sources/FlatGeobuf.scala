package graft.sources

import graft.functions.Jts
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, Point, Polygon}

import java.nio.{ByteBuffer, ByteOrder}

/**
 * FlatGeobuf (.fgb) reader, written against the PUBLIC spec
 * (flatgeobuf.org; reference consumes it via GDAL replacement scans —
 * gdal/functions/st_read.cpp:598-613, test data
 * test/data/amsterdam_roads.fgb).
 *
 * Layout: 8-byte magic `fgb\3fgb\0` · uint32 header length · Header
 * flatbuffer · optional packed Hilbert R-tree index · length-prefixed
 * Feature flatbuffers. The flatbuffers are decoded with a minimal
 * hand-rolled table walker (same approach as [[OsmPbf]]'s protobuf
 * parser — no new dependencies).
 *
 * Scale shape: the packed index stores each feature's byte offset, so
 * the file SPLITS — the driver reads only the header plus ~P sampled
 * leaf offsets (a few seeks, no data scan), and each task streams its
 * own byte range. Without an index the features are read sequentially
 * in a single task (they are self-delimiting but boundaries are
 * unknowable mid-stream).
 */
object FlatGeobuf {

  // ---- minimal flatbuffers table walker --------------------------------
  private final class Fb(val bb: ByteBuffer) {
    def u8(p: Int): Int = bb.get(p) & 0xFF
    def i32(p: Int): Int = bb.getInt(p)
    def u16(p: Int): Int = bb.getShort(p) & 0xFFFF
    def u32(p: Int): Long = bb.getInt(p) & 0xFFFFFFFFL
    def i64(p: Int): Long = bb.getLong(p)
    def f32(p: Int): Float = bb.getFloat(p)
    def f64(p: Int): Double = bb.getDouble(p)
    def root: Int = i32(0)
    /** absolute position of field `slot` of table at `t`, or 0 if absent */
    def field(t: Int, slot: Int): Int = {
      val vt = t - i32(t)
      val vtSize = u16(vt)
      val off = 4 + slot * 2
      if (off >= vtSize) 0
      else {
        val fo = u16(vt + off)
        if (fo == 0) 0 else t + fo
      }
    }
    /** follow a uoffset field to its target (string/vector/table) */
    def indirect(p: Int): Int = p + i32(p)
    def vectorLen(target: Int): Int = i32(target)
    def vectorData(target: Int): Int = target + 4
    def string(p: Int): String = {
      val t = indirect(p)
      val len = i32(t)
      val arr = new Array[Byte](len)
      val dup = bb.duplicate(); dup.position(t + 4); dup.get(arr)
      new String(arr, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  private def fb(bytes: Array[Byte]): Fb =
    new Fb(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))

  // ---- header ----------------------------------------------------------
  /** Column types from the public schema (header.fbs ColumnType). */
  private val ColByte = 0; private val ColUByte = 1; private val ColBool = 2
  private val ColShort = 3; private val ColUShort = 4; private val ColInt = 5
  private val ColUInt = 6; private val ColLong = 7; private val ColULong = 8
  private val ColFloat = 9; private val ColDouble = 10; private val ColString = 11
  private val ColJson = 12; private val ColDateTime = 13; private val ColBinary = 14

  case class FgbColumn(name: String, colType: Int)
  case class FgbHeader(
      geometryType: Int, hasZ: Boolean, columns: IndexedSeq[FgbColumn],
      featuresCount: Long, indexNodeSize: Int, headerLen: Int)

  private def parseHeader(bytes: Array[Byte]): FgbHeader = {
    val b = fb(bytes)
    val t = b.root
    def scalarU8(slot: Int, dflt: Int): Int = {
      val p = b.field(t, slot); if (p == 0) dflt else b.u8(p)
    }
    val geomType = scalarU8(2, 0)
    val hasZ = scalarU8(3, 0) != 0
    val colsField = b.field(t, 7)
    val columns: IndexedSeq[FgbColumn] =
      if (colsField == 0) IndexedSeq.empty
      else {
        val vec = b.indirect(colsField)
        val n = b.vectorLen(vec)
        (0 until n).map { i =>
          val elemPos = b.vectorData(vec) + i * 4
          val ct = b.indirect(elemPos)
          val nameField = b.field(ct, 0)
          val name = if (nameField == 0) s"col_$i" else b.string(nameField)
          val typField = b.field(ct, 1)
          FgbColumn(name, if (typField == 0) 0 else b.u8(typField))
        }
      }
    val fcField = b.field(t, 8)
    val featuresCount = if (fcField == 0) 0L else b.i64(fcField)
    val nsField = b.field(t, 9)
    val nodeSize = if (nsField == 0) 16 else b.u16(nsField)
    FgbHeader(geomType, hasZ, columns, featuresCount, nodeSize, bytes.length)
  }

  /** Packed Hilbert R-tree byte size (spec packed_r_tree algorithm):
   *  one 40-byte node (4 doubles + uint64 feature offset) per feature
   *  plus the internal levels. */
  private def treeSize(numItems: Long, nodeSizeIn: Int): Long = {
    if (numItems == 0) return 0L
    val nodeSize = math.min(math.max(nodeSizeIn, 2), 65535)
    var count = numItems
    var total = numItems
    while (count != 1) {
      count = (count + nodeSize - 1) / nodeSize
      total += count
    }
    total * 40L
  }

  private def totalNodes(numItems: Long, nodeSize: Int): Long = treeSize(numItems, nodeSize) / 40L

  // ---- schema ----------------------------------------------------------
  private def sparkType(colType: Int): DataType = colType match {
    case ColByte | ColUByte | ColShort | ColUShort | ColInt => IntegerType
    case ColUInt | ColLong | ColULong => LongType
    case ColBool => BooleanType
    case ColFloat => FloatType
    case ColDouble => DoubleType
    case ColString | ColJson | ColDateTime => StringType
    case ColBinary => BinaryType
    case _ => StringType
  }

  def schemaOf(header: FgbHeader): StructType =
    StructType(header.columns.map(c => StructField(c.name, sparkType(c.colType))) :+
      StructField("geom", BinaryType))

  // ---- geometry --------------------------------------------------------
  /** GeometryType enum (geometry.fbs): 1=Point 2=LineString 3=Polygon
   *  4=MultiPoint 5=MultiLineString 6=MultiPolygon 7=GeometryCollection */
  private def parseGeometry(b: Fb, gt: Int, typeHint: Int, hasZ: Boolean): Geometry = {
    val typField = b.field(gt, 6)
    val typ = if (typField == 0) typeHint else { val v = b.u8(typField); if (v == 0) typeHint else v }

    def doubles(slot: Int): Array[Double] = {
      val f = b.field(gt, slot)
      if (f == 0) Array.empty
      else {
        val vec = b.indirect(f)
        val n = b.vectorLen(vec)
        val out = new Array[Double](n)
        var i = 0
        while (i < n) { out(i) = b.f64(b.vectorData(vec) + i * 8); i += 1 }
        out
      }
    }
    def ends(): Array[Int] = {
      val f = b.field(gt, 0)
      if (f == 0) Array.empty
      else {
        val vec = b.indirect(f)
        val n = b.vectorLen(vec)
        val out = new Array[Int](n)
        var i = 0
        while (i < n) { out(i) = b.u32(b.vectorData(vec) + i * 4).toInt; i += 1 }
        out
      }
    }
    def coords(xy: Array[Double], z: Array[Double], from: Int, until: Int): Array[Coordinate] = {
      val out = new Array[Coordinate](until - from)
      var i = from
      while (i < until) {
        out(i - from) =
          if (hasZ && z.nonEmpty) new Coordinate(xy(2 * i), xy(2 * i + 1), z(i))
          else new Coordinate(xy(2 * i), xy(2 * i + 1))
        i += 1
      }
      out
    }
    def rings(xy: Array[Double], z: Array[Double]): Array[Array[Coordinate]] = {
      val e = ends()
      val nPts = xy.length / 2
      val bounds = if (e.isEmpty) Array(nPts) else e
      var start = 0
      bounds.map { end => val cs = coords(xy, z, start, end); start = end; cs }
    }
    def parts(hint: Int): IndexedSeq[Geometry] = {
      val f = b.field(gt, 7)
      if (f == 0) IndexedSeq.empty
      else {
        val vec = b.indirect(f)
        val n = b.vectorLen(vec)
        (0 until n).map { i =>
          val elemPos = b.vectorData(vec) + i * 4
          parseGeometry(b, b.indirect(elemPos), hint, hasZ)
        }
      }
    }

    val xy = doubles(1); val z = if (hasZ) doubles(2) else Array.empty[Double]
    val gf = Jts.gf
    typ match {
      case 1 =>
        if (xy.isEmpty) gf.createPoint()
        else gf.createPoint(coords(xy, z, 0, 1)(0))
      case 2 => gf.createLineString(coords(xy, z, 0, xy.length / 2))
      case 3 =>
        val rs = rings(xy, z)
        if (rs.isEmpty) gf.createPolygon()
        else gf.createPolygon(gf.createLinearRing(rs.head),
          rs.tail.map(r => gf.createLinearRing(r)))
      case 4 => gf.createMultiPointFromCoords(coords(xy, z, 0, xy.length / 2))
      case 5 =>
        gf.createMultiLineString(rings(xy, z).map(r => gf.createLineString(r)))
      case 6 =>
        // Writers (GDAL/C++/TS) flatten a single-polygon MultiPolygon to
        // bare xy/ends with no parts vector — decode that shape as one
        // wrapped Polygon rather than an EMPTY MultiPolygon.
        if (b.field(gt, 7) == 0 && xy.nonEmpty) {
          val rs = rings(xy, z)
          val poly = gf.createPolygon(gf.createLinearRing(rs.head),
            rs.tail.map(r => gf.createLinearRing(r)))
          gf.createMultiPolygon(Array(poly))
        } else
          gf.createMultiPolygon(parts(3).map(_.asInstanceOf[Polygon]).toArray)
      case 7 => gf.createGeometryCollection(parts(0).toArray)
      case other => throw new IllegalArgumentException(s"FlatGeobuf: unsupported geometry type $other")
    }
  }

  // ---- properties ------------------------------------------------------
  private def parseProperties(
      bytes: Array[Byte], columns: IndexedSeq[FgbColumn], out: Array[Any]): Unit = {
    if (bytes == null) return
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 2) {
      val idx = bb.getShort & 0xFFFF
      val colType = if (idx < columns.length) columns(idx).colType else ColString
      val value: Any = colType match {
        case ColByte => bb.get.toInt
        case ColUByte => (bb.get & 0xFF): Int
        case ColBool => bb.get != 0
        case ColShort => bb.getShort.toInt
        case ColUShort => (bb.getShort & 0xFFFF): Int
        case ColInt => bb.getInt
        case ColUInt => bb.getInt & 0xFFFFFFFFL
        case ColLong | ColULong => bb.getLong
        case ColFloat => bb.getFloat
        case ColDouble => bb.getDouble
        case ColString | ColJson | ColDateTime =>
          val len = bb.getInt
          val arr = new Array[Byte](len); bb.get(arr)
          new String(arr, java.nio.charset.StandardCharsets.UTF_8)
        case ColBinary =>
          val len = bb.getInt
          val arr = new Array[Byte](len); bb.get(arr)
          arr
        case _ =>
          val len = bb.getInt
          val arr = new Array[Byte](len); bb.get(arr)
          new String(arr, java.nio.charset.StandardCharsets.UTF_8)
      }
      if (idx < out.length) out(idx) = value
    }
  }

  // ---- reader ----------------------------------------------------------
  private val MagicLen = 8

  private def openHeader(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): (FgbHeader, Long) = {
    val in = fs.open(path)
    try {
      val magic = new Array[Byte](MagicLen)
      in.readFully(0, magic)
      require(magic(0) == 'f' && magic(1) == 'g' && magic(2) == 'b' && magic(3) == 3,
        s"not a FlatGeobuf v3 file: $path")
      val lenBuf = new Array[Byte](4)
      in.readFully(MagicLen, lenBuf)
      val headerLen = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN).getInt
      val headerBytes = new Array[Byte](headerLen)
      in.readFully(MagicLen + 4, headerBytes)
      val header = parseHeader(headerBytes)
      val indexSize = if (header.indexNodeSize > 0) treeSize(header.featuresCount, header.indexNodeSize) else 0L
      val featureStart = MagicLen + 4 + headerLen + indexSize
      (header, featureStart)
    } finally in.close()
  }

  /** Sample P+1 leaf-node feature offsets from the packed index (a few
   *  driver-side seeks) so each task gets a feature-aligned byte range. */
  private def partitionOffsets(
      fs: org.apache.hadoop.fs.FileSystem, path: org.apache.hadoop.fs.Path,
      header: FgbHeader, parts: Int): Array[Long] = {
    val items = header.featuresCount
    val nodes = totalNodes(items, header.indexNodeSize)
    val indexStart = (MagicLen + 4 + header.headerLen).toLong
    val leafStart = indexStart + (nodes - items) * 40L
    val in = fs.open(path)
    try {
      val p = math.min(parts.toLong, items)
      val buf = new Array[Byte](8)
      (0L until p).map { i =>
        val item = i * items / p
        in.readFully(leafStart + item * 40L + 32L, buf)
        ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN).getLong
      // The spec sorts features by Hilbert value, but an indexed file may
      // store features out of index order; sampled offsets are range
      // starts, so sorting keeps every byte range (none silently dropped).
      }.toArray.sorted
    } finally in.close()
  }

  /**
   * Read a .fgb file into (columns..., geom WKB). With a spatial index
   * present the scan is split across `numPartitions` feature-aligned
   * byte ranges (default: spark.default.parallelism).
   */
  def read(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val (header, featureStart) = openHeader(fs, hPath)
    val fileLen = fs.getFileStatus(hPath).getLen
    val schema = schemaOf(header)
    val nParts = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism

    // feature-aligned [start, end) ranges relative to featureStart
    val ranges: Array[(Long, Long)] =
      if (header.indexNodeSize > 0 && header.featuresCount > 1 && nParts > 1) {
        val offs = partitionOffsets(fs, hPath, header, nParts)
        val bounds = offs :+ (fileLen - featureStart)
        bounds.sliding(2).map(a => (a(0), a(1))).filter(r => r._2 > r._1).toArray
      } else Array((0L, fileLen - featureStart))

    val columns = header.columns
    val geomTypeHint = header.geometryType
    val hasZ = header.hasZ
    val pathStr = path
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))

    val rows = spark.sparkContext.parallelize(ranges.toIndexedSeq, math.max(1, ranges.length))
      .flatMap { case (start, end) =>
        val p = new org.apache.hadoop.fs.Path(pathStr)
        val fsL = p.getFileSystem(confBc.value.value)
        val in = fsL.open(p)
        in.seek(featureStart + start)
        var pos = start
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        // early termination (limit/take/task failure) must not leak the stream
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val lenBuf = new Array[Byte](4)
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val more = pos < end
            if (!more) closeOnce()
            more
          }
          override def next(): Row = {
            in.readFully(lenBuf, 0, 4)
            val len = ByteBuffer.wrap(lenBuf).order(ByteOrder.LITTLE_ENDIAN).getInt
            val featBytes = new Array[Byte](len)
            in.readFully(featBytes, 0, len)
            pos += 4 + len
            val b = fb(featBytes)
            val t = b.root
            val values = new Array[Any](columns.length + 1)
            val propsField = b.field(t, 1)
            if (propsField != 0) {
              val vec = b.indirect(propsField)
              val n = b.vectorLen(vec)
              val arr = new Array[Byte](n)
              val dup = b.bb.duplicate(); dup.position(b.vectorData(vec)); dup.get(arr)
              parseProperties(arr, columns, values)
            }
            val geomField = b.field(t, 0)
            if (geomField != 0) {
              val g = parseGeometry(b, b.indirect(geomField), geomTypeHint, hasZ)
              values(columns.length) = Jts.write(g)
            }
            Row.fromSeq(values.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Header metadata for ST_Read_Meta. */
  def meta(spark: SparkSession, path: String): (FgbHeader, StructType) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (header, _) = openHeader(fs, hPath)
    (header, schemaOf(header))
  }
}
