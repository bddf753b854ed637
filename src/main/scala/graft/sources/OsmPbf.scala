package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.{DataInputStream, FileInputStream, RandomAccessFile}
import java.util.zip.Inflater

/**
 * OSM PBF reader (reference: core/io/osm/st_read_osm.cpp). The format
 * is public: a framed sequence of [4-byte BE header length][BlobHeader
 * protobuf][Blob protobuf], where OSMData blobs hold zlib-compressed
 * PrimitiveBlocks (fileformat.proto / osmformat.proto). We parse the
 * protobuf wire format directly (varint/zigzag/length-delimited — no
 * protoc codegen needed for this fixed, frozen schema).
 *
 * Parallelism mirrors the reference's blob-parallel scan
 * (st_read_osm.cpp:793-834): the driver indexes blob offsets (cheap —
 * reads only the 4-byte lengths + tiny headers), executors decode
 * disjoint blob ranges.
 *
 * Output schema (= reference Bind, st_read_osm.cpp:39-96):
 * kind string, id bigint, tags map<string,string>, refs array<bigint>,
 * lat double, lon double, ref_roles array<string>, ref_types array<string>.
 */
object OsmPbf {

  val schema: StructType = StructType(Seq(
    StructField("kind", StringType), StructField("id", LongType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("refs", ArrayType(LongType)),
    StructField("lat", DoubleType), StructField("lon", DoubleType),
    StructField("ref_roles", ArrayType(StringType)),
    StructField("ref_types", ArrayType(StringType))))

  // ---- protobuf wire-format primitives ---------------------------------
  private final class Pbf(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var res = 0L
      while (true) {
        val b = buf(pos); pos += 1
        res |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return res
        shift += 7
      }
      res
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    /** returns (fieldNumber, wireType) */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def lenDelim(): (Int, Int) = { val len = varint().toInt; val s = pos; pos += len; (s, s + len) }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
    def packedVarints(s: Int, e: Int): Array[Long] = {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      val sub = new Pbf(buf, s, e)
      while (sub.hasMore) out += sub.varint()
      out.toArray
    }
    def packedZigzags(s: Int, e: Int): Array[Long] = {
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      val sub = new Pbf(buf, s, e)
      while (sub.hasMore) out += sub.zigzag()
      out.toArray
    }
  }

  private case class BlobRef(offset: Long, totalLen: Int, isData: Boolean)

  /** Driver-side blob index: read only the framing, skip the payloads. */
  private def indexBlobs(path: String): Seq[BlobRef] = {
    val in = new DataInputStream(new FileInputStream(path))
    val out = scala.collection.mutable.ArrayBuffer[BlobRef]()
    var offset = 0L
    try {
      while (true) {
        val headerLen = in.readInt() // throws EOF at end
        val header = new Array[Byte](headerLen)
        in.readFully(header)
        // BlobHeader: 1=type string, 3=datasize
        val p = new Pbf(header, 0, headerLen)
        var typ = ""; var dataSize = 0
        while (p.hasMore) {
          p.tag() match {
            case (1, 2) => val (s, e) = p.lenDelim(); typ = new String(header, s, e - s, "UTF-8")
            case (3, 0) => dataSize = p.varint().toInt
            case (_, w) => p.skip(w)
          }
        }
        in.skipBytes(dataSize)
        val total = 4 + headerLen + dataSize
        out += BlobRef(offset, total, typ == "OSMData")
        offset += total
      }
    } catch { case _: java.io.EOFException => () }
    finally in.close()
    out.toSeq
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val blobs = indexBlobs(path).filter(_.isData)
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism, blobs.size))
    val rows = spark.sparkContext.parallelize(blobs, parts).flatMap { blob =>
      val raf = new RandomAccessFile(path, "r")
      try {
        raf.seek(blob.offset)
        val frame = new Array[Byte](blob.totalLen)
        raf.readFully(frame)
        val headerLen = java.nio.ByteBuffer.wrap(frame, 0, 4).getInt
        decodeBlob(frame, 4 + headerLen, blob.totalLen).iterator
      } finally raf.close()
    }
    spark.createDataFrame(rows, schema)
  }

  /** Blob: 1=raw, 2=raw_size, 3=zlib_data → decompressed PrimitiveBlock. */
  private def decodeBlob(frame: Array[Byte], start: Int, end: Int): Seq[Row] = {
    val p = new Pbf(frame, start, end)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: (Int, Int) = null
    while (p.hasMore) {
      p.tag() match {
        case (1, 2) => val (s, e) = p.lenDelim(); raw = java.util.Arrays.copyOfRange(frame, s, e)
        case (2, 0) => rawSize = p.varint().toInt
        case (3, 2) => zlib = p.lenDelim()
        case (_, w) => p.skip(w)
      }
    }
    val block =
      if (raw != null) raw
      else if (zlib != null) {
        val inflater = new Inflater()
        inflater.setInput(frame, zlib._1, zlib._2 - zlib._1)
        val out = new Array[Byte](if (rawSize > 0) rawSize else (zlib._2 - zlib._1) * 8)
        var n = 0
        while (!inflater.finished() && n < out.length) n += inflater.inflate(out, n, out.length - n)
        inflater.end()
        if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      } else return Nil
    decodePrimitiveBlock(block)
  }

  private def decodePrimitiveBlock(block: Array[Byte]): Seq[Row] = {
    val p = new Pbf(block, 0, block.length)
    var strings: Array[String] = Array.empty
    val groups = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (p.hasMore) {
      p.tag() match {
        case (1, 2) => // StringTable: 1=repeated bytes
          val (s, e) = p.lenDelim()
          val st = new Pbf(block, s, e)
          val buf = scala.collection.mutable.ArrayBuffer[String]()
          while (st.hasMore) {
            st.tag() match {
              case (1, 2) => val (ss, se) = st.lenDelim(); buf += new String(block, ss, se - ss, "UTF-8")
              case (_, w) => st.skip(w)
            }
          }
          strings = buf.toArray
        case (2, 2) => groups += p.lenDelim()
        case (17, 0) => granularity = p.varint()
        case (19, 0) => latOffset = p.varint()
        case (20, 0) => lonOffset = p.varint()
        case (_, w) => p.skip(w)
      }
    }
    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    val latC = (v: Long) => 1e-9 * (latOffset + granularity * v)
    val lonC = (v: Long) => 1e-9 * (lonOffset + granularity * v)
    groups.foreach { case (gs, ge) =>
      val g = new Pbf(block, gs, ge)
      while (g.hasMore) {
        g.tag() match {
          case (1, 2) => // plain Node
            val (s, e) = g.lenDelim()
            rows += decodeNode(block, s, e, strings, latC, lonC)
          case (2, 2) => // DenseNodes
            val (s, e) = g.lenDelim()
            rows ++= decodeDense(block, s, e, strings, latC, lonC)
          case (3, 2) => // Way
            val (s, e) = g.lenDelim()
            rows += decodeWay(block, s, e, strings)
          case (4, 2) => // Relation
            val (s, e) = g.lenDelim()
            rows += decodeRelation(block, s, e, strings)
          case (_, w) => g.skip(w)
        }
      }
    }
    rows.toSeq
  }

  private def tagsOf(keys: Array[Long], vals: Array[Long], strings: Array[String]): Map[String, String] =
    keys.zip(vals).map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap

  private def decodeNode(block: Array[Byte], s: Int, e: Int, strings: Array[String],
      latC: Long => Double, lonC: Long => Double): Row = {
    val p = new Pbf(block, s, e)
    var id = 0L; var lat = 0L; var lon = 0L
    var keys = Array.empty[Long]; var vals = Array.empty[Long]
    while (p.hasMore) {
      p.tag() match {
        case (1, 0) => id = p.zigzag()
        case (2, 2) => val (ps, pe) = p.lenDelim(); keys = p.packedVarints(ps, pe)
        case (3, 2) => val (ps, pe) = p.lenDelim(); vals = p.packedVarints(ps, pe)
        case (8, 0) => lat = p.zigzag()
        case (9, 0) => lon = p.zigzag()
        case (_, w) => p.skip(w)
      }
    }
    Row("node", id, tagsOf(keys, vals, strings), null, latC(lat), lonC(lon), null, null)
  }

  private def decodeDense(block: Array[Byte], s: Int, e: Int, strings: Array[String],
      latC: Long => Double, lonC: Long => Double): Seq[Row] = {
    val p = new Pbf(block, s, e)
    var ids = Array.empty[Long]; var lats = Array.empty[Long]; var lons = Array.empty[Long]
    var keysVals = Array.empty[Long]
    while (p.hasMore) {
      p.tag() match {
        case (1, 2) => val (ps, pe) = p.lenDelim(); ids = p.packedZigzags(ps, pe)
        case (8, 2) => val (ps, pe) = p.lenDelim(); lats = p.packedZigzags(ps, pe)
        case (9, 2) => val (ps, pe) = p.lenDelim(); lons = p.packedZigzags(ps, pe)
        case (10, 2) => val (ps, pe) = p.lenDelim(); keysVals = p.packedVarints(ps, pe)
        case (_, w) => p.skip(w)
      }
    }
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var id = 0L; var lat = 0L; var lon = 0L
    var kv = 0
    var i = 0
    while (i < ids.length) {
      id += ids(i); lat += lats(i); lon += lons(i)
      var tags = Map.empty[String, String]
      if (keysVals.nonEmpty) {
        while (kv < keysVals.length && keysVals(kv) != 0L) {
          tags += strings(keysVals(kv).toInt) -> strings(keysVals(kv + 1).toInt)
          kv += 2
        }
        kv += 1 // consume the 0 delimiter
      }
      out += Row("node", id, tags, null, latC(lat), lonC(lon), null, null)
      i += 1
    }
    out.toSeq
  }

  private def decodeWay(block: Array[Byte], s: Int, e: Int, strings: Array[String]): Row = {
    val p = new Pbf(block, s, e)
    var id = 0L
    var keys = Array.empty[Long]; var vals = Array.empty[Long]; var refs = Array.empty[Long]
    while (p.hasMore) {
      p.tag() match {
        case (1, 0) => id = p.varint()
        case (2, 2) => val (ps, pe) = p.lenDelim(); keys = p.packedVarints(ps, pe)
        case (3, 2) => val (ps, pe) = p.lenDelim(); vals = p.packedVarints(ps, pe)
        case (8, 2) =>
          val (ps, pe) = p.lenDelim()
          val deltas = p.packedZigzags(ps, pe)
          var acc = 0L
          refs = deltas.map { d => acc += d; acc }
        case (_, w) => p.skip(w)
      }
    }
    Row("way", id, tagsOf(keys, vals, strings), refs.toSeq, null, null, null, null)
  }

  private def decodeRelation(block: Array[Byte], s: Int, e: Int, strings: Array[String]): Row = {
    val p = new Pbf(block, s, e)
    var id = 0L
    var keys = Array.empty[Long]; var vals = Array.empty[Long]
    var roles = Array.empty[Long]; var memids = Array.empty[Long]; var types = Array.empty[Long]
    while (p.hasMore) {
      p.tag() match {
        case (1, 0) => id = p.varint()
        case (2, 2) => val (ps, pe) = p.lenDelim(); keys = p.packedVarints(ps, pe)
        case (3, 2) => val (ps, pe) = p.lenDelim(); vals = p.packedVarints(ps, pe)
        case (8, 2) => val (ps, pe) = p.lenDelim(); roles = p.packedVarints(ps, pe)
        case (9, 2) =>
          val (ps, pe) = p.lenDelim()
          val deltas = p.packedZigzags(ps, pe)
          var acc = 0L
          memids = deltas.map { d => acc += d; acc }
        case (10, 2) => val (ps, pe) = p.lenDelim(); types = p.packedVarints(ps, pe)
        case (_, w) => p.skip(w)
      }
    }
    val typeNames = Array("node", "way", "relation")
    Row("relation", id, tagsOf(keys, vals, strings), memids.toSeq, null, null,
      roles.map(r => strings(r.toInt)).toSeq, types.map(t => typeNames(t.toInt)).toSeq)
  }
}
