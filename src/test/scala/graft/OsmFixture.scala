package graft

/** Builds the tiny .osm.pbf fixture with a hand-rolled protobuf wire
 *  encoder (independent of the reader's parser in sources/OsmPbf.scala).
 *  Shared by OsmPbfSpec and the committed-resource generator main used
 *  by the driver-oracle row q_src_osm:
 *  `sbt "Test/runMain graft.OsmFixture src/test/resources/mini.osm.pbf"` */
object OsmFixture {

  // --- minimal protobuf wire writer -------------------------------------
  private class W {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): W = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def zigzag(v: Long): W = varint((v << 1) ^ (v >> 63))
    def tag(field: Int, wire: Int): W = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): W = { tag(field, 2); varint(b.length); out.write(b); this }
    def str(field: Int, s: String): W = bytes(field, s.getBytes("UTF-8"))
    def int(field: Int, v: Long): W = { tag(field, 0); varint(v) }
    def sint(field: Int, v: Long): W = { tag(field, 0); zigzag(v) }
    def packedZig(field: Int, vs: Seq[Long]): W = {
      val w = new W; vs.foreach(w.zigzag); bytes(field, w.result)
    }
    def packedVar(field: Int, vs: Seq[Long]): W = {
      val w = new W; vs.foreach(w.varint); bytes(field, w.result)
    }
    def result: Array[Byte] = out.toByteArray
  }

  /** 3 dense nodes (one tagged), 1 tagged way, 1 relation with roles. */
  def write(path: String): Unit = {
    // string table: index 0 must be "" (never referenced by convention)
    val strings = Seq("", "highway", "residential", "name", "Main St", "outer")
    val stringTable = { val w = new W; strings.foreach(s => w.str(1, s)); w.result }

    // DenseNodes: 3 nodes at (52.1,4.1),(52.2,4.2),(52.3,4.3); node 2 tagged highway=residential
    val dense = new W()
      .packedZig(1, Seq(101L, 1L, 1L))            // ids delta: 101,102,103
      .packedZig(8, Seq(521000000L, 1000000L, 1000000L)) // lat * 1e7 / gran(100) → nano = 100*these
      .packedZig(9, Seq(41000000L, 1000000L, 1000000L))
      .packedVar(10, Seq(0L, 1L, 2L, 0L, 0L))    // node1: no tags; node2: highway=residential; node3: none
      .result
    // Way 7: refs 101,102,103; name=Main St
    val way = new W().int(1, 7L)
      .packedVar(2, Seq(3L)).packedVar(3, Seq(4L))
      .packedZig(8, Seq(101L, 1L, 1L))
      .result
    // Relation 9: members way 7 (role outer), node 101
    val rel = new W().int(1, 9L)
      .packedVar(2, Seq(1L)).packedVar(3, Seq(2L))
      .packedVar(8, Seq(5L, 0L))                  // roles: "outer", ""
      .packedZig(9, Seq(7L, 94L))                 // memids delta: 7, 101
      .packedVar(10, Seq(1L, 0L))                 // types: way, node
      .result
    val group = { val w = new W; w.bytes(2, dense); w.bytes(3, way); w.bytes(4, rel); w.result }
    val block = { val w = new W; w.bytes(1, stringTable); w.bytes(2, group); w.result }

    // zlib-compress the block into a Blob
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(block); deflater.finish()
    val comp = new Array[Byte](block.length * 2 + 64)
    val clen = deflater.deflate(comp)
    deflater.end()
    val blob = { val w = new W; w.int(2, block.length); w.bytes(3, java.util.Arrays.copyOf(comp, clen)); w.result }
    val header = new W().str(1, "OSMData").int(3, blob.length).result

    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(path))
    // include an OSMHeader blob first (reader must skip it)
    val hBlob = { val w = new W; w.bytes(1, new W().str(4, "DenseNodes").result); w.result }
    val hHeader = new W().str(1, "OSMHeader").int(3, hBlob.length).result
    out.writeInt(hHeader.length); out.write(hHeader); out.write(hBlob)
    out.writeInt(header.length); out.write(header); out.write(blob)
    out.close()
  }

  def main(args: Array[String]): Unit =
    write(args.headOption.getOrElse("src/test/resources/mini.osm.pbf"))
}
