package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry}

import graft.functions.Jts

/**
 * AutoCAD DXF (ASCII) reader — the published Autodesk DXF group-code
 * layout: the file is a stream of (group-code line, value line) pairs;
 * features live in the ENTITIES section between `0/SECTION 2/ENTITIES`
 * and `0/ENDSEC`. One of the GDAL long-tail drivers the reference
 * reaches through its GDAL bridge (reference
 * `gdal/functions/st_read.cpp:668-702`, driver table
 * `docs/internals.md` row "DXF / AutoCAD DXF").
 *
 * Entity support and mapping (one row per entity, GDAL's
 * single-"entities"-layer model with Layer/EntityHandle/Linetype/Text
 * attributes):
 *  - POINT           → POINT (codes 10/20)
 *  - LINE            → LINESTRING (10/20 → 11/21)
 *  - LWPOLYLINE      → LINESTRING, or POLYGON when the closed flag
 *                      (code 70 bit 1) is set (90 = vertex count,
 *                      repeated 10/20 pairs)
 *  - POLYLINE        → as LWPOLYLINE, vertices from the following
 *                      VERTEX entities up to SEQEND
 *  - CIRCLE          → POLYGON, a deterministic 32-segment
 *                      approximation starting at angle 0 (10/20
 *                      center, 40 radius)
 *  - ARC             → LINESTRING, ceil(sweep/11.25°) segments (min
 *                      2) from start angle 50 to end angle 51 CCW
 *  - TEXT / MTEXT    → POINT at the insertion point, string in the
 *                      `text` column (code 1)
 * Unsupported kinds (INSERT/SPLINE/ELLIPSE/HATCH/SOLID/3DFACE/
 * DIMENSION/...) raise with the kind named — the same clear-error
 * contract as the MIF reader and the CRS registry: no silent nulls.
 *
 * Z coordinates (30/31) are accepted and dropped (2D output, matching
 * the engine's 2D WKB core). Like the other single-file containers
 * the unit of parallelism is the FILE — a directory of .dxf files
 * fans out one task per file via GeoRead's plan-level union.
 */
object Dxf {

  val schema: StructType = StructType(Seq(
    StructField("layer", StringType), StructField("entity_handle", StringType),
    StructField("linetype", StringType), StructField("text", StringType),
    StructField("geom", BinaryType)))

  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(Seq(path), 1)
      .flatMap(f => parseEntities(f).map { e =>
        Row(e.layer, e.handle, e.linetype, e.text, e.geom.map(Jts.write).orNull)
      })
    spark.createDataFrame(rows, schema)
  }

  final case class DxfEntity(
      kind: String, layer: String, handle: String, linetype: String,
      text: String, geom: Option[Geometry])

  /** The raw (code, value) pair stream of one entity, file order kept
   *  (codes repeat: one 10/20 pair per LWPOLYLINE vertex). */
  private final case class RawEnt(kind: String, pairs: Vector[(Int, String)]) {
    def first(code: Int): Option[String] = pairs.collectFirst { case (c, v) if c == code => v }
    def firstD(code: Int): Option[Double] = first(code).map(_.toDouble)
    def all(code: Int): Vector[String] = pairs.collect { case (c, v) if c == code => v }
  }

  def parseEntities(path: String): Vector[DxfEntity] = {
    val raw = rawEntities(path)
    val out = Vector.newBuilder[DxfEntity]
    var i = 0
    while (i < raw.length) {
      val e = raw(i)
      e.kind match {
        case "POLYLINE" =>
          // consume the VERTEX run and its SEQEND
          var j = i + 1
          val verts = Vector.newBuilder[Coordinate]
          while (j < raw.length && raw(j).kind == "VERTEX") {
            verts += new Coordinate(raw(j).firstD(10).get, raw(j).firstD(20).get)
            j += 1
          }
          require(j < raw.length && raw(j).kind == "SEQEND",
            s"$path: POLYLINE at entity ${i} has no SEQEND")
          out += polyline(e, verts.result().toArray,
            closed = (e.first(70).map(_.trim.toInt).getOrElse(0) & 1) != 0, path)
          i = j + 1
        case "VERTEX" | "SEQEND" =>
          throw new IllegalArgumentException(s"$path: orphan ${e.kind} outside POLYLINE")
        case _ =>
          out += simpleEntity(e, path)
          i += 1
      }
    }
    out.result()
  }

  private def simpleEntity(e: RawEnt, path: String): DxfEntity = {
    val geom: Option[Geometry] = e.kind match {
      case "POINT" =>
        Some(Jts.point(e.firstD(10).get, e.firstD(20).get))
      case "LINE" =>
        Some(Jts.gf.createLineString(Array(
          new Coordinate(e.firstD(10).get, e.firstD(20).get),
          new Coordinate(e.firstD(11).get, e.firstD(21).get))))
      case "LWPOLYLINE" =>
        val xs = e.all(10).map(_.toDouble); val ys = e.all(20).map(_.toDouble)
        val n = e.first(90).map(_.trim.toInt).getOrElse(xs.length)
        require(xs.length == n && ys.length == n,
          s"$path: LWPOLYLINE declares $n vertices, has ${xs.length}/${ys.length}")
        val closed = (e.first(70).map(_.trim.toInt).getOrElse(0) & 1) != 0
        return polyline(e, xs.zip(ys).map { case (x, y) => new Coordinate(x, y) }.toArray,
          closed, path)
      case "CIRCLE" =>
        val (cx, cy, r) = (e.firstD(10).get, e.firstD(20).get, e.firstD(40).get)
        val ring = (0 until CircleSegments).map { k =>
          val a = 2.0 * math.Pi * k / CircleSegments
          new Coordinate(cx + r * math.cos(a), cy + r * math.sin(a))
        }.toArray :+ new Coordinate(cx + r, cy)
        Some(Jts.gf.createPolygon(ring))
      case "ARC" =>
        val (cx, cy, r) = (e.firstD(10).get, e.firstD(20).get, e.firstD(40).get)
        val a0 = e.firstD(50).get
        val a1raw = e.firstD(51).get
        val sweep = { val s = (a1raw - a0) % 360.0; if (s <= 0) s + 360.0 else s }
        val n = math.max(2, math.ceil(sweep / ArcSegmentDeg).toInt)
        Some(Jts.gf.createLineString((0 to n).map { k =>
          val a = math.toRadians(a0 + sweep * k / n)
          new Coordinate(cx + r * math.cos(a), cy + r * math.sin(a))
        }.toArray))
      case "TEXT" | "MTEXT" =>
        Some(Jts.point(e.firstD(10).get, e.firstD(20).get))
      case other => throw new IllegalArgumentException(
        s"$path: unsupported DXF entity '$other' (supported: POINT, LINE, " +
        "LWPOLYLINE, POLYLINE, CIRCLE, ARC, TEXT, MTEXT)")
    }
    attrs(e, geom)
  }

  private def polyline(e: RawEnt, cs: Array[Coordinate], closed: Boolean,
      path: String): DxfEntity = {
    require(cs.length >= 2, s"$path: ${e.kind} with ${cs.length} vertices")
    val g =
      if (closed) {
        val ring = if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
        Jts.gf.createPolygon(ring)
      } else Jts.gf.createLineString(cs)
    attrs(e, Some(g))
  }

  // absent optional codes surface as NULL (not "") — the independent
  // CSV golden reads empties as NULL, and GDAL's model is nullable too
  private def attrs(e: RawEnt, g: Option[Geometry]): DxfEntity =
    DxfEntity(e.kind, e.first(8).getOrElse("0"), e.first(5).orNull,
      e.first(6).orNull,
      if (e.kind == "TEXT" || e.kind == "MTEXT") e.first(1).orNull else null,
      g)

  val CircleSegments = 32
  val ArcSegmentDeg = 11.25

  /**
   * Write a DXF ENTITIES file (GDAL's DXF driver is create-capable —
   * reference `docs/internals.md` driver table row "DXF"). Geometry
   * mapping is the write-side inverse of [[read]]:
   *  - Point       → POINT
   *  - LineString  → open LWPOLYLINE
   *  - Polygon     → one closed LWPOLYLINE per ring (DXF has no
   *                  polygon-with-holes entity short of HATCH, so each
   *                  ring becomes its own entity — GDAL's behavior)
   *  - Multi... / GeometryCollection → one entity per component
   * A `layer` string column (when present) supplies code 8; entity
   * handles are sequential hex. Null geometries are skipped. Like the
   * other driver-funnel sinks this is a single-file driver-side write
   * behind [[DriverSink.guard]]'s row cap — the cluster-parallel
   * export path stays GeoParquet/NDJSON.
   */
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    DriverSink.guard(df, "DXF", "GeoJSON NDJSON / GeoParquet (cluster-parallel)")
    val gi = df.schema.fieldIndex(geomCol)
    val li = df.columns.indexOf("layer")
    val out = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.UTF_8)
    var handle = 0L
    try {
      def emit(code: Int, value: String): Unit = {
        out.write(code.toString); out.write("\n"); out.write(value); out.write("\n")
      }
      def fmt(d: Double): String =
        if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString
      def entity(kind: String, layer: String): Unit = {
        handle += 1
        emit(0, kind); emit(5, handle.toHexString.toUpperCase); emit(8, layer)
      }
      def writeGeom(g: Geometry, layer: String): Unit = g match {
        case p: org.locationtech.jts.geom.Point =>
          entity("POINT", layer)
          emit(10, fmt(p.getX)); emit(20, fmt(p.getY))
        case l: org.locationtech.jts.geom.LineString =>
          val cs = l.getCoordinates
          entity("LWPOLYLINE", layer)
          emit(90, cs.length.toString); emit(70, "0")
          cs.foreach { c => emit(10, fmt(c.x)); emit(20, fmt(c.y)) }
        case p: org.locationtech.jts.geom.Polygon =>
          (Seq(p.getExteriorRing) ++
            (0 until p.getNumInteriorRing).map(p.getInteriorRingN(_))).foreach { ring =>
            val cs = ring.getCoordinates.dropRight(1) // closed flag re-closes
            entity("LWPOLYLINE", layer)
            emit(90, cs.length.toString); emit(70, "1")
            cs.foreach { c => emit(10, fmt(c.x)); emit(20, fmt(c.y)) }
          }
        case m: org.locationtech.jts.geom.GeometryCollection =>
          (0 until m.getNumGeometries).foreach(i => writeGeom(m.getGeometryN(i), layer))
        case other => throw new IllegalArgumentException(
          s"DXF write: unsupported geometry ${other.getGeometryType}")
      }
      emit(0, "SECTION"); emit(2, "HEADER")
      emit(9, "$ACADVER"); emit(1, "AC1015")
      emit(0, "ENDSEC")
      emit(0, "SECTION"); emit(2, "ENTITIES")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val layer = if (li >= 0 && !r.isNullAt(li)) r.getString(li) else "0"
        if (!r.isNullAt(gi)) writeGeom(Jts.read(r.getAs[Array[Byte]](gi)), layer)
      }
      emit(0, "ENDSEC"); emit(0, "EOF")
    } finally out.close()
  }

  /** All entities of the ENTITIES section as raw code/value groups. */
  private def rawEntities(path: String): Vector[RawEnt] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val lines = src.getLines().toArray
      require(lines.length % 2 == 0 || lines.last.trim.isEmpty,
        s"$path: odd DXF line count (truncated code/value pair)")
      val pairs = lines.grouped(2).collect {
        case Array(c, v) => (c.trim.toInt, v.replaceAll("[\r\n]+$", ""))
      }.toVector
      // locate the ENTITIES section
      val start = pairs.indexWhere(_ == (2, "ENTITIES"))
      require(start > 0 && pairs(start - 1) == (0, "SECTION"),
        s"$path: no ENTITIES section")
      val out = Vector.newBuilder[RawEnt]
      var kind: String = null
      var buf = Vector.newBuilder[(Int, String)]
      var i = start + 1
      var done = false
      while (i < pairs.length && !done) {
        val (code, value) = pairs(i)
        if (code == 0) {
          if (kind != null) out += RawEnt(kind, buf.result())
          if (value.trim == "ENDSEC") done = true
          else { kind = value.trim.toUpperCase; buf = Vector.newBuilder[(Int, String)] }
        } else if (kind != null) buf += ((code, value.trim))
        i += 1
      }
      require(done, s"$path: ENTITIES section has no ENDSEC")
      out.result()
    } finally src.close()
  }
}
