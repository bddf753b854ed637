package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}

import graft.functions.Jts

/**
 * TopoJSON reader (the published topojson.org specification — a
 * GDAL-bridge driver of the reference, `gdal/functions/st_read.cpp:
 * 668-702` "TopoJSON"; named in the r9 verdict's reader-breadth gap).
 * A topology stores each shared boundary ONCE as an arc; geometries
 * reference arcs by index:
 *
 *  - optional `transform` (scale + translate): arc positions are then
 *    delta-encoded integers — position k is the cumulative sum,
 *    mapped through `scale·q + translate`; Point/MultiPoint
 *    coordinates are quantized but NOT delta-encoded.
 *  - a negative arc index `i` means arc `~i` traversed REVERSED.
 *  - consecutive arcs of a line/ring share their junction position —
 *    the duplicate join point drops during stitching.
 *
 * Each named object under `objects` becomes a layer (a
 * GeometryCollection object flattens to one row per member). Columns:
 * `layer`, `id` (the geometry's id, stringified), `props`
 * (map<string,string> of properties), `geom` (WKB). Like the other
 * single-file text containers, the FILE is the unit of parallelism.
 */
object TopoJson {

  private val schema = StructType(Seq(
    StructField("layer", StringType), StructField("id", StringType),
    StructField("props", MapType(StringType, StringType)),
    StructField("geom", BinaryType)))

  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(Seq(path), 1)
      .flatMap(parseFile)
    spark.createDataFrame(rows, schema)
  }

  private[graft] def parseFile(path: String): Iterator[Row] = {
    val root = new ObjectMapper().readTree(new java.io.File(path))
    require(root.path("type").asText() == "Topology",
      s"$path: not a TopoJSON file (type=${root.path("type").asText()})")
    val (scale, translate) = {
      val t = root.get("transform")
      if (t == null) (None, (0.0, 0.0))
      else (Some((t.get("scale").get(0).asDouble, t.get("scale").get(1).asDouble)),
        (t.get("translate").get(0).asDouble, t.get("translate").get(1).asDouble))
    }
    // decode all arcs once (delta-cumsum when quantized)
    val arcsNode = root.get("arcs")
    require(arcsNode != null && arcsNode.isArray, s"$path: missing arcs array")
    val arcs: Array[Array[Coordinate]] = (0 until arcsNode.size).map { i =>
      val a = arcsNode.get(i)
      scale match {
        case Some((sx, sy)) =>
          var qx = 0L; var qy = 0L
          (0 until a.size).map { k =>
            qx += a.get(k).get(0).asLong; qy += a.get(k).get(1).asLong
            new Coordinate(qx * sx + translate._1, qy * sy + translate._2)
          }.toArray
        case None =>
          (0 until a.size).map(k =>
            new Coordinate(a.get(k).get(0).asDouble, a.get(k).get(1).asDouble)).toArray
      }
    }.toArray
    def pointCoord(n: JsonNode): Coordinate = scale match {
      case Some((sx, sy)) =>
        new Coordinate(n.get(0).asLong * sx + translate._1, n.get(1).asLong * sy + translate._2)
      case None => new Coordinate(n.get(0).asDouble, n.get(1).asDouble)
    }
    def stitch(arcIdxs: JsonNode): Array[Coordinate] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
      (0 until arcIdxs.size).foreach { k =>
        val idx = arcIdxs.get(k).asInt
        val arc = if (idx >= 0) arcs(idx) else arcs(~idx).reverse
        val from = if (out.nonEmpty && arc.nonEmpty && arc.head.equals2D(out.last)) 1 else 0
        out ++= arc.drop(from)
      }
      out.toArray
    }
    def ringOf(arcIdxs: JsonNode): LinearRing = {
      val cs = stitch(arcIdxs)
      require(cs.length >= 3, s"$path: ring with ${cs.length} positions")
      Jts.gf.createLinearRing(if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy())
    }
    def geomOf(g: JsonNode): Geometry = g.path("type").asText() match {
      case "Point" => Jts.gf.createPoint(pointCoord(g.get("coordinates")))
      case "MultiPoint" =>
        val c = g.get("coordinates")
        Jts.gf.createMultiPointFromCoords((0 until c.size).map(i => pointCoord(c.get(i))).toArray)
      case "LineString" => Jts.gf.createLineString(stitch(g.get("arcs")))
      case "MultiLineString" =>
        val a = g.get("arcs")
        Jts.gf.createMultiLineString(
          (0 until a.size).map(i => Jts.gf.createLineString(stitch(a.get(i)))).toArray)
      case "Polygon" =>
        val a = g.get("arcs")
        val rings = (0 until a.size).map(i => ringOf(a.get(i)))
        Jts.gf.createPolygon(rings.head, rings.tail.toArray)
      case "MultiPolygon" =>
        val a = g.get("arcs")
        Jts.gf.createMultiPolygon((0 until a.size).map { i =>
          val rings = (0 until a.get(i).size).map(j => ringOf(a.get(i).get(j)))
          Jts.gf.createPolygon(rings.head, rings.tail.toArray)
        }.toArray)
      case other => throw new IllegalArgumentException(
        s"$path: unsupported TopoJSON geometry type '$other'")
    }
    def propsOf(g: JsonNode): Map[String, String] = {
      val p = g.get("properties")
      if (p == null || !p.isObject) Map.empty
      else {
        val it = p.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> (if (e.getValue.isTextual) e.getValue.asText()
            else e.getValue.toString)
        }
        b.result()
      }
    }
    def idOf(g: JsonNode): String = {
      val id = g.get("id")
      if (id == null) null else if (id.isTextual) id.asText() else id.toString
    }
    val objects = root.get("objects")
    require(objects != null && objects.isObject, s"$path: missing objects")
    val names = objects.fields()
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (names.hasNext) {
      val e = names.next()
      val layer = e.getKey
      val obj = e.getValue
      val members: Seq[JsonNode] =
        if (obj.path("type").asText() == "GeometryCollection") {
          val gs = obj.get("geometries")
          (0 until gs.size).map(gs.get)
        } else Seq(obj)
      members.foreach { m =>
        out += Row(layer, idOf(m), propsOf(m), Jts.write(geomOf(m)))
      }
    }
    out.iterator
  }
}
