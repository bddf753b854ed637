package graft.sources

import graft.functions.{GeoJson, Jts}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/**
 * ST_Read analog: one entry point over the supported geo formats with
 * path-extension dispatch (the reference's replacement scans —
 * gdal/functions/st_read.cpp:598-613 — map `.shp`/`.geojson`/... to
 * the right reader). GDAL's 50+ drivers are out of scope (SURVEY §7.3);
 * supported: GeoParquet/parquet+WKB, GeoJSON (FeatureCollection or
 * newline-delimited features), Shapefile, CSV+WKT.
 */
object GeoRead {

  /** Read any supported geo format by extension. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".osm.pbf") || lower.endsWith(".pbf")) OsmPbf.read(spark, path)
    else if (lower.endsWith(".shp")) Shapefile.read(spark, path)
    else if (lower.endsWith(".geojson") || lower.endsWith(".json")) readGeoJson(spark, path)
    else if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".csv")) readCsvWkt(spark, path)
    else throw new IllegalArgumentException(
      s"unsupported format for $path (supported: .shp, .geojson, .parquet, .csv, .osm.pbf)")
  }

  /**
   * GeoJSON reader. Handles both a single FeatureCollection document
   * and newline-delimited GeoJSON features (GeoJSONSeq). Properties
   * come back as a map<string,string> plus the WKB geometry — schema
   * inference over arbitrary property sets is left to the caller
   * (select + cast), which keeps the scan single-pass.
   */
  def readGeoJson(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("properties", MapType(StringType, StringType)),
      StructField("geom", BinaryType)))
    import com.fasterxml.jackson.databind.ObjectMapper
    val text = spark.read.option("wholetext", "true").text(path)
    val rows = text.rdd.flatMap { r =>
      val mapper = new ObjectMapper()
      val content = r.getString(0).trim
      // newline-delimited if there are multiple lines and the first is
      // itself a complete JSON object (Jackson would silently parse
      // only the first object of an NDJSON blob)
      val lines = content.linesIterator.filter(_.trim.nonEmpty).toSeq
      val ndjson = lines.length > 1 && lines.head.trim.endsWith("}") &&
        (try { mapper.readTree(lines.head); true } catch { case _: Exception => false })
      val features: Iterator[com.fasterxml.jackson.databind.JsonNode] =
        if (ndjson) lines.iterator.map(mapper.readTree)
        else {
          val root = mapper.readTree(content)
          root.get("type").asText() match {
            case "FeatureCollection" =>
              val fs = root.get("features")
              (0 until fs.size()).iterator.map(fs.get)
            case "Feature" => Iterator.single(root)
            case _ => Iterator.single(mapper.createObjectNode()
              .set("geometry", root).asInstanceOf[com.fasterxml.jackson.databind.JsonNode])
          }
        }
      features.map { f =>
        val props = Option(f.get("properties")).filterNot(_.isNull).map { p =>
          val it = p.properties().iterator()
          val m = scala.collection.mutable.LinkedHashMap[String, String]()
          while (it.hasNext) {
            val e = it.next()
            m(e.getKey) = if (e.getValue.isTextual) e.getValue.asText() else e.getValue.toString
          }
          m.toMap
        }.getOrElse(Map.empty[String, String])
        val geomNode = Option(f.get("geometry")).filterNot(_.isNull)
        val wkb = geomNode.map(g => Jts.write(GeoJson.parse(g.toString))).orNull
        Row(props, wkb)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** CSV with a WKT geometry column (header required; column named
   *  `wkt`, `geom`, `geometry`, or pass explicitly). */
  def readCsvWkt(spark: SparkSession, path: String, wktColumn: String = ""): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val geomCol = if (wktColumn.nonEmpty) wktColumn
      else raw.columns.find(c => Seq("wkt", "geom", "geometry").contains(c.toLowerCase))
        .getOrElse(throw new IllegalArgumentException("no WKT column found (expected wkt/geom/geometry)"))
    raw.withColumn("geom", graft.GeoFunctions.st_geomfromtext(col(geomCol)))
      .drop(geomCol)
  }

  private def localDf(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)

  /** ST_Drivers analog: the formats this engine reads/writes. */
  def drivers(spark: SparkSession): DataFrame =
    localDf(spark, StructType(Seq(
      StructField("short_name", StringType), StructField("long_name", StringType),
      StructField("can_open", BooleanType), StructField("can_create", BooleanType))),
      Seq(
        Row("parquet", "GeoParquet / Parquet with WKB", true, true),
        Row("geojson", "GeoJSON (FeatureCollection / newline-delimited)", true, true),
        Row("shapefile", "ESRI Shapefile (.shp/.shx/.dbf/.cpg)", true, false),
        Row("csv_wkt", "CSV with WKT geometry column", true, true),
        Row("osm_pbf", "OpenStreetMap PBF (.osm.pbf)", true, false)))

  /** ST_Read_Meta analog: per-file metadata for supported formats. */
  def readMeta(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    val (driver, schema) =
      if (lower.endsWith(".shp")) ("shapefile", Shapefile.schemaOf(path).simpleString)
      else if (lower.endsWith(".parquet")) ("parquet", spark.read.parquet(path).schema.simpleString)
      else if (lower.endsWith(".geojson") || lower.endsWith(".json")) ("geojson", "properties map<string,string>, geom binary")
      else ("unknown", "")
    localDf(spark, StructType(Seq(
      StructField("path", StringType), StructField("driver", StringType),
      StructField("schema", StringType))),
      Seq(Row(path, driver, schema)))
  }

  /**
   * ST_GeneratePoints analog (reference core/functions/table/
   * st_generatepoints.cpp): `count` seeded uniform points in the box,
   * distributed via spark.range (scales to any count).
   */
  def generatePoints(
      spark: SparkSession, minX: Double, minY: Double, maxX: Double, maxY: Double,
      count: Long, seed: Long = 42L): DataFrame = {
    spark.range(count).select(col("id"),
      graft.GeoFunctions.st_point(
        lit(minX) + (lit(maxX) - lit(minX)) * rand(seed),
        lit(minY) + (lit(maxY) - lit(minY)) * rand(seed + 1)).as("point"))
  }
}

/** GeoJSON writer: one feature per row, newline-delimited (streamable,
 *  partition-parallel — a FeatureCollection wrapper would serialize
 *  through one writer). Reference writes via GDAL COPY TO
 *  (gdal/functions/st_write.cpp). */
object GeoJsonWriter {
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    import graft.GeoFunctions._
    val props = df.columns.filter(_ != geomCol)
    val propsJson = struct(props.map(col): _*)
    df.select(concat(
      lit("""{"type":"Feature","properties":"""),
      to_json(propsJson),
      lit(""","geometry":"""),
      st_asgeojson(col(geomCol)),
      lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
