package graft

import org.apache.spark.sql.functions._
import graft.GeoFunctions._
import graft.sources.{GeoParquetMeta, GeoRead, GeoTable}

/** GeoParquet `geo` footer metadata: written files carry the standard
 *  key, stay readable by Spark's parquet reader, and re-tagging is
 *  idempotent (reference writer analog: gdal/functions/st_write.cpp:
 *  340-376). */
class GeoParquetMetaSpec extends SparkSpec {

  test("writeGeoParquet stamps geo metadata; files stay valid; idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geopq").toString + "/t"
    val df = spark.range(100).select(col("id"),
      st_point(col("id").cast("double"), lit(1.0)).as("geom"))
    GeoTable.writeGeoParquet(df, "geom", dir, bbox = Some((0.0, 1.0, 99.0, 1.0)))

    val meta = GeoParquetMeta.readGeoMetadata(dir)
    assert(meta.isDefined, "geo key missing from footer")
    assert(meta.get.contains("\"version\":\"1.0.0\""))
    assert(meta.get.contains("\"primary_column\":\"geom\""))
    assert(meta.get.contains("\"encoding\":\"WKB\""))
    assert(meta.get.contains("\"bbox\":[0.0,1.0,99.0,1.0]"))

    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    val sx = back.select(sum(st_x(col("geom")))).collect()(0).getDouble(0)
    assert(sx == (0 until 100).sum.toDouble)

    // re-tag replaces, never duplicates, and keeps the file valid;
    // a code becomes a GeoParquet-1.1 PROJJSON OBJECT carrying its id
    GeoParquetMeta.tagDirectory(dir, "geom", crs = Some("EPSG:4326"))
    val meta2 = GeoParquetMeta.readGeoMetadata(dir).get
    assert(meta2.contains("\"crs\":{") && meta2.contains("\"type\":\"GeographicCRS\"") &&
      meta2.contains("\"id\":{\"authority\":\"EPSG\",\"code\":4326}") && !meta2.contains("bbox"),
      meta2.take(400))
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("geo metadata crs round-trips as PROJJSON through st_read_meta") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geopq-crs").toString + "/t.parquet"
    val df = spark.range(40).select(col("id"),
      st_point((col("id") % 10).cast("double"), (col("id") % 5).cast("double")).as("geom"))
    GeoTable.writeGeoParquet(df, "geom", dir, crs = Some("EPSG:2154"))
    val crs = GeoRead.readMeta(spark, dir)
      .selectExpr("layers[0].geometry_fields[0].crs.auth_name AS a",
        "layers[0].geometry_fields[0].crs.auth_code AS c",
        "layers[0].geometry_fields[0].crs.proj4 AS p4",
        "get_json_object(layers[0].geometry_fields[0].crs.projjson, '$.conversion.method.id.code') AS m")
      .collect()(0)
    assert(crs.getString(0) == "EPSG" && crs.getString(1) == "2154", crs.toString)
    assert(crs.getString(2).startsWith("+proj=lcc"), crs.getString(2))
    assert(crs.getString(3) == "9802", crs.toString)
    // and the derived proj4 resolves onto the Lambert-93 transform
    val sys = graft.functions.Crs.resolve(crs.getString(2))
    val ref = graft.functions.Crs.resolve("EPSG:2154")
    val (ax, ay) = sys.forward(2.35, 48.85); val (bx, by) = ref.forward(2.35, 48.85)
    assert(math.abs(ax - bx) < 1e-6 && math.abs(ay - by) < 1e-6, s"($ax,$ay) vs ($bx,$by)")
  }

  test("writeClustered output carries geo metadata with the extent bbox") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geopq-c").toString + "/t"
    val df = spark.range(500).select(col("id"),
      st_point((col("id") % 50).cast("double"), (col("id") % 20).cast("double")).as("geom"))
    GeoTable.writeClustered(df, "geom", dir, (0.0, 0.0, 50.0, 20.0), numFiles = 3)
    val meta = GeoParquetMeta.readGeoMetadata(dir)
    assert(meta.exists(m => m.contains("\"bbox\":[0.0,0.0,50.0,20.0]") && m.contains("\"primary_column\":\"geom\"")))
    // clustered tables carry <geom>_bbox → 1.1 covering mapping, so
    // external readers can drive their own row-group pruning off it
    assert(meta.exists(_.contains("\"version\":\"1.1.0\"")))
    assert(meta.exists(_.contains(
      """"covering":{"bbox":{"xmin":["geom_bbox","xmin"]""")), meta.get)
    assert(spark.read.parquet(dir).count() == 500)
  }
}
