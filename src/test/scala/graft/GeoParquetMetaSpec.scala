package graft

import org.apache.spark.sql.functions._
import graft.GeoFunctions._
import graft.sources.{GeoParquetMeta, GeoTable}

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

    // re-tag replaces, never duplicates, and keeps the file valid
    GeoParquetMeta.tagDirectory(dir, "geom", crs = Some("EPSG:4326"))
    val meta2 = GeoParquetMeta.readGeoMetadata(dir).get
    assert(meta2.contains("\"crs\":\"EPSG:4326\"") && !meta2.contains("bbox"))
    assert(spark.read.parquet(dir).count() == 100)
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
