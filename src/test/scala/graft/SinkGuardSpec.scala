package graft

import graft.sources.{FlatGeobuf, GeoPackageWrite, GeoJsonWriter, Shapefile}
import org.apache.spark.sql.functions._

/** The driver-funnel sinks (single-file formats streamed through the
 *  driver) must refuse oversized exports with an actionable error
 *  instead of silently funneling a cluster-scale table into one JVM. */
class SinkGuardSpec extends SparkSpec {
  import spark.implicits._

  private def pts(n: Int) = spark.range(n).select(col("id"),
    GeoFunctions.st_point(col("id").cast("double"), lit(1.5)).as("geom"))

  private def withCap[A](cap: Long)(body: => A): A = {
    spark.conf.set("spark.graft.sink.maxDriverRows", cap.toString)
    try body finally spark.conf.unset("spark.graft.sink.maxDriverRows")
  }

  test("all four driver-funnel sinks refuse above the row cap, pointing at the parallel sink") {
    val df = pts(10)
    val dir = java.nio.file.Files.createTempDirectory("sink-guard").toString
    val writers: Seq[(String, () => Unit)] = Seq(
      "GeoPackage" -> (() => GeoPackageWrite.write(df, "geom", s"$dir/a.gpkg")),
      "FlatGeobuf" -> (() => FlatGeobuf.write(df, "geom", s"$dir/a.fgb")),
      "Shapefile" -> (() => Shapefile.write(df, "geom", s"$dir/a.shp")),
      "FeatureCollection" -> (() => GeoJsonWriter.writeFeatureCollection(df, "geom", s"$dir/a.geojson")))
    withCap(5) {
      writers.foreach { case (name, w) =>
        val e = intercept[IllegalArgumentException](w())
        assert(e.getMessage.contains("10 rows"), s"$name: ${e.getMessage}")
        assert(e.getMessage.toLowerCase.contains("parallel"), s"$name: ${e.getMessage}")
      }
    }
    // under the cap, the same writers succeed
    withCap(10) {
      writers.foreach { case (_, w) => w() }
      assert(new java.io.File(s"$dir/a.gpkg").length() > 0)
      assert(new java.io.File(s"$dir/a.fgb").length() > 0)
    }
    // cap -1 disables the guard
    withCap(-1) { GeoJsonWriter.writeFeatureCollection(df, "geom", s"$dir/b.geojson") }
    assert(new java.io.File(s"$dir/b.geojson").length() > 0)
  }

  test("st_table_stats dumps per-file bbox/rows from footers only") {
    val n = 4000
    val out = java.nio.file.Files.createTempDirectory("tstats").toString + "/tbl"
    sources.GeoTable.writeClustered(pts(n).select(col("id"),
        GeoFunctions.st_point((col("id") % 100).cast("double"),
          (col("id") % 77).cast("double")).as("geom")),
      "geom", out, (0.0, 0.0, 100.0, 100.0), numFiles = 4)
    val stats = spark.sql(s"SELECT * FROM st_table_stats('$out')").collect()
    assert(stats.length == 4, s"expected 4 part files, got ${stats.length}")
    assert(stats.map(_.getLong(1)).sum == n) // row_count sums to the table
    stats.foreach { r =>
      assert(r.getLong(2) > 0 && r.getInt(3) >= 1) // bytes, row_groups
      // every per-file bbox is inside the declared extent
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) >= 0.0)
      assert(r.getDouble(6) <= 100.0 && r.getDouble(7) <= 100.0)
    }
    // hilbert clustering separates files spatially: bboxes are not all
    // the global extent (at least two distinct xmin across files)
    assert(stats.map(_.getDouble(4)).distinct.length >= 2)
    // cross-check one file's stats against a real scan of that file
    val f0 = stats.minBy(_.getString(0))
    val scan = spark.read.parquet(s"$out/${f0.getString(0)}")
      .agg(count("*"), min("geom_bbox.xmin"), min("geom_bbox.ymin"),
        max("geom_bbox.xmax"), max("geom_bbox.ymax")).head
    assert(scan.getLong(0) == f0.getLong(1))
    assert(scan.getDouble(1) == f0.getDouble(4) && scan.getDouble(2) == f0.getDouble(5))
    assert(scan.getDouble(3) == f0.getDouble(6) && scan.getDouble(4) == f0.getDouble(7))
  }
}
