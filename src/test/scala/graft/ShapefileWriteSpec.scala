package graft

import graft.GeoFunctions._
import graft.sources.Shapefile
import org.apache.spark.sql.functions._

/** Shapefile writer roundtrips through our own reader (one shape class
 *  per file, spec winding, dBASE typing incl. nulls and UTF-8). */
class ShapefileWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-shpw").toString + s"/$name.shp"

  test("point layer roundtrip with typed attributes and nulls") {
    val out = tmp("pts")
    val df = (1 to 500).map { i =>
      (i.toLong, s"nom_${i}é", if (i % 5 == 0) None else Some(i * 0.25), i % 2 == 0)
    }.toDF("id", "name", "score", "even")
      .select($"id", $"name", $"score".cast("double").as("score"), $"even",
        st_point(lit(1.0) * ($"id" % 50), lit(1.0) * ($"id" % 20)).as("geom"))
    Shapefile.write(df, "geom", out)

    val back = Shapefile.read(spark, out)
    assert(back.columns.toSeq == Seq("id", "name", "score", "even", "geom"))
    assert(back.count() == 500)
    val got = back.select($"id", $"name", $"score", $"even",
      st_astext($"geom").as("wkt")).as[(Long, String, Option[Double], Boolean, String)]
      .collect().toSet
    val want = df.select($"id", $"name", $"score", $"even",
      st_astext($"geom").as("wkt")).as[(Long, String, Option[Double], Boolean, String)]
      .collect().toSet
    assert(got == want)
  }

  test("polygon layer roundtrip preserves shells and holes") {
    val out = tmp("polys")
    val wkts = Seq(
      (1L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
      (2L, "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"),
      (3L, "MULTIPOLYGON (((40 0, 44 0, 44 4, 40 4, 40 0)), ((50 0, 54 0, 54 4, 50 4, 50 0)))"))
    val df = wkts.toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    Shapefile.write(df, "geom", out)
    val back = Shapefile.read(spark, out)
    assert(back.count() == 3)
    val area = back.select(sum(st_area($"geom"))).collect()(0).getDouble(0)
    val want = df.select(sum(st_area($"geom"))).collect()(0).getDouble(0)
    assert(math.abs(area - want) < 1e-9)
    val holes = back.filter($"id" === 1)
      .select(st_ninteriorrings($"geom")).collect()(0).getInt(0)
    assert(holes == 1)
  }

  test("polyline Z layer roundtrip carries Z") {
    val out = tmp("lines")
    val df = Seq(
      (1L, "LINESTRING Z (0 0 5, 1 1 6)"),
      (2L, "LINESTRING Z (2 2 7, 3 3 8, 4 4 9)")).toDF("id", "wkt")
      .select($"id", st_geomfromtext($"wkt").as("geom"))
    Shapefile.write(df, "geom", out)
    val back = Shapefile.read(spark, out)
    assert(back.count() == 2)
    val zsum = back.select(sum(st_z(st_startpoint($"geom")))).collect()(0).getDouble(0)
    assert(zsum == 5.0 + 7.0)
  }

  test("null geometry writes a Null shape record") {
    val out = tmp("nulls")
    val df = Seq((1L, Some("POINT (1 2)")), (2L, None)).toDF("id", "wkt")
      .select($"id", st_geomfromtext($"wkt").as("geom"))
    Shapefile.write(df, "geom", out)
    val back = Shapefile.read(spark, out)
    assert(back.count() == 2)
    assert(back.filter($"geom".isNull).select($"id").collect()(0).getLong(0) == 2L)
  }

  test("GeoWrite dispatches by extension and roundtrips via GeoRead") {
    val base = java.nio.file.Files.createTempDirectory("graft-geow").toString
    val df = (1 to 20).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
      .select($"id", $"tag", st_point($"id".cast("double"), lit(2.0)).as("geom"))
    for (ext <- Seq("parquet", "fgb", "shp", "geojson")) {
      val p = s"$base/t.$ext"
      graft.sources.GeoWrite.write(df, p)
      val back = graft.sources.GeoRead.read(spark, p)
      assert(back.count() == 20, s"roundtrip failed for .$ext")
    }
    intercept[IllegalArgumentException] {
      graft.sources.GeoWrite.write(df, s"$base/t.xyz")
    }
  }

  test(".prj sidecar: default WGS84, generated zone WKT, literal pass-through") {
    val out = tmp("prj")
    val df = Seq((1L, "a")).toDF("id", "name")
      .select($"id", $"name", st_point(lit(-73.9), lit(40.7)).as("geom"))
    Shapefile.write(df, "geom", out)
    val base = out.stripSuffix(".shp")
    val prj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base + ".prj")), "UTF-8")
    assert(prj.startsWith("""GEOGCS["GCS_WGS_1984""""))
    // readMeta surfaces the sidecar CRS on the geometry field
    val meta = graft.sources.GeoRead.readMeta(spark, out).collect()(0)
    val wkt = meta.getSeq[org.apache.spark.sql.Row](3).head
      .getSeq[org.apache.spark.sql.Row](2).head.getStruct(3).getString(3)
    assert(wkt == prj)

    val out2 = tmp("prj2263")
    Shapefile.write(df, "geom", out2, "EPSG:2263")
    val prj2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out2.stripSuffix(".shp") + ".prj")), "UTF-8")
    assert(prj2.contains("Lambert_Conformal_Conic") && prj2.contains("Foot_US")
      && prj2.contains("""PARAMETER["False_Easting",984250"""))

    val out3 = tmp("prjlit")
    val literal = """PROJCS["custom",GEOGCS["GCS_WGS_1984"]]"""
    Shapefile.write(df, "geom", out3, literal)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out3.stripSuffix(".shp") + ".prj")), "UTF-8") == literal)

    intercept[IllegalArgumentException] {
      Shapefile.write(df, "geom", tmp("prjbad"), "EPSG:99999")
    }
  }

  test("every catalog CRS has ESRI WKT for the .prj sidecar") {
    graft.functions.Crs.registry.foreach { i =>
      assert(graft.functions.Crs.esriWkt(s"${i.authName}:${i.code}").isDefined,
        s"${i.authName}:${i.code}")
    }
    // EVERY listed code, parametric families included — a prefix arm
    // in the esriWkt match whose body returns None silently swallows
    // later literals (the r11 Monte Mario / Korea shadowing); this
    // sweep makes any such gap a red test, whatever the arm order
    graft.functions.Crs.listAll().foreach { row =>
      val code = s"${row._1}:${row._2}"
      assert(graft.functions.Crs.esriWkt(code).isDefined, code)
    }
  }

  test("mixed geometry classes are rejected, not silently mangled") {
    val out = tmp("mixed")
    val df = Seq((1L, "POINT (1 2)"), (2L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val e = intercept[Exception] { Shapefile.write(df, "geom", out) }
    assert(e.getMessage.contains("Polygon") || e.getCause != null)
  }

  test("writer roundtrips the NYC reference fixture") {
    val dir = new java.io.File("/root/reference/test/data/nyc_export")
    val src = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .find(_.getName.toLowerCase.endsWith(".shp")).map(_.getPath)
    assume(src.isDefined, "reference fixture not present")
    val df = Shapefile.read(spark, src.get)
    val out = tmp("nyc")
    Shapefile.write(df, "geom", out)
    val back = Shapefile.read(spark, out)
    assert(back.count() == df.count())
    val a = df.select(sum(st_area($"geom")), sum(st_npoints($"geom"))).collect()(0)
    val b = back.select(sum(st_area($"geom")), sum(st_npoints($"geom"))).collect()(0)
    assert(math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-6)
    assert(a.getLong(1) == b.getLong(1))
  }
}
