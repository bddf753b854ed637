package graft

import graft.GeoFunctions._
import graft.sources.{GeoRead, Gpx, Kml}
import org.apache.spark.sql.functions._

class GpxKmlSpec extends SparkSpec {

  private val gpxPath = "/root/repo/src/test/resources/gpx/sample.gpx"
  private val kmlPath = "/root/repo/src/test/resources/kml/sample.kml"

  test("gpx: five layers with GDAL's schemas and per-file ordinals") {
    val wpt = Gpx.read(spark, gpxPath, "waypoints").collect()
    assert(wpt.length == 3)
    val ams = wpt.find(_.getAs[String]("name") == "Amsterdam").get
    assert(ams.getAs[Double]("ele") == -2.1)
    assert(ams.getAs[String]("sym") == "Flag")
    // lat/lon become POINT(lon lat)
    val amsPt = graft.functions.Jts.read(ams.getAs[Array[Byte]]("geom"))
    assert(amsPt.getCoordinate.x == 4.8952 && amsPt.getCoordinate.y == 52.3702)
    assert(wpt.find(_.getAs[String]("name") == "Sydney").get.isNullAt(1)) // no ele

    val rte = Gpx.read(spark, gpxPath, "routes").collect()
    assert(rte.length == 2)
    val commute = rte.find(_.getAs[String]("name") == "commute").get
    assert(commute.getAs[Int]("number") == 1)
    assert(graft.functions.Jts.read(commute.getAs[Array[Byte]]("geom"))
      .getGeometryType == "LineString")

    val trk = Gpx.read(spark, gpxPath, "tracks").collect()
    val run = trk.find(_.getAs[String]("name") == "morning run").get
    val mls = graft.functions.Jts.read(run.getAs[Array[Byte]]("geom"))
    assert(mls.getGeometryType == "MultiLineString")
    assert(mls.getNumGeometries == 2) // two trksegs, tunnel gap preserved
    assert(mls.getNumPoints == 5)

    val tpt = Gpx.read(spark, gpxPath, "track_points").collect()
    assert(tpt.length == 7)
    // (track_fid, seg, point) ordinals in document order
    assert(tpt.count(r => r.getInt(0) == 0 && r.getInt(1) == 1) == 2)

    val rpt = Gpx.read(spark, gpxPath, "route_points").collect()
    assert(rpt.length == 5)
    assert(rpt.count(_.getInt(0) == 0) == 3)
  }

  test("gpx: unknown layer fails driver-side with the layer list") {
    val e = intercept[IllegalArgumentException](Gpx.read(spark, gpxPath, "nope"))
    assert(e.getMessage.contains("waypoints"))
  }

  test("kml: placemarks flatten with folder path, Z kept, ext map") {
    val rows = Kml.read(spark, kmlPath).collect()
    assert(rows.length == 6)
    val denver = rows.find(_.getAs[String]("name") == "Denver").get
    assert(denver.getAs[String]("folder") == "graft kml fixture/cities")
    val dPt = graft.functions.Jts.read(denver.getAs[Array[Byte]]("geom"))
    assert(dPt.getCoordinate.getZ == 1609.3) // explicit altitude -> 3D
    assert(denver.getAs[Map[String, String]]("ext") ==
      Map("state" -> "CO", "nickname" -> "mile high"))

    val ams = rows.find(_.getAs[String]("name") == "Amsterdam").get
    assert(graft.functions.Jts.read(ams.getAs[Array[Byte]]("geom"))
      .getCoordinate.getZ.isNaN) // no altitude -> 2D

    val yard = rows.find(_.getAs[String]("name") == "courtyard").get
    val poly = graft.functions.Jts.read(yard.getAs[Array[Byte]]("geom"))
      .asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(poly.getNumInteriorRing == 1) // hole preserved
    assert(poly.getArea == 96.0) // 10x10 minus 2x2

    val islands = rows.find(_.getAs[String]("name") == "islands").get
    assert(graft.functions.Jts.read(islands.getAs[Array[Byte]]("geom"))
      .getGeometryType == "MultiPoint")

    // root-level placemark sits under the Document name alone
    assert(rows.find(_.getAs[String]("name") == "rootmark")
      .get.getAs[String]("folder") == "graft kml fixture")
  }

  test("st_read dispatches .gpx (layer option) and .kml; meta lists layers") {
    val viaRead = GeoRead.read(spark, gpxPath, GeoRead.ReadOptions(layer = "tracks"))
    assert(viaRead.columns.contains("number") && viaRead.count() == 2)
    // default layer is waypoints
    assert(GeoRead.read(spark, gpxPath).count() == 3)
    assert(GeoRead.read(spark, kmlPath).select("folder").distinct().count() == 3)

    val meta = GeoRead.readMeta(spark, gpxPath).selectExpr("explode(layers.name)")
      .collect().map(_.getString(0)).toSet
    assert(meta == Gpx.layers.toSet)
    val drivers = GeoRead.drivers(spark).collect().map(_.getString(0)).toSet
    assert(drivers.contains("gpx") && drivers.contains("kml"))
  }

  test("directory of gpx files unions plan-level (one task per file)") {
    val tmp = java.nio.file.Files.createTempDirectory("gpxdir")
    java.nio.file.Files.copy(java.nio.file.Paths.get(gpxPath), tmp.resolve("a.gpx"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(gpxPath), tmp.resolve("b.gpx"))
    assert(GeoRead.read(spark, tmp.toString).count() == 6) // 2x waypoints
  }

  private val gmlPath = "/root/repo/src/test/resources/gml/sample.gml"

  test("gml: feature members, gml2/gml3 geometry forms, srs, props, Z") {
    import org.apache.spark.sql.functions._
    import graft.GeoFunctions._
    val df = GeoRead.read(spark, gmlPath)
    assert(df.count() == 7)
    val byFid = df.collect().map(r => r.getAs[String]("fid") -> r).toMap

    // polygon with hole (GML3 exterior/interior posList)
    val bld = df.filter(col("fid") === "bld.1")
      .selectExpr("st_ninteriorrings(geom)", "st_npoints(geom)",
        "srs", "props['height']")
      .collect()(0)
    assert(bld.get(0) == 1 && bld.get(1) == 10)
    assert(bld.getString(2) == "EPSG:4326" && bld.getString(3) == "42.5")

    // srsDimension=3 posList keeps Z
    val road = df.filter(col("fid") === "road.7")
      .selectExpr("st_hasz(geom)", "st_npoints(geom)").collect()(0)
    assert(road.getBoolean(0) && road.get(1) == 3)

    // Curve merges LineStringSegments, deduping the shared vertex
    val river = df.filter(col("fid") === "rv.4")
      .selectExpr("st_geometrytype(geom)", "st_npoints(geom)").collect()(0)
    assert(river.getString(0) == "LINESTRING" && river.get(1) == 4)

    // GML2 coordinates polygon (outerBoundaryIs, cs/ts defaults)
    val zone = df.filter(col("fid") === "zone.3")
      .selectExpr("st_geometrytype(geom)", "st_area(geom)").collect()(0)
    assert(zone.getString(0) == "POLYGON" && zone.getDouble(1) == 16.0)

    // MultiSurface -> MULTIPOLYGON with both members
    val park = df.filter(col("fid") === "park.9")
      .selectExpr("st_geometrytype(geom)", "st_ngeometries(geom)").collect()(0)
    assert(park.getString(0) == "MULTIPOLYGON" && park.get(1) == 2)

    // http-style srsName normalizes; absent srsName stays null
    assert(byFid("st.1").getAs[String]("srs") == "EPSG:3857")
    assert(byFid("st.2").getAs[String]("srs") == null)
    // featureMembers (plural) yielded both stations
    assert(df.filter(col("layer") === "Station").count() == 2)

    val drivers = GeoRead.drivers(spark).collect().map(_.getString(0)).toSet
    assert(drivers.contains("gml"))
    val meta = GeoRead.readMeta(spark, gmlPath)
      .selectExpr("driver_short_name").collect()(0).getString(0)
    assert(meta == "gml")
  }
}
