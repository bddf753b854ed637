package graft

import org.apache.spark.sql.functions._

/** TopoJSON reader vs the python-built fixtures
  * (tools/make_topojson_golden.py — independent encode + accounting;
  * its golden CSV is q_src_topojson's oracle). */
class TopoJsonSpec extends SparkSpec {
  private val dir = "/root/repo/src/test/resources/topojson/"

  test("quantized topology: shared arc, reversal, stitching, transform") {
    graft.Graft.install(spark)
    val df = graft.sources.GeoRead.read(spark, dir + "quantized.topojson")
    val rows = df.selectExpr("layer", "id", "props['name'] AS name",
        "ST_GeometryType(geom) AS gt", "ST_NPoints(geom) AS np",
        "ST_IsValid(geom) AS ok")
      .orderBy("layer", "id").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("counties", "E"), ("counties", "W"), ("places", "P1"), ("places", "P2"),
      ("roads", "R1")))
    // both county rings stitch from the SHARED border arc (E reversed):
    // 5 unique vertices + the closing point, and valid rings
    assert(rows(0).getString(3) == "POLYGON" && rows(0).getInt(4) == 6 && rows(0).getBoolean(5))
    assert(rows(1).getString(3) == "POLYGON" && rows(1).getInt(4) == 6 && rows(1).getBoolean(5))
    assert(rows(2).getString(2) == "á-town") // utf8 property
    assert(rows(3).getString(3) == "MULTIPOINT")
    // the two-arc road drops the duplicated junction position
    assert(rows(4).getString(3) == "LINESTRING" && rows(4).getInt(4) == 4)
    // shared border: the counties touch along it (topology preserved)
    val touch = df.filter(col("layer") === "counties").select("id", "geom").collect()
    val e = graft.functions.Jts.read(touch.find(_.getString(0) == "E").get.getAs[Array[Byte]](1))
    val w = graft.functions.Jts.read(touch.find(_.getString(0) == "W").get.getAs[Array[Byte]](1))
    assert(e.touches(w) && e.intersection(w).getLength > 0)
  }

  test("non-quantized topology and clear errors") {
    graft.Graft.install(spark)
    val plain = graft.sources.GeoRead.read(spark, dir + "plain.topojson")
      .selectExpr("layer", "id", "ST_AsText(geom)").collect()
    assert(plain.length == 1 &&
      plain(0).getString(2) == "POLYGON ((0 0, 4 0, 2 3, 0 0))")
    val f = java.io.File.createTempFile("graft-notopo", ".topojson")
    java.nio.file.Files.writeString(f.toPath, """{"type":"FeatureCollection"}""")
    val err = intercept[IllegalArgumentException] {
      graft.sources.TopoJson.parseFile(f.getPath).toList
    }
    assert(err.getMessage.contains("not a TopoJSON file"))
    val drow = spark.sql(
      "SELECT can_open, can_create FROM st_drivers() WHERE short_name='topojson'").collect()
    assert(drow.length == 1 && drow(0).getBoolean(0) && !drow(0).getBoolean(1))
  }
}
