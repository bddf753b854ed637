package graft

import graft.GeoFunctions._
import graft.sources.{GeoPackageWrite, Spatialite}
import org.apache.spark.sql.functions._

/** SpatiaLite writer (can_create symmetry for the Gaia reader): files
 *  roundtrip through our own reader AND through python's stdlib
 *  sqlite3 — a genuinely independent SQLite implementation — which
 *  re-accounts rows, attribute sums, and the raw Gaia blob framing. */
class SpatialiteWriteSpec extends SparkSpec {
  import spark.implicits._

  test("write/read roundtrip: points, nulls, overflow, multi-page") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slw").toString
    val out = s"$dir/out.sqlite"
    val df = (1 to 3000).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"name_$i",
        i * 0.5, if (i == 42) "x" * 20000 else "s")
    }.toDF("id", "name", "value", "pad")
      .select($"id", $"name", $"value", $"pad",
        st_point(($"id" % 100).cast("double"), ($"id" % 50).cast("double")).as("geom"))
    GeoPackageWrite.writeSpatialite(df, "geom", out, layer = "pts_out", srid = 4326)

    val ls = Spatialite.layers(spark, out)
    assert(ls == Seq(("pts_out", "geom", 1, 4326)))

    val back = Spatialite.read(spark, out)
    assert(back.columns.toSeq == Seq("pk", "id", "name", "value", "pad", "geom"))
    assert(back.count() == 3000)
    assert(back.rdd.getNumPartitions > 1, "multi-page table should split")
    val agg = back.agg(sum("value"), count("name"),
      sum(st_x($"geom")), sum(st_y($"geom"))).collect()(0)
    assert(agg.getDouble(0) == (1 to 3000).map(_ * 0.5).sum)
    assert(agg.getLong(1) == 3000 - (3000 / 7))
    assert(agg.getDouble(2) == (1 to 3000).map(_ % 100).sum.toDouble)
    assert(agg.getDouble(3) == (1 to 3000).map(_ % 50).sum.toDouble)
    assert(back.filter($"id" === 42).collect()(0).getAs[String]("pad").length == 20000)
  }

  test("polygons and multilinestrings survive the Gaia encode/decode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slw2").toString
    val polys = (1 to 50).map { i =>
      (i.toLong, s"POLYGON ((0 0, ${i % 9 + 1} 0, ${i % 9 + 1} ${i % 7 + 1}, 0 ${i % 7 + 1}, 0 0), " +
        s"(0.2 0.2, 0.4 0.2, 0.4 0.4, 0.2 0.4, 0.2 0.2))")
    }.toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val outP = s"$dir/p.sqlite"
    GeoPackageWrite.writeSpatialite(polys, "geom", outP, layer = "polys", srid = 3857)
    assert(Spatialite.layers(spark, outP) == Seq(("polys", "geom", 3, 3857)))
    val backP = Spatialite.read(spark, outP)
      .select($"id", st_area($"geom").as("a"), st_npoints($"geom").as("n"))
    val expect = (1 to 50).map(i => (i.toLong, (i % 9 + 1).toDouble * (i % 7 + 1) - 0.04, 10L))
    assert(backP.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getAs[Number](2).longValue)).sortBy(_._1)
      .sameElements(expect))

    val mls = Seq(
      (1L, "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))"),
      (2L, "MULTILINESTRING ((5 5, 6 6))"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val outM = s"$dir/m.sqlite"
    GeoPackageWrite.writeSpatialite(mls, "geom", outM, layer = "mls")
    val backM = Spatialite.read(spark, outM)
      .select($"id", st_astext($"geom").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(backM(0)._2 == "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))")
    assert(backM(1)._2 == "MULTILINESTRING ((5 5, 6 6))")
  }

  test("multipoints and geometry collections survive the Gaia encode/decode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slw5").toString
    val mps = Seq((1L, "MULTIPOINT ((1 2), (3 4), (5 6))"), (2L, "MULTIPOINT ((7 8))"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val outMp = s"$dir/mp.sqlite"
    GeoPackageWrite.writeSpatialite(mps, "geom", outMp, layer = "mps")
    assert(Spatialite.layers(spark, outMp) == Seq(("mps", "geom", 4, 4326)))
    val backMp = Spatialite.read(spark, outMp)
      .select($"id", st_astext($"geom").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(backMp(0)._2 == "MULTIPOINT (1 2, 3 4, 5 6)")
    assert(backMp(1)._2 == "MULTIPOINT (7 8)")

    val gcs = Seq(
      (1L, "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))"),
      (2L, "GEOMETRYCOLLECTION (MULTIPOINT ((3 4), (5 6)))"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val outGc = s"$dir/gc.sqlite"
    GeoPackageWrite.writeSpatialite(gcs, "geom", outGc, layer = "gcs", srid = 0)
    assert(Spatialite.layers(spark, outGc) == Seq(("gcs", "geom", 7, 0)))
    val backGc = Spatialite.read(spark, outGc)
      .select($"id", st_astext($"geom").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(backGc(0)._2 ==
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))")
    assert(backGc(1)._2 == "GEOMETRYCOLLECTION (MULTIPOINT (3 4, 5 6))")
  }

  test("a mixed-class row fails loudly instead of writing a wrong declaration") {
    val df = Seq((1L, "POINT (1 2)"), (2L, "LINESTRING (0 0, 1 1)"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val dir = java.nio.file.Files.createTempDirectory("graft-slw3").toString
    val e = intercept[Exception] {
      GeoPackageWrite.writeSpatialite(df, "geom", s"$dir/bad.sqlite")
    }
    assert(e.getMessage.contains("declared POINT"), e.getMessage)
  }

  test("python stdlib sqlite3 independently reads the file and the Gaia framing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slw4").toString
    val out = s"$dir/chk.sqlite"
    val df = (1 to 500).map(i => (i.toLong, i * 2.0))
      .toDF("id", "v")
      .select($"id", $"v",
        st_point(($"id" % 10).cast("double"), ($"id" % 5).cast("double")).as("geom"))
    GeoPackageWrite.writeSpatialite(df, "geom", out, layer = "chk", srid = 4326)
    val py =
      """
import sqlite3, struct, sys
con = sqlite3.connect(sys.argv[1])
cur = con.cursor()
rows = cur.execute('SELECT f_table_name, f_geometry_column, geometry_type, srid FROM geometry_columns').fetchall()
assert rows == [('chk', 'geom', 1, 4326)], rows
n, sid, sv = cur.execute('SELECT count(*), sum(id), sum(v) FROM chk').fetchone()
assert n == 500 and sid == 125250 and sv == 250500.0, (n, sid, sv)
bad = 0
for pk, blob in cur.execute('SELECT pk, geom FROM chk'):
    if blob[0] != 0x00 or blob[1] != 0x01 or blob[-1] != 0xFE: bad += 1; continue
    srid, minx, miny, maxx, maxy = struct.unpack('<idddd', blob[2:38])
    cls, = struct.unpack('<i', blob[39:43])
    x, y = struct.unpack('<dd', blob[43:59])
    if srid != 4326 or cls != 1 or blob[38] != 0x7C: bad += 1
    if (x, y) != (minx, miny) or (x, y) != (maxx, maxy): bad += 1
    if x != pk % 10 or y != pk % 5: bad += 1
print('SLOK', 0 if bad else 1)
"""
    val pf = java.io.File.createTempFile("slcheck", ".py")
    pf.deleteOnExit()
    java.nio.file.Files.write(pf.toPath, py.getBytes("UTF-8"))
    val o = scala.sys.process.Process(Seq("python3", pf.getAbsolutePath, out)).!!
    assert(o.contains("SLOK 1"), o)
  }
}
