package graft

import graft.GeoFunctions._
import graft.sources.{GdbWrite, OpenFileGdb}
import org.apache.spark.sql.functions._

/** FileGDB writer (can_create symmetry for the OpenFileGDB reader):
 *  files roundtrip through the reader, whose own bytes were certified
 *  against the independent python spec implementation
 *  (tools/make_gdb_fixture.py golden). Coordinates quantize to the
 *  layer's xyscale grid by the FGDB scaled-integer design. */
class GdbWriteSpec extends SparkSpec {
  import spark.implicits._

  test("point layer roundtrip: attrs, nulls, multi-row, quantization-exact domain") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gdbw").toString + "/pts.gdb"
    val df = (1 to 2500).map { i =>
      (i.toLong, if (i % 11 == 0) null else s"n_$i", i * 0.25,
        (i % 100).toDouble, (i % 50).toDouble / 2.0) // /2 stays on the 1e-4 grid
    }.toDF("id", "name", "score", "px", "py")
      .select($"id", $"name", $"score", st_point($"px", $"py").as("geom"))
    GdbWrite.write(df, "geom", dir, layer = "pts")

    val back = OpenFileGdb.read(spark, dir, "pts")
    assert(back.columns.toSeq == Seq("OBJECTID", "id", "name", "score", "geom"))
    assert(back.count() == 2500)
    val agg = back.agg(sum("id"), count("name"), sum("score"),
      sum(st_x($"geom")), sum(st_y($"geom"))).collect()(0)
    assert(agg.getLong(0) == (1 to 2500).map(_.toLong).sum)
    assert(agg.getLong(1) == 2500 - (2500 / 11))
    assert(agg.getDouble(2) == (1 to 2500).map(_ * 0.25).sum)
    assert(agg.getDouble(3) == (1 to 2500).map(i => (i % 100).toDouble).sum)
    assert(agg.getDouble(4) == (1 to 2500).map(i => (i % 50).toDouble / 2.0).sum)
    // OBJECTID is the implicit 1-based rowid
    assert(back.agg(sum($"OBJECTID".cast("long"))).collect()(0).getLong(0) ==
      (1L to 2500L).sum)
  }

  test("polygon-with-hole and multilinestring layers roundtrip") {
    val base = java.nio.file.Files.createTempDirectory("graft-gdbw2").toString
    val polys = Seq(
      (1L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
      (2L, "MULTIPOLYGON (((20 20, 30 20, 30 30, 20 30, 20 20)), ((40 40, 45 40, 45 45, 40 45, 40 40)))"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val pDir = s"$base/polys.gdb"
    GdbWrite.write(polys, "geom", pDir, layer = "parcels")
    val backP = OpenFileGdb.read(spark, pDir, "parcels")
      .select($"id", st_area($"geom").as("a"), st_npoints($"geom").as("n"),
        st_geometrytype($"geom").as("t")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1), r.getAs[Number](2).intValue, r.getString(3)))
      .sortBy(_._1)
    assert(backP(0) == ((1L, 96.0, 10, "POLYGON")), backP(0).toString)
    assert(backP(1)._2 == 125.0 && backP(1)._4 == "MULTIPOLYGON", backP(1).toString)

    val mls = Seq(
      (1L, "LINESTRING (0 0, 5 0, 5 5)"),
      (2L, "MULTILINESTRING ((1 1, 2 2), (3 3, 4 4, 5 5))"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val lDir = s"$base/roads.gdb"
    GdbWrite.write(mls, "geom", lDir, layer = "roads")
    val backL = OpenFileGdb.read(spark, lDir, "roads")
      .select($"id", st_length($"geom").as("len"), st_npoints($"geom").as("n")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1), r.getAs[Number](2).intValue)).sortBy(_._1)
    assert(backL(0) == ((1L, 10.0, 3)), backL(0).toString)
    assert(math.abs(backL(1)._2 - 3 * math.sqrt(2.0)) < 1e-9 &&
      backL(1)._3 == 5, backL(1).toString)
  }

  test("GeoWrite dispatches .gdb; st_read opens the result; negative coords survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gdbw3").toString + "/t.gdb"
    val df = (1 to 20).map(i => (i.toLong, -100.0 + i, -50.0 + i * 0.5))
      .toDF("id", "x", "y").select($"id", st_point($"x", $"y").as("geom"))
    graft.sources.GeoWrite.write(df, dir)
    val back = graft.sources.GeoRead.read(spark, dir)
    assert(back.count() == 20)
    val r = back.orderBy("id").select(st_x($"geom"), st_y($"geom")).collect()
    (1 to 20).foreach { i =>
      assert(r(i - 1).getDouble(0) == -100.0 + i && r(i - 1).getDouble(1) == -50.0 + i * 0.5,
        r(i - 1).toString)
    }
    // a zipped .gdb directory reads through the archive path (GDAL
    // /vsizip parity): zip the directory we just wrote, read the zip
    val zip = dir.stripSuffix(".gdb") + "_z.zip"
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zip))
    try {
      new java.io.File(dir).listFiles().foreach { f =>
        zout.putNextEntry(new java.util.zip.ZipEntry("t.gdb/" + f.getName))
        java.nio.file.Files.copy(f.toPath, zout)
        zout.closeEntry()
      }
    } finally zout.close()
    assert(graft.sources.GeoRead.read(spark, zip).count() == 20)
    assert(graft.sources.GeoRead.read(spark, s"$zip/t.gdb").count() == 20)

    // mixed geometry classes are refused
    val bad = Seq((1L, "POINT (1 2)"), (2L, "LINESTRING (0 0, 1 1)"))
      .toDF("id", "wkt").select($"id", st_geomfromtext($"wkt").as("geom"))
    val e = intercept[Exception] {
      GdbWrite.write(bad, "geom", java.nio.file.Files.createTempDirectory("graft-gdbw4").toString + "/b.gdb")
    }
    assert(e.getMessage.contains("mixes geometry classes"), e.getMessage)
  }
}
