package graft

import graft.GeoFunctions._
import graft.sources.{GeoPackage, GeoPackageWrite}
import org.apache.spark.sql.functions._

/** GeoPackage writer: files roundtrip through our own reader (multi-
 *  page b-trees, overflow rows, nulls, typed attrs, GPB geometry);
 *  external-validity is additionally checked once against the real
 *  sqlite3 via tools/validate_gpkg.py (not run in CI — no python dep). */
class GeoPackageWriteSpec extends SparkSpec {
  import spark.implicits._

  test("write/read roundtrip: 3000 rows, nulls, overflow, named layer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkgw").toString
    val out = s"$dir/out.gpkg"
    val df = (1 to 3000).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"name_$i",
        i * 0.5, i % 2 == 0, if (i == 42) "x" * 20000 else "s")
    }.toDF("id", "name", "value", "even", "pad")
      .select($"id", $"name", $"value", $"even", $"pad",
        st_point(($"id" % 100).cast("double"), ($"id" % 50).cast("double")).as("geom"))
    GeoPackageWrite.write(df, "geom", out, layer = "pts_out")

    val ls = GeoPackage.layers(spark, out)
    assert(ls.map(l => (l._1, l._2, l._3)) == Seq(("pts_out", "geom", "POINT")))

    val back = GeoPackage.read(spark, out)
    assert(back.columns.toSeq == Seq("fid", "id", "name", "value", "even", "pad", "geom"))
    assert(back.count() == 3000)
    assert(back.rdd.getNumPartitions > 1, "multi-page table should split")

    val agg = back.agg(sum("value"), count("name"), sum($"fid")).collect()(0)
    assert(agg.getDouble(0) == (1 to 3000).map(_ * 0.5).sum)
    assert(agg.getLong(1) == 3000 - (3000 / 7))
    assert(agg.getLong(2) == (1 to 3000).map(_.toLong).sum)

    val big = back.filter($"id" === 42).collect()(0)
    assert(big.getAs[String]("pad").length == 20000)

    val sums = back.select(sum(st_x($"geom")), sum(st_y($"geom"))).collect()(0)
    assert(sums.getDouble(0) == (1 to 3000).map(_ % 100).sum.toDouble)
    assert(sums.getDouble(1) == (1 to 3000).map(_ % 50).sum.toDouble)

    // boolean column comes back as Long affinity (SQLite BOOLEAN) — the
    // reader maps BOOL decl to BooleanType
    assert(back.filter($"even" === true).count() == 1500)
  }

  test("GeoWrite dispatches .gpkg") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gpkgw2").toString
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "tag")
      .select($"id", $"tag", st_point($"id".cast("double"), lit(1.0)).as("geom"))
    graft.sources.GeoWrite.write(df, s"$dir/t.gpkg")
    assert(graft.sources.GeoRead.read(spark, s"$dir/t.gpkg").count() == 10)
  }
}
