package graft

import graft.GeoFunctions._
import graft.sources.{GeoPackage, GeoRead}
import org.apache.spark.sql.functions._

/** GeoPackage reader vs the committed fixture (generated once by
 *  tools/make_gpkg_fixture.py — content is deterministic, so every
 *  assertion below is closed-form). Exercises: multi-page table
 *  b-trees, interior-page parallel subtrees, overflow chains (20000-
 *  char text), NULLs, rowid-alias fid, GPB header stripping. */
class GeoPackageSpec extends SparkSpec {

  private val fixture = getClass.getResource("/sample.gpkg").getPath

  test("layer catalog from gpkg_geometry_columns") {
    val ls = GeoPackage.layers(spark, fixture)
    assert(ls.map(l => (l._1, l._2, l._3)).toSet ==
      Set(("pts", "geom", "POINT"), ("lines", "geom", "LINESTRING")))
    assert(ls.forall(_._4 == 4326L))
  }

  test("reads the pts layer: schema, aggregates, nulls, overflow row") {
    val df = GeoRead.read(spark, fixture) // first layer = pts
    assert(df.columns.toSeq == Seq("fid", "name", "value", "flag", "tag", "geom"))
    assert(df.count() == 3001)

    val agg = df.agg(
      sum("value"), sum("flag"), count("tag"), max("fid"), min("fid")).collect()(0)
    assert(agg.getDouble(0) == 2250750.0)
    assert(agg.getLong(1) == 1500L)
    assert(agg.getLong(2) == 3001 - 428)   // 428 NULL tags
    assert(agg.getLong(3) == 3001L && agg.getLong(4) == 1L)

    // overflow row: 20000-char name, NULL geometry and value
    val big = df.filter(col("fid") === 3001).collect()(0)
    assert(big.getString(1).length == 20000 && big.getString(1).forall(_ == 'x'))
    assert(big.isNullAt(2) && big.isNullAt(5))

    // geometry decodes to the constructed points through the GPB header
    val pt = df.filter(col("fid") === 123)
      .select(st_x(col("geom")), st_y(col("geom"))).collect()(0)
    assert(pt.getDouble(0) == 23.0 && pt.getDouble(1) == 1.0)
    val sums = df.filter(col("fid") <= 3000)
      .select(sum(st_x(col("geom"))), sum(st_y(col("geom")))).collect()(0)
    assert(sums.getDouble(0) == (1 to 3000).map(_ % 100).sum.toDouble)
    assert(sums.getDouble(1) == (1 to 3000).map(_ / 100).sum.toDouble)
  }

  test("reads a named layer and parallelizes over b-tree subtrees") {
    val lines = GeoPackage.read(spark, fixture, layer = "lines")
    assert(lines.count() == 10)
    assert(lines.select(sum(st_npoints(col("geom")))).collect()(0).getLong(0) == 20L)
    assert(lines.filter(col("kind") === "k1").count() == 5)

    // the 3001-row layer spans multiple leaf pages → >1 partition
    val pts = GeoPackage.read(spark, fixture)
    assert(pts.rdd.getNumPartitions > 1,
      s"expected parallel subtrees, got ${pts.rdd.getNumPartitions}")
  }

  test("st_read options: layer + spatial_filter_box (SQL table function)") {
    Graft.install(spark)
    val lines = spark.sql(s"SELECT * FROM st_read('$fixture', 'lines')")
    assert(lines.count() == 10)
    // box covering x in [0, 50.5] of the pts grid -> closed-form count:
    // points (i%100, i/100) with x <= 50 and y <= 30 (all y <= 30)
    val filtered = spark.sql(
      s"SELECT * FROM st_read('$fixture', 'pts', 0.0, 0.0, 50.5, 100.0)")
    val want = (1 to 3000).count(i => i % 100 <= 50)
    assert(filtered.count() == want)
    // fgb path goes through the index pushdown
    val fgb = "/root/reference/test/data/amsterdam_roads.fgb"
    if (new java.io.File(fgb).exists()) {
      val n = spark.sql(
        s"SELECT * FROM st_read('$fgb', 554000.0, 6858000.0, 556000.0, 6860000.0)").count()
      val brute = spark.sql(s"SELECT * FROM st_read('$fgb')")
        .filter(st_intersects(col("geom"),
          st_makeenvelope(lit(554000.0), lit(6858000.0), lit(556000.0), lit(6860000.0)))).count()
      assert(n == brute && n > 0)
    }
  }

  test("readMeta and drivers report geopackage") {
    val meta = GeoRead.readMeta(spark, fixture).collect()(0)
    assert(meta.getString(1) == "geopackage")
    val layers = meta.getSeq[org.apache.spark.sql.Row](3)
    assert(layers.nonEmpty)
    val l0 = layers.head
    assert(l0.getLong(1) > 0, "feature_count should be counted from the b-tree")
    assert(l0.getSeq[org.apache.spark.sql.Row](3).exists(_.getString(0) == "fid"))
    val gf = l0.getSeq[org.apache.spark.sql.Row](2).head
    assert(gf.getString(1).nonEmpty) // geometry type from gpkg_geometry_columns
    val crs = gf.getStruct(3)
    assert(crs.getString(2).nonEmpty, "srs code surfaced from gpkg_spatial_ref_sys")
    val drv = GeoRead.drivers(spark).filter(col("short_name") === "geopackage").collect()
    assert(drv.length == 1 && drv(0).getBoolean(2))
  }
}
