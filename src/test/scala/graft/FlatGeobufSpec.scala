package graft

import graft.GeoFunctions._
import graft.sources.{FlatGeobuf, GeoRead}
import org.apache.spark.sql.functions._

/** Validated against the reference's own FlatGeobuf fixture and test
  * assertions (test/sql/gdal/gdal_read.test:4-6 — 870 motorways;
  * st_read_order.test:5-8 — first feature kind + exact WKT). */
class FlatGeobufSpec extends SparkSpec {

  private val fixture = "/root/reference/test/data/amsterdam_roads.fgb"
  private def available = new java.io.File(fixture).exists()

  test("reads the reference .fgb fixture with the reference's results") {
    assume(available, s"fixture $fixture not present")
    val df = GeoRead.read(spark, fixture)
    assert(df.columns.toSeq == Seq("kind", "geom"))
    assert(df.count() == 21648)
    assert(df.filter(col("kind") === "motorway").count() == 870)
    // first stored feature, exact WKT parity with reference st_read
    val first = df.select(st_astext(col("geom"))).limit(1).collect()(0).getString(0)
    assert(first ==
      "LINESTRING (554203.4169973677 6859025.689313544, 554196.0031192809 6859038.14744868)")
  }

  test("fgb scan splits across partitions via the spatial index") {
    assume(available)
    val df = FlatGeobuf.read(spark, fixture, numPartitions = 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 21648)
    // split boundaries must not drop or duplicate features
    val single = FlatGeobuf.read(spark, fixture, numPartitions = 1)
    assert(single.rdd.getNumPartitions == 1)
    val a = df.select(sum(st_npoints(col("geom")))).collect()(0).getLong(0)
    val b = single.select(sum(st_npoints(col("geom")))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("fgb metadata via readMeta") {
    assume(available)
    val meta = GeoRead.readMeta(spark, fixture).collect()(0)
    assert(meta.getString(1) == "flatgeobuf")
    val l0 = meta.getSeq[org.apache.spark.sql.Row](3).head
    assert(l0.getLong(1) > 0) // features_count from the header
    assert(l0.getSeq[org.apache.spark.sql.Row](3).exists(_.getString(0) == "kind"))
    assert(l0.getSeq[org.apache.spark.sql.Row](2).head.getString(1).nonEmpty)
  }

  test("bbox pushdown prunes bytes via the packed index and stays exact") {
    assume(available)
    val box = (554000.0, 6858000.0, 556000.0, 6860000.0)
    val (pruned, full) = FlatGeobuf.prunedBytes(spark, fixture, box)
    assert(pruned < full / 2, s"index pruned only $pruned of $full bytes")

    val env = st_makeenvelope(lit(box._1), lit(box._2), lit(box._3), lit(box._4))
    val exactFull = FlatGeobuf.read(spark, fixture)
      .filter(st_intersects(col("geom"), env)).count()
    val prunedDf = FlatGeobuf.read(spark, fixture, bbox = Some(box))
    // candidates (stored bbox hit) are a superset of the exact matches...
    assert(prunedDf.count() >= exactFull)
    // ...and the residual exact filter recovers precisely the full answer
    assert(prunedDf.filter(st_intersects(col("geom"), env)).count() == exactFull)
    assert(exactFull > 0, "fixture box should match features")
  }

  test("spatial_filter geometry: envelope pushed down, exact residual applied") {
    assume(available)
    // a triangle over central Amsterdam (fixture is EPSG:3857 meters)
    val wkt = "POLYGON ((544000 6865000, 556000 6865000, 550000 6872000, 544000 6865000))"
    val tri = graft.functions.Jts.fromWkt(wkt)
    val filtered = GeoRead.read(spark, fixture,
      GeoRead.ReadOptions(spatialFilter = Some(graft.functions.Jts.write(tri))))
    val full = GeoRead.read(spark, fixture)
    val expected = full.filter(st_intersects(col("geom"), st_geomfromtext(lit(wkt))))
    val n = filtered.count()
    assert(n > 0 && n < full.count())
    assert(n == expected.count())
    // SQL arity: st_read(path, 'WKT') routes the string to spatial_filter
    val viaSql = spark.sql(s"SELECT count(*) AS n FROM st_read('$fixture', '$wkt')")
      .collect()(0).getLong(0)
    assert(viaSql == n)
    // ...while a non-WKT string still means layer selection (no layers in
    // fgb -> unchanged scan), keeping the two one-string forms distinct
    val asLayer = spark.sql(s"SELECT count(*) FROM st_read('$fixture', 'roads')")
      .collect()(0).getLong(0)
    assert(asLayer == full.count())
  }

  test("fgb write/read roundtrip: mixed types, props, nulls") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fgb-w").toString
    val out = s"$dir/mixed.fgb"
    val wkts = Seq(
      (1L, "a", Some(1.5), "POINT (1 2)"),
      (2L, null.asInstanceOf[String], Some(2.5), "LINESTRING (0 0, 1 1, 2 0)"),
      (3L, "c", None, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
      (4L, "d", Some(4.0), "MULTIPOINT ((1 1), (2 2))"),
      (5L, "e", Some(5.0), "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"),
      (6L, "f", Some(6.0), "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"),
      (7L, "g", Some(7.0), "GEOMETRYCOLLECTION (POINT (9 9), LINESTRING (0 0, 1 1))"))
    val df = wkts.toDF("id", "tag", "score", "wkt")
      .select($"id", $"tag", $"score".cast("double").as("score"),
        st_geomfromtext($"wkt").as("geom"))
    FlatGeobuf.write(df, "geom", out)

    val back = GeoRead.read(spark, out)
    assert(back.columns.toSeq == Seq("id", "tag", "score", "geom"))
    val got = back.select($"id", $"tag", $"score", st_astext($"geom").as("wkt"))
      .as[(Long, String, Option[Double], String)].collect().toSet
    val want = df.select($"id", $"tag", $"score", st_astext($"geom").as("wkt"))
      .as[(Long, String, Option[Double], String)].collect().toSet
    assert(got == want)
  }

  test("writeIndexed emits a packed R-tree our reader splits and prunes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fgb-idx").toString
    val out = s"$dir/pts.fgb"
    val df = (0 until 5000).map(i => (i.toLong, (i % 141).toDouble * 0.71, (i % 89).toDouble * 1.12))
      .toDF("id", "x", "y")
      .select($"id", st_point($"x", $"y").as("geom"))
    FlatGeobuf.writeIndexed(df, "geom", out)

    // splits via the index
    val split = FlatGeobuf.read(spark, out, numPartitions = 4)
    assert(split.rdd.getNumPartitions == 4)
    assert(split.count() == 5000)
    assert(split.select(sum($"id")).collect()(0).getLong(0) == (0 until 5000).map(_.toLong).sum)

    // bbox pushdown prunes bytes and stays exact under the residual filter
    val box = (5.0, 5.0, 20.0, 20.0)
    val (pruned, full) = FlatGeobuf.prunedBytes(spark, out, box)
    assert(pruned < full / 2, s"index pruned only $pruned of $full bytes")
    val env = st_makeenvelope(lit(box._1), lit(box._2), lit(box._3), lit(box._4))
    val brute = df.filter(st_intersects($"geom", env)).count()
    val prunedDf = FlatGeobuf.read(spark, out, bbox = Some(box))
    assert(prunedDf.filter(st_intersects($"geom", env)).count() == brute && brute > 0)
  }

  test("flattened single-polygon MultiPolygon (no parts vector) decodes non-EMPTY") {
    // GDAL/C++/TS writers flatten a 1-part MultiPolygon to bare xy/ends
    val simple = FlatGeobuf.decodeFlattenedSinglePart(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)))")
    assert(simple.getGeometryType == "MultiPolygon" && !simple.isEmpty)
    assert(simple.getArea == 16.0)
    val holed = FlatGeobuf.decodeFlattenedSinglePart(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)))")
    assert(holed.getArea == 15.0)
    val mls = FlatGeobuf.decodeFlattenedSinglePart(
      "MULTILINESTRING ((0 0, 3 4))")
    assert(mls.getGeometryType == "MultiLineString" && mls.getLength == 5.0)
  }

  test("fgb writer roundtrips the reference fixture exactly") {
    assume(available)
    val dir = java.nio.file.Files.createTempDirectory("graft-fgb-rt").toString
    val out = s"$dir/roads.fgb"
    val src = FlatGeobuf.read(spark, fixture)
    FlatGeobuf.write(src, "geom", out)
    val back = GeoRead.read(spark, out)
    assert(back.count() == 21648)
    val a = src.select(sum(st_npoints(col("geom"))), sum(length(col("kind")))).collect()(0)
    val b = back.select(sum(st_npoints(col("geom"))), sum(length(col("kind")))).collect()(0)
    assert(a == b)
  }
}
