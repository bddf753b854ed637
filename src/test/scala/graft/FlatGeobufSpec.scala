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
    assert(meta.getString(2).contains("kind"))
  }
}
