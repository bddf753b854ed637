package graft

import graft.functions.NativeGeo._
import graft.GeoFunctions._
import org.apache.spark.sql.functions._

/** Native struct-tier ops must agree with the GEOMETRY (JTS) tier —
 *  the reference's layout-benchmark premise (same results, columnar
 *  layout is just faster). */
class NativeGeoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pts = (0 until 500).map(i => (i.toLong, (i % 50) * 1.7, (i % 37) * 2.3))
    .toDF("id", "x", "y")

  test("native box ops agree with JTS tier") {
    val df = pts.withColumn("box", box2d($"x", $"y", $"x" + 5.0, $"y" + 3.0))
      .withColumn("g", boxToGeometry($"box"))
    val bad = df.filter(
      abs(boxArea($"box") - st_area($"g")) > 1e-9 ||
      abs(boxPerimeter($"box") - st_perimeter($"g")) > 1e-9 ||
      abs(boxCentroid($"box")("x") - st_x(st_centroid($"g"))) > 1e-9).count()
    assert(bad == 0)
  }

  test("native point-in-box and intersects agree with JTS predicates") {
    val df = pts.withColumn("pt", point2d($"x", $"y"))
      .withColumn("box", box2d(lit(10.0), lit(10.0), lit(60.0), lit(50.0)))
      .withColumn("nat", boxContainsPoint($"box", $"pt"))
      .withColumn("jts", st_within(toGeometry($"pt"), boxToGeometry($"box")))
    assert(df.filter($"nat" =!= $"jts").count() == 0)
    assert(df.filter($"nat").count() > 0)
    val boxes = pts.withColumn("a", box2d($"x", $"y", $"x" + 10.0, $"y" + 10.0))
      .withColumn("b", box2d(lit(20.0), lit(20.0), lit(40.0), lit(40.0)))
      .withColumn("nat", boxIntersects($"a", $"b"))
      .withColumn("jts", st_intersects(boxToGeometry($"a"), boxToGeometry($"b")))
    assert(boxes.filter($"nat" =!= $"jts").count() == 0)
  }

  test("native line length + ring area agree with JTS") {
    val df = pts.limit(100)
      .withColumn("xs", array($"x", $"x" + 3.0, $"x" + 3.0))
      .withColumn("ys", array($"y", $"y", $"y" + 4.0))
      .withColumn("line", linestring2d($"xs", $"ys"))
    val lens = df.select(lineLength($"line").as("n"),
      st_length(st_makeline(st_point($"xs"(0), $"ys"(0)), st_point($"xs"(1), $"ys"(1)))) .as("seg1"))
      .collect()
    lens.foreach(r => assert(math.abs(r.getDouble(0) - 7.0) < 1e-9, r.toString))
    // shoelace on a unit square ring
    val ring = Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))).toDF("cs")
      .select(expr("transform(cs, c -> named_struct('x', c._1, 'y', c._2))").as("ring"))
    assert(math.abs(ring.select(ringArea($"ring")).as[Double].collect()(0) - 1.0) < 1e-12)
  }

  test("codegen hilbert equals interpreted hilbert and stays in codegen") {
    val df = pts.withColumn("pt", point2d($"x", $"y"))
      .withColumn("h_native", hilbert($"pt", 0, 0, 100, 100))
      .withColumn("h_interp", st("st_hilbert", $"x", $"y", lit(0.0), lit(0.0), lit(100.0), lit(100.0)))
    assert(df.filter($"h_native" =!= $"h_interp").count() == 0)
    // plan shape: the native hilbert projection is inside WholeStageCodegen
    // (use spark.range — a local Seq collapses to LocalTableScan)
    val ranged = spark.range(1000)
      .withColumn("pt", point2d($"id".cast("double"), $"id".cast("double") * 2))
      .select(hilbert($"pt", 0, 0, 2000, 2000).as("h"))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project [st_hilbert"), plan.take(500))
    assert(ranged.count() == 1000)
  }
}
