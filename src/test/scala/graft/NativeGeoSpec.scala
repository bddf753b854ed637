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

  test("NativeDispatchRule: ST_* over native struct/array types stays columnar") {
    // same ST_* SQL names, native operands -> rewritten to arithmetic
    val df = spark.sql(
      """SELECT
         st_area(named_struct('min_x', 1.0D, 'min_y', 2.0D, 'max_x', 4.0D, 'max_y', 6.0D)) AS a,
         st_perimeter(named_struct('min_x', 1.0D, 'min_y', 2.0D, 'max_x', 4.0D, 'max_y', 6.0D)) AS p,
         st_x(named_struct('x', 3.5D, 'y', 7.0D)) AS x,
         st_xmax(named_struct('min_x', 1.0D, 'min_y', 2.0D, 'max_x', 4.0D, 'max_y', 6.0D)) AS mx,
         st_npoints(array(named_struct('x', 0.0D, 'y', 0.0D), named_struct('x', 3.0D, 'y', 4.0D))) AS np,
         st_length(array(named_struct('x', 0.0D, 'y', 0.0D), named_struct('x', 3.0D, 'y', 4.0D))) AS len,
         st_distance(named_struct('x', 0.0D, 'y', 0.0D), named_struct('x', 3.0D, 'y', 4.0D)) AS d,
         st_within(named_struct('x', 2.0D, 'y', 3.0D),
           named_struct('min_x', 1.0D, 'min_y', 2.0D, 'max_x', 4.0D, 'max_y', 6.0D)) AS w,
         st_contains(named_struct('min_x', 1.0D, 'min_y', 2.0D, 'max_x', 4.0D, 'max_y', 6.0D),
           named_struct('x', 1.0D, 'y', 3.0D)) AS cb,
         st_intersects(named_struct('min_x', 0.0D, 'min_y', 0.0D, 'max_x', 2.0D, 'max_y', 2.0D),
           named_struct('min_x', 2.0D, 'min_y', 2.0D, 'max_x', 3.0D, 'max_y', 3.0D)) AS ix""")
    val r = df.collect()(0)
    assert(r.getDouble(0) == 12.0 && r.getDouble(1) == 14.0 && r.getDouble(2) == 3.5)
    assert(r.getDouble(3) == 4.0 && r.getInt(4) == 2 && r.getDouble(5) == 5.0)
    assert(r.getDouble(6) == 5.0 && r.getBoolean(7) && !r.getBoolean(8) && r.getBoolean(9))
    // the optimized plan must not contain the JTS-backed fallback nodes
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("GeoScalar") && !opt.contains("st_geomfromwkb"), opt.take(800))

    // parity with the generic WKB tier on a column of data
    val both = spark.range(200).selectExpr(
      "st_area(named_struct('min_x', 0.0D, 'min_y', 0.0D, 'max_x', CAST(id % 7 + 1 AS DOUBLE), 'max_y', CAST(id % 5 + 1 AS DOUBLE))) AS native_a",
      "st_area(st_makeenvelope(0.0D, 0.0D, CAST(id % 7 + 1 AS DOUBLE), CAST(id % 5 + 1 AS DOUBLE))) AS wkb_a",
      "st_length(array(named_struct('x', 0.0D, 'y', 0.0D), named_struct('x', CAST(id % 9 AS DOUBLE), 'y', CAST(id % 4 AS DOUBLE)))) AS native_l",
      "st_length(st_makeline(st_point(0.0D, 0.0D), st_point(CAST(id % 9 AS DOUBLE), CAST(id % 4 AS DOUBLE)))) AS wkb_l")
    assert(both.filter($"native_a" =!= $"wkb_a" || $"native_l" =!= $"wkb_l").count() == 0)
    // null inputs stay null (generic-tier parity)
    val nulls = spark.sql(
      """SELECT st_area(CAST(NULL AS STRUCT<min_x: DOUBLE, min_y: DOUBLE, max_x: DOUBLE, max_y: DOUBLE>)) AS a,
                st_npoints(CAST(NULL AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)) AS np""").collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("native POLYGON_2D contains/area/perimeter/npoints match the JTS tier") {
    // random polygons-with-hole vs random points: every dispatch result
    // must equal st_contains over the WKB twin built from the SAME rings
    // (JTS boundary-excluded semantics = the kernel's on-edge rule)
    val df = spark.range(4000).selectExpr(
      "CAST(id % 13 AS DOUBLE) AS px", "CAST(id % 11 AS DOUBLE) AS py",
      "CAST(id % 7 + 4 AS DOUBLE) AS w", "CAST(id % 5 + 4 AS DOUBLE) AS h")
      .selectExpr("px", "py",
        // shell (0,0)-(w,0)-(w,h)-(0,h), hole (1,1)-(3,1)-(3,3)-(1,3)
        """array(
             array(named_struct('x', 0.0D, 'y', 0.0D), named_struct('x', w, 'y', 0.0D),
                   named_struct('x', w, 'y', h), named_struct('x', 0.0D, 'y', h),
                   named_struct('x', 0.0D, 'y', 0.0D)),
             array(named_struct('x', 1.0D, 'y', 1.0D), named_struct('x', 3.0D, 'y', 1.0D),
                   named_struct('x', 3.0D, 'y', 3.0D), named_struct('x', 1.0D, 'y', 3.0D),
                   named_struct('x', 1.0D, 'y', 1.0D))) AS poly""",
        """st_makepolygon(
             st_makeline(array(st_point(0.0D, 0.0D), st_point(w, 0.0D),
               st_point(w, h), st_point(0.0D, h), st_point(0.0D, 0.0D))),
             array(st_makeline(array(st_point(1.0D, 1.0D), st_point(3.0D, 1.0D),
               st_point(3.0D, 3.0D), st_point(1.0D, 3.0D), st_point(1.0D, 1.0D))))) AS wkb""")
    val cmp = df.selectExpr(
      "st_contains(poly, named_struct('x', px, 'y', py)) AS nc",
      "st_within(named_struct('x', px, 'y', py), poly) AS nw",
      "st_contains(wkb, st_point(px, py)) AS jc",
      "st_area(poly) AS na", "st_area(wkb) AS ja",
      "st_perimeter(poly) AS np", "st_perimeter(wkb) AS jp",
      "st_npoints(poly) AS nn", "st_npoints(wkb) AS jn")
    assert(cmp.filter($"nc" =!= $"jc" || $"nw" =!= $"jc").count() == 0)
    assert(cmp.filter($"na" =!= $"ja" || $"np" =!= $"jp" || $"nn" =!= $"jn").count() == 0)
    // the dispatched plan stays out of the JTS fallback
    val opt = cmp.select($"nc", $"na").queryExecution.optimizedPlan.toString
    assert(!opt.contains("GeoPredicate") && !opt.contains("GeoScalar"), opt.take(800))
    // nulls propagate
    val nr = spark.sql(
      """SELECT st_contains(CAST(NULL AS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>),
                            named_struct('x', 1.0D, 'y', 1.0D)) AS c,
                st_area(CAST(NULL AS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)) AS a""").collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("native ST_Transform overloads match the WKB tier exactly") {
    import org.apache.spark.sql.functions._
    import graft.GeoFunctions.{st_transform, st_x, st_y, st_point}
    val df = spark.range(200).select(
      (col("id").cast("double") / 3 - 30.0).as("lon"),
      (col("id").cast("double") / 5 - 20.0).as("lat"))
    val both = df.select(
      transformPoint(point2d(col("lon"), col("lat")), "EPSG:4326", "EPSG:3857").as("np"),
      st_transform(st_point(col("lon"), col("lat")),
        lit("EPSG:4326"), lit("EPSG:3857"), lit(true)).as("wg"))
    // same Crs kernel; tolerance is ULP-scale only because HotSpot may
    // intrinsify Math.tan/log differently across call sites (the same
    // reason the driver-oracle transform rows compare at round(4))
    assert(both.filter(abs(col("np.x") - st_x(col("wg"))) > 1e-6 ||
      abs(col("np.y") - st_y(col("wg"))) > 1e-6).count() == 0)
    // box corner transform + SQL registration
    val b = spark.sql(
      """SELECT st_transform_box2d(named_struct('min_x', -10.0D, 'min_y', -10.0D,
           'max_x', 10.0D, 'max_y', 10.0D), 'EPSG:4326', 'EPSG:3857') AS b,
         st_transform_point2d(named_struct('x', 10.0D, 'y', 10.0D),
           'EPSG:4326', 'EPSG:3857') AS p""").collect()(0)
    val box = b.getStruct(0); val pt = b.getStruct(1)
    assert(math.abs(box.getDouble(2) - pt.getDouble(0)) < 1e-6 &&
      math.abs(box.getDouble(3) - pt.getDouble(1)) < 1e-6)
    assert(math.abs(box.getDouble(0) + pt.getDouble(0)) < 1e-6 &&
      math.abs(box.getDouble(1) + pt.getDouble(1)) < 1e-6)
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
