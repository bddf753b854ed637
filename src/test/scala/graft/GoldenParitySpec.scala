package graft

/**
 * Additional golden-value parity cases mirrored 1:1 from the reference
 * sqllogictests (test/sql/geometry and test/sql/geos suites).
 * WKT output format matches the reference writer (st_astext.cpp):
 * `MULTIPOINT (1 2, 3 4)` without per-point parens, `POINT Z (…)`
 * with a space after the dimension tag, fixed-15 numbers.
 */
class GoldenParitySpec extends SparkSpec {

  test("st_dump paths (st_dump.test)") {
    val rows = spark.sql(
      """SELECT ST_AsText(d.geom) AS wkt, d.path FROM (
           SELECT explode(ST_Dump(ST_GeomFromText(
             'GEOMETRYCOLLECTION (POINT (1 1), POINT (2 2), GEOMETRYCOLLECTION(POINT (3 3)))'))) AS d)""")
      .collect().map(r => (r.getString(0), r.getSeq[Int](1).toList))
    assert(rows.toList == List(
      ("POINT (1 1)", List(1)), ("POINT (2 2)", List(2)), ("POINT (3 3)", List(3, 1))))
    // out-of-order nesting
    val rows2 = spark.sql(
      """SELECT d.path FROM (
           SELECT explode(ST_Dump(ST_GeomFromText(
             'GEOMETRYCOLLECTION (POINT (1 1), GEOMETRYCOLLECTION(POINT (3 3)), POINT (2 2))'))) AS d)""")
      .collect().map(_.getSeq[Int](0).toList)
    assert(rows2.toList == List(List(1), List(2, 1), List(3)))
    // empty collection → empty array
    assert(spark.sql("SELECT size(ST_Dump(ST_GeomFromText('GEOMETRYCOLLECTION EMPTY')))")
      .collect()(0).getInt(0) == 0)
  }

  test("st_centroid golden values (st_centroid.test semantics)") {
    assertSql("ST_AsText(ST_Centroid(ST_GeomFromText('LINESTRING(0 0, 10 0)')))", "POINT (5 0)")
    assertSql("ST_AsText(ST_Centroid(ST_GeomFromText('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))')))", "POINT (2 2)")
    assertSql("ST_AsText(ST_Centroid(ST_GeomFromText('MULTIPOINT(0 0, 2 0, 2 2, 0 2)')))", "POINT (1 1)")
  }

  test("st_makepolygon with holes (st_makepolygon.test semantics)") {
    assertSql(
      "ST_Area(ST_MakePolygon(ST_GeomFromText('LINESTRING(0 0, 1 0, 1 1, 0 1, 0 0)'), " +
        "array(ST_GeomFromText('LINESTRING(0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2)'))))",
      0.64)
    // shell must be a linestring
    val e = intercept[Exception] {
      sql1("ST_MakePolygon(ST_Point(0, 0))")
    }
    assert(e.getMessage.contains("LINESTRING") || e.getCause != null)
  }

  test("st_exteriorring / interior rings (st_exteriorring.test)") {
    assertSql(
      "ST_AsText(ST_ExteriorRing(ST_GeomFromText('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))')))",
      "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)")
    assertSql("ST_NInteriorRings(ST_GeomFromText('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))'))", 1)
    assertSql(
      "ST_AsText(ST_InteriorRingN(ST_GeomFromText('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))'), 1))",
      "LINESTRING (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2)")
  }

  test("Z/M handling (st_has.test, geometry_types.test semantics)") {
    assertSql("ST_ZMFlag(ST_Point(1, 2))", 0)
    assertSql("ST_ZMFlag(ST_GeomFromText('POINT Z (1 2 3)'))", 2)
    assertSql("ST_ZMFlag(ST_GeomFromText('POINT M (1 2 3)'))", 1)
    assertSql("ST_ZMFlag(ST_GeomFromText('POINT ZM (1 2 3 4)'))", 3)
    assertSql("ST_M(ST_GeomFromText('POINT M (1 2 3)'))", 3.0)
    assertSql("ST_ZMin(ST_GeomFromText('LINESTRING Z (0 0 5, 1 1 9)'))", 5.0)
    assertSql("ST_ZMax(ST_GeomFromText('LINESTRING Z (0 0 5, 1 1 9)'))", 9.0)
    assertSql("ST_MMin(ST_GeomFromText('POINT M (1 2 3)'))", 3.0)
    // force2d drops Z
    assertSql("ST_HasZ(ST_Force2D(ST_GeomFromText('POINT Z (1 2 3)')))", false)
    assertSql("ST_Z(ST_Force3DZ(ST_Point(1, 2), 7.0))", 7.0)
  }

  test("distance_sphere golden (st_distance_sphere.test semantics: R=6371000)") {
    // one degree of longitude at the equator on the 6371 km sphere
    assertSqlApprox("ST_Distance_Sphere(ST_Point(0, 0), ST_Point(1, 0))",
      6371000.0 * math.Pi / 180.0, 1e-6)
    assertSql("ST_Distance_Sphere(ST_Point(5, 5), ST_Point(5, 5))", 0.0)
  }

  test("collection extract dims (st_collectionextract.test semantics)") {
    val gc = "ST_GeomFromText('GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1), POLYGON((0 0, 1 0, 1 1, 0 1, 0 0)))')"
    assertSql(s"ST_AsText(ST_CollectionExtract($gc, 2))", "MULTILINESTRING ((0 0, 1 1))")
    assertSql(s"ST_GeometryType(ST_CollectionExtract($gc, 3))", "MULTIPOLYGON")
    // default: highest dimension
    assertSql(s"ST_GeometryType(ST_CollectionExtract($gc))", "MULTIPOLYGON")
  }

  test("envelope and extent round out (st_extent.test, st_makeenvelope.test)") {
    // ring orientation: JTS emits the envelope clockwise; DuckDB CCW —
    // same polygon, formatting-level difference
    assertSql("ST_AsText(ST_Envelope(ST_GeomFromText('LINESTRING(1 3, 4 0)')))",
      "POLYGON ((1 0, 1 3, 4 3, 4 0, 1 0))")
    val r = spark.sql("SELECT ST_Extent(ST_GeomFromText('LINESTRING(1 3, 4 0)')) AS e")
      .selectExpr("e.min_x", "e.min_y", "e.max_x", "e.max_y").collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) == ((1.0, 0.0, 4.0, 3.0)))
  }

  test("buffer styles produce expected shapes") {
    // flat cap on a line: area ≈ 2*d*len (no end caps)
    assertSqlApprox(
      "ST_Area(ST_Buffer(ST_GeomFromText('LINESTRING(0 0, 10 0)'), 1.0, 8, 'CAP_FLAT'))",
      20.0, 0.1)
    // round cap adds ~pi*d^2
    assertSqlApprox(
      "ST_Area(ST_Buffer(ST_GeomFromText('LINESTRING(0 0, 10 0)'), 1.0, 16, 'CAP_ROUND'))",
      20.0 + math.Pi, 0.1)
  }

  test("svg + hexwkb formats (st_assvg.test, st_ashexwkb.test semantics)") {
    assertSql("ST_AsSVG(ST_GeomFromText('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'))",
      "M 0 0 L 1 0 1 -1 0 -1 Z")
    val hex = sql1("ST_AsHEXWKB(ST_Point(0, 0))").toString
    assert(hex.matches("[0-9A-F]+") && hex.length == 42)
  }

  test("aliases registered (docs/functions.md)") {
    assertSql("ST_NumPoints(ST_GeomFromText('LINESTRING(0 0, 1 1)'))", 2)
    assertSql("ST_NumGeometries(ST_GeomFromText('MULTIPOINT(0 0, 1 1)'))", 2)
    assertSql("ST_NumInteriorRings(ST_MakeEnvelope(0, 0, 1, 1))", 0)
  }

  test("covers/contains boundary semantics (geos predicates.test, from GEOS unit tests)") {
    // boundaries touch: covers but polygons don't contain their boundary
    assertSql(
      "ST_Covers(ST_GeomFromText('POLYGON ((0 0, 0 100, 100 100, 100 0, 0 0))'), " +
        "ST_GeomFromText('POLYGON ((0 0, 0 100, 90 90, 90 0, 0 0))'))", true)
    val a = "ST_GeomFromText('POLYGON ((0 0, 0 100, 100 100, 100 0, 0 0))')"
    val line = "ST_GeomFromText('LINESTRING (0 0, 0 100)')"
    assertSql(s"ST_Covers($a, $line) AND ST_CoveredBy($line, $a) AND NOT ST_Contains($a, $line)", true)
    // line covers boundary point but doesn't contain it; contains interior point
    val l = "ST_GeomFromText('LINESTRING (0 0, 0 100)')"
    assertSql(s"ST_Covers($l, ST_Point(0, 0)) AND NOT ST_Contains($l, ST_Point(0, 0))", true)
    assertSql(s"ST_Covers($l, ST_Point(0, 2)) AND ST_Contains($l, ST_Point(0, 2))", true)
    // GEOS ticket 580: point-in-polygon near the ring at full double precision
    val p580 = "ST_GeomFromText('POLYGON ((-1.183864 52.951915, -1.183862 52.951903, -1.183890 52.951900, -1.183924 52.951897, -1.183958 52.951894, -1.183954 52.951880, -1.183954 52.951878, -1.183932 52.951841, -1.183904 52.951844, -1.183870 52.951847, -1.183832 52.951852, -1.183824 52.951838, -1.183820 52.951830, -1.183870 52.951819, -1.183886 52.951815, -1.183890 52.951819, -1.183929 52.951810, -1.183909 52.951776, -1.183861 52.951787, -1.183853 52.951788, -1.183842 52.951770, -1.183970 52.951742, -1.183983 52.951763, -1.183963 52.951768, -1.183975 52.951788, -1.183994 52.951785, -1.184009 52.951807, -1.184002 52.951808, -1.184009 52.951835, -1.183990 52.951836, -1.183990 52.951836, -1.183990 52.951838, -1.184001 52.951880, -1.184018 52.951954, -1.184020 52.951956, -1.183998 52.951957, -1.183998 52.951956, -1.183996 52.951948, -1.183970 52.951906, -1.183936 52.951909, -1.183864 52.951915))')"
    val pt580 = "ST_GeomFromText('POINT (-1.183972 52.951871)')"
    assertSql(s"ST_Covers($p580, $pt580) AND ST_CoveredBy($pt580, $p580) AND ST_Contains($p580, $pt580)", true)
    // centroid goldens from the same GEOS unit-test suite (centroid.test)
    assertSql("ST_AsText(ST_Centroid(ST_GeomFromText('LINESTRING(100 100, 200 200)')))", "POINT (150 150)")
    assertSql("ST_AsText(ST_Centroid(ST_GeomFromText('POLYGON((0 0, 100 0, 100 100, 0 100, 0 0))')))", "POINT (50 50)")
    assertSql("ST_AsText(ST_Centroid(ST_GeomFromText('POLYGON EMPTY')))", "POINT EMPTY")
  }

  test("st_normalize + st_reverse golden (geos normalize.test/st_reverse.test semantics)") {
    assertSql("ST_AsText(ST_Normalize(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))",
      "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")
    assertSql("ST_AsText(ST_Reverse(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))",
      "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")
  }

  test("st_removerepeatedpoints golden (st_removerepeatedlines.test, all cases)") {
    def rrp(wkt: String, tol: String = "") =
      s"ST_AsText(ST_RemoveRepeatedPoints(ST_GeomFromText('$wkt')$tol))"
    // PostGIS behavior: degenerate line keeps start+end
    assertSql(rrp("LINESTRING (1 1, 1 1, 1 1, 1 1)"), "LINESTRING (1 1, 1 1)")
    assertSql(rrp("LINESTRING (1 1, 2 2, 2 2, 3 3)"), "LINESTRING (1 1, 2 2, 3 3)")
    assertSql(rrp("LINESTRING (1 1, 2 2, 2 2, 2 2, 4 4, 4 4, 3 3)"),
      "LINESTRING (1 1, 2 2, 4 4, 3 3)")
    assertSql(rrp("LINESTRING (1 1, 1 1, 2 2, 3 3)"), "LINESTRING (1 1, 2 2, 3 3)")
    assertSql(rrp("LINESTRING (1 1, 2 2, 3 3, 3 3)"), "LINESTRING (1 1, 2 2, 3 3)")
    // tolerance: endpoint survives (replaces the last kept when in range)
    assertSql(rrp("LINESTRING (2 2, 1 1, 5 5, 1 1, 0 0, 0 0)", ", 2"),
      "LINESTRING (2 2, 5 5, 0 0)")
    assertSql(rrp("LINESTRING (0 0, 0 0, 1 1, 5 5, 1 1, 2 2)", ", 2"),
      "LINESTRING (0 0, 5 5, 2 2)")
    assertSql(rrp("LINESTRING (0 0, 0.5 0, 1 0)", ", 0.75"), "LINESTRING (0 0, 1 0)")
    assertSql(rrp("LINESTRING (0 0, 1 1, 2 2, 3 3)", ", 100"), "LINESTRING (0 0, 3 3)")
    assertSql(rrp("LINESTRING (1 1, 1 1, 1 1, 1 1)", ", 2"), "LINESTRING (1 1, 1 1)")
  }

  test("st_pointn / st_startpoint / st_collect / st_dimension golden (reference tests)") {
    val ls = "ST_GeomFromText('LINESTRING(0 0, 1 1, 2 2, 3 3)')"
    assertSql(s"ST_AsText(ST_PointN($ls, 2))", "POINT (1 1)")
    assertSql(s"ST_AsText(ST_PointN($ls, 4))", "POINT (3 3)")
    assertSql(s"ST_AsText(ST_PointN($ls, -2))", "POINT (2 2)") // negative = from end
    assert(sql1(s"ST_PointN($ls, 0)") == null)
    assert(sql1(s"ST_PointN($ls, -10)") == null)
    assert(sql1("ST_PointN(ST_GeomFromText('LINESTRING EMPTY'), 4)") == null)
    assertSql("ST_AsText(ST_PointN(ST_GeomFromText('LINESTRING ZM(0 0 5 1, 1 1 6 2, 2 2 7 3, 3 3 8 4)'), 3))",
      "POINT ZM (2 2 7 3)")
    // startpoint: lines only (PostGIS), not polygons/points
    assert(sql1("ST_StartPoint(ST_GeomFromText('POLYGON((0 0, 0 1, 1 1, 0 0))'))") == null)
    assert(sql1("ST_StartPoint(ST_Point(0, 0))") == null)
    // collect: homogeneous -> Multi*, mixed -> GC, empty -> GC EMPTY
    assertSql("ST_AsText(ST_Collect(array()))", "GEOMETRYCOLLECTION EMPTY")
    assertSql("ST_AsText(ST_Collect(array(ST_Point(1, 2))))", "MULTIPOINT (1 2)")
    assertSql("ST_AsText(ST_Collect(array(ST_Point(1, 2), ST_GeomFromText('LINESTRING(3 4, 5 6)'))))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (3 4, 5 6))")
    // dimension of a collection = max over members
    assertSql("ST_Dimension(ST_GeomFromText('GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(3 4, 5 6))'))", 1)
    assertSql("ST_Dimension(ST_GeomFromText('GEOMETRYCOLLECTION EMPTY'))", 0)
  }

  test("postgis parity: boundary, linemerge(+directed), pointonsurface, reduceprecision") {
    assertSql("ST_AsText(ST_Boundary(ST_GeomFromText('LINESTRING(1 1,0 0, -1 1)')))",
      "MULTIPOINT (1 1, -1 1)")
    assertSql("ST_AsText(ST_Boundary(ST_GeomFromText('POLYGON((1 1,0 0, -1 1, 1 1))')))",
      "LINESTRING (1 1, 0 0, -1 1, 1 1)")
    assertSql("ST_AsText(ST_LineMerge(ST_GeomFromText(" +
      "'MULTILINESTRING((10 160, 60 120), (120 140, 60 120), (120 140, 180 120))')))",
      "LINESTRING (10 160, 60 120, 120 140, 180 120)")
    assertSql("ST_AsText(ST_LineMerge(ST_GeomFromText(" +
      "'MULTILINESTRING((10 160, 60 120), (120 140, 60 120), (120 140, 180 120), (100 180, 120 140))')))",
      "MULTILINESTRING ((10 160, 60 120, 120 140), (100 180, 120 140), (120 140, 180 120))")
    assertSql("ST_AsText(ST_LineMerge(ST_GeomFromText(" +
      "'MULTILINESTRING((-29 -27,-30 -29.7,-36 -31,-45 -33),(-45.2 -33.2,-46 -32))')))",
      "MULTILINESTRING ((-45.2 -33.2, -46 -32), (-29 -27, -30 -29.7, -36 -31, -45 -33))")
    // directed=true never reverses segment orientation
    assertSql("ST_AsText(ST_LineMerge(ST_GeomFromText(" +
      "'MULTILINESTRING((60 30, 10 70), (120 50, 60 30), (120 50, 180 30))'), true))",
      "MULTILINESTRING ((120 50, 60 30, 10 70), (120 50, 180 30))")
    assertSql("ST_AsText(ST_PointOnSurface(ST_GeomFromText('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')))",
      "POINT (5 5)")
    assertSql("ST_AsText(ST_ReducePrecision(ST_GeomFromText('POINT(1.412 19.323)'), 0.1))",
      "POINT (1.4 19.3)")
  }

  test("st_multi golden incl. wrapped empty (st_multi.test, all cases)") {
    assertSql("ST_AsText(ST_Multi(ST_GeomFromText('POINT(1 2)')))", "MULTIPOINT (1 2)")
    assertSql("ST_AsText(ST_Multi(ST_GeomFromText('LINESTRING(1 1, 2 2)')))",
      "MULTILINESTRING ((1 1, 2 2))")
    assertSql("ST_AsText(ST_Multi(ST_GeomFromText('POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))')))",
      "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)))")
    // wrapping an empty point yields a one-element multi, not an empty one
    assertSql("ST_AsText(ST_Multi(ST_GeomFromText('POINT EMPTY')))", "MULTIPOINT (EMPTY)")
    // ...and genuinely empty multis still print the bare EMPTY form
    assertSql("ST_AsText(ST_GeomFromText('MULTIPOINT EMPTY'))", "MULTIPOINT EMPTY")
    assertSql("ST_AsText(ST_GeomFromText('GEOMETRYCOLLECTION EMPTY'))",
      "GEOMETRYCOLLECTION EMPTY")
  }

  test("st_isempty across all geometry types (st_isempty.test)") {
    val cases = Seq(
      "POINT EMPTY" -> true, "POINT(0 0)" -> false,
      "LINESTRING EMPTY" -> true, "LINESTRING(0 0, 1 1)" -> false,
      "POLYGON EMPTY" -> true, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))" -> false,
      "MULTIPOINT EMPTY" -> true, "MULTIPOINT(0 0, 1 1)" -> false,
      "MULTILINESTRING EMPTY" -> true,
      "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))" -> false,
      "MULTIPOLYGON EMPTY" -> true,
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))" -> false,
      "GEOMETRYCOLLECTION EMPTY" -> true,
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1))" -> false)
    cases.foreach { case (wkt, want) =>
      assertSql(s"ST_IsEmpty(ST_GeomFromText('$wkt'))", want)
    }
  }

  test("st_flipcoordinates preserves Z and M (st_flipcoordinates.test, all cases)") {
    val cases = Seq(
      "POINT(1 2)" -> "POINT (2 1)",
      "LINESTRING(1 2, 3 4)" -> "LINESTRING (2 1, 4 3)",
      "POLYGON((1 2, 3 4, 5 6, 1 2))" -> "POLYGON ((2 1, 4 3, 6 5, 2 1))",
      "MULTIPOINT(1 2, 3 4)" -> "MULTIPOINT (2 1, 4 3)",
      "MULTILINESTRING((1 2, 3 4), (5 6, 7 8))" -> "MULTILINESTRING ((2 1, 4 3), (6 5, 8 7))",
      "MULTIPOLYGON(((1 2, 3 4, 5 6, 1 2)), ((7 8, 9 10, 11 12, 7 8)))" ->
        "MULTIPOLYGON (((2 1, 4 3, 6 5, 2 1)), ((8 7, 10 9, 12 11, 8 7)))",
      "GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(3 4, 5 6))" ->
        "GEOMETRYCOLLECTION (POINT (2 1), LINESTRING (4 3, 6 5))",
      "GEOMETRYCOLLECTION EMPTY" -> "GEOMETRYCOLLECTION EMPTY",
      "POINT EMPTY" -> "POINT EMPTY",
      "POINT Z(1 2 3)" -> "POINT Z (2 1 3)",
      "POINT M(1 2 3)" -> "POINT M (2 1 3)",
      "POINT ZM(1 2 3 4)" -> "POINT ZM (2 1 3 4)")
    cases.foreach { case (in, want) =>
      assertSql(s"ST_AsText(ST_FlipCoordinates(ST_GeomFromText('$in')))", want)
    }
    assert(spark.sql("SELECT ST_FlipCoordinates(NULL)").collect()(0).isNullAt(0))
  }

  test("st_isvalid corner cases (geos st_isvalid.test)") {
    assertSql("ST_IsValid(ST_GeomFromText('LINESTRING(1 1, 5 5)'))", true)
    assertSql("ST_IsValid(ST_GeomFromText('POINT EMPTY'))", true)
    // degenerate rings (<4 points / zero area) are invalid
    assertSql("ST_IsValid(ST_MakePolygon(ST_GeomFromText('LINESTRING(2 2, 5 5, 2 2)')))", false)
  }

  test("st_makeline list semantics (st_makeline.test: nulls skip, empty ok)") {
    assertSql("ST_AsText(ST_MakeLine(ST_Point(1,1), ST_Point(2,2)))", "LINESTRING (1 1, 2 2)")
    assertSql("ST_AsText(ST_MakeLine(array(ST_Point(1,1), ST_Point(2,2), ST_Point(3,3))))",
      "LINESTRING (1 1, 2 2, 3 3)")
    assertSql("ST_AsText(ST_MakeLine(array(ST_Point(1,1), NULL, ST_Point(3,3))))",
      "LINESTRING (1 1, 3 3)")
    assertSql("ST_AsText(ST_MakeLine(array(CAST(NULL AS BINARY))))", "LINESTRING EMPTY")
    // a single surviving point cannot form a line (reference: statement error)
    intercept[Exception] {
      sql1("ST_AsText(ST_MakeLine(array(ST_Point(1,1), CAST(NULL AS BINARY))))")
    }
  }

  test("st_area golden incl. recursive collections (st_area.test, all cases)") {
    val cases = Seq(
      "POINT(0 0)" -> 0.0,
      "LINESTRING(0 0, 1 1)" -> 0.0,
      "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))" -> 1.0,
      "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))" -> 0.64,
      "MULTIPOINT(0 0, 1 1)" -> 0.0,
      "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))" -> 0.0,
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))" -> 2.0,
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2)), ((2 2, 3 2, 3 3, 2 3, 2 2), (2.2 2.2, 2.8 2.2, 2.8 2.8, 2.2 2.8, 2.2 2.2)))" -> 1.28,
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1), POLYGON((0 0, 1 0, 1 1, 0 1, 0 0)))" -> 1.0,
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1), POLYGON((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2)))" -> 0.64)
    cases.foreach { case (wkt, want) => assertSqlApprox(s"ST_Area(ST_GeomFromText('$wkt'))", want, 1e-9) }
  }

  test("st_length golden: polygons contribute 0, collections recurse (st_length.test)") {
    val cases = Seq(
      "LINESTRING(0 0, 0 1, 0 2, 0 3, 1 3, 2 3)" -> 5.0,
      "LINESTRING EMPTY" -> 0.0,
      "MULTILINESTRING EMPTY" -> 0.0,
      "MULTILINESTRING((0 0, 0 1, 0 2, 0 3, 1 3, 2 3), (0 0, 0 1, 0 2, 0 3, 1 3, 2 3))" -> 10.0,
      "POINT(0 0)" -> 0.0,
      "MULTIPOINT(0 0, 1 1)" -> 0.0,
      "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))" -> 0.0,
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)),((0 0, 1 0, 1 1, 0 1, 0 0)))" -> 0.0,
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 0 1, 0 2, 0 3, 1 3, 2 3))" -> 5.0)
    cases.foreach { case (wkt, want) => assertSqlApprox(s"ST_Length(ST_GeomFromText('$wkt'))", want, 1e-9) }
    assert(spark.sql("SELECT ST_Length(NULL)").collect()(0).isNullAt(0))
  }

  test("st_perimeter golden: lines contribute 0, holes add (st_perimeter.test)") {
    val cases = Seq(
      "POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))" -> 4.0,
      "POLYGON((-1 -1, -1 0, 0 0, 0 -1, -1 -1))" -> 4.0,
      "POLYGON((0 0, 0 1, 1 1, 1 0, 0 0), (0.25 0.25, 0.25 0.75, 0.75 0.75, 0.75 0.25, 0.25 0.25))" -> 6.0,
      "POLYGON EMPTY" -> 0.0,
      "MULTIPOLYGON(((0 0, 0 1, 1 1, 1 0, 0 0)), ((0.25 0.25, 0.25 0.75, 0.75 0.75, 0.75 0.25, 0.25 0.25)))" -> 6.0,
      "MULTIPOLYGON EMPTY" -> 0.0,
      "MULTIPOLYGON(EMPTY, ((0 0, 0 1, 1 1, 1 0, 0 0)))" -> 4.0,
      "GEOMETRYCOLLECTION(POLYGON((0 0, 0 1, 1 1, 1 0, 0 0)), POLYGON((0.25 0.25, 0.25 0.75, 0.75 0.75, 0.75 0.25, 0.25 0.25)))" -> 6.0,
      "GEOMETRYCOLLECTION(LINESTRING(0 0, 5 5), POLYGON((0 0, 0 1, 1 1, 1 0, 0 0)))" -> 4.0)
    cases.foreach { case (wkt, want) => assertSqlApprox(s"ST_Perimeter(ST_GeomFromText('$wkt'))", want, 1e-9) }
  }

  test("st_x/st_y on empty and negative zero (st_xy.test)") {
    assertSql("ST_X(ST_GeomFromText('POINT(1 -2)'))", 1.0)
    assertSql("ST_Y(ST_GeomFromText('POINT(1 -2)'))", -2.0)
    assert(spark.sql("SELECT ST_X(ST_GeomFromText('POINT EMPTY'))").collect()(0).isNullAt(0))
    assert(spark.sql("SELECT ST_Y(ST_GeomFromText('POINT EMPTY'))").collect()(0).isNullAt(0))
    assert(spark.sql("SELECT ST_X(NULL)").collect()(0).isNullAt(0))
    assertSql("ST_X(ST_GeomFromText('POINT ZM (0 1 2 3)'))", 0.0)
    assertSql("ST_Y(ST_GeomFromText('POINT ZM (0 1 2 3)'))", 1.0)
    assertSql("ST_Z(ST_GeomFromText('POINT ZM (0 1 2 3)'))", 2.0)
    assertSql("ST_M(ST_GeomFromText('POINT ZM (0 1 2 3)'))", 3.0)
  }

  test("st_numgeometries: empty singletons are 0 parts, nested GC counts direct children (st_ngeometries.test)") {
    val cases = Seq(
      "POINT EMPTY" -> 0, "POINT(0 0)" -> 1,
      "LINESTRING EMPTY" -> 0, "LINESTRING(0 0, 1 1)" -> 1,
      "POLYGON EMPTY" -> 0, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))" -> 1,
      "MULTIPOINT EMPTY" -> 0, "MULTIPOINT(0 0, 1 1)" -> 2,
      "MULTILINESTRING EMPTY" -> 0, "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))" -> 2,
      "MULTIPOLYGON EMPTY" -> 0, "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))" -> 2,
      "GEOMETRYCOLLECTION EMPTY" -> 0,
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1))" -> 2,
      "GEOMETRYCOLLECTION(GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1)))" -> 1)
    cases.foreach { case (wkt, want) => assertSql(s"ST_NumGeometries(ST_GeomFromText('$wkt'))", want) }
  }

  test("st_numpoints recurses collections (st_npoints.test)") {
    val cases = Seq(
      "POINT EMPTY" -> 0, "POINT(0 0)" -> 1,
      "LINESTRING(0 0, 1 1)" -> 2,
      "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))" -> 5,
      "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0), (0.5 0.5, 0.5 0.75, 0.75 0.75, 0.75 0.5, 0.5 0.5))" -> 10,
      "MULTIPOINT(0 0, 1 1)" -> 2,
      "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))" -> 4,
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1))" -> 3,
      "GEOMETRYCOLLECTION(GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1)))" -> 3)
    cases.foreach { case (wkt, want) => assertSql(s"ST_NumPoints(ST_GeomFromText('$wkt'))", want) }
  }

  test("st_geomfromtext: multipoint paren forms, EWKT SRID prefix, invalid rejects (st_geomfromtext.test)") {
    assertSql("ST_AsText(ST_GeomFromText('MULTIPOINT ((0 0), (1 1))'))", "MULTIPOINT (0 0, 1 1)")
    assertSql("ST_AsText(ST_GeomFromText('MULTIPOINT (0 0, 1 1)'))", "MULTIPOINT (0 0, 1 1)")
    assertSql("ST_AsText(ST_GeomFromText('SRID=4326; POINT (0 1)'))", "POINT (0 1)")
    intercept[Exception] { sql1("ST_AsText(ST_GeomFromText('POINT Z (1 2)'))") }
    // ignore_invalid flag degrades the error to NULL
    assert(spark.sql("SELECT ST_GeomFromText('POINT Z (1 2)', true)").collect()(0).isNullAt(0))
  }

  test("st_asgeojson golden formats: .0 on integral doubles, [] for EMPTY (st_asgeojson.test, all cases)") {
    val cases = Seq(
      "POINT EMPTY" -> """{"type":"Point","coordinates":[]}""",
      "POINT(0 0)" -> """{"type":"Point","coordinates":[0.0,0.0]}""",
      "LINESTRING EMPTY" -> """{"type":"LineString","coordinates":[]}""",
      "LINESTRING(0 0, 1 1)" -> """{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]}""",
      "POLYGON EMPTY" -> """{"type":"Polygon","coordinates":[]}""",
      "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))" -> """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,1.0],[0.0,0.0]]]}""",
      "MULTIPOINT EMPTY" -> """{"type":"MultiPoint","coordinates":[]}""",
      "MULTIPOINT(0 0, 1 1)" -> """{"type":"MultiPoint","coordinates":[[0.0,0.0],[1.0,1.0]]}""",
      "MULTILINESTRING EMPTY" -> """{"type":"MultiLineString","coordinates":[]}""",
      "MULTILINESTRING((0 0, 1 1), (2 2, 3 3))" -> """{"type":"MultiLineString","coordinates":[[[0.0,0.0],[1.0,1.0]],[[2.0,2.0],[3.0,3.0]]]}""",
      "MULTIPOLYGON EMPTY" -> """{"type":"MultiPolygon","coordinates":[]}""",
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))" -> """{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,1.0],[0.0,0.0]]],[[[2.0,2.0],[3.0,2.0],[3.0,3.0],[2.0,3.0],[2.0,2.0]]]]}""",
      "GEOMETRYCOLLECTION EMPTY" -> """{"type":"GeometryCollection","geometries":[]}""",
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1))" -> """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[0.0,0.0]},{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0]]}]}""")
    cases.foreach { case (wkt, want) => assertSql(s"ST_AsGeoJSON(ST_GeomFromText('$wkt'))", want) }
    // non-integral coordinates keep their fraction, no forced .0
    assertSql("ST_AsGeoJSON(ST_Point(0.5, 1.25))", """{"type":"Point","coordinates":[0.5,1.25]}""")
  }

  test("wkt roundtrip + type tags for every geometry type (geometry_types.test)") {
    val wkts = Seq(
      "POINT EMPTY" -> "POINT",
      "POINT (0 0)" -> "POINT",
      "LINESTRING EMPTY" -> "LINESTRING",
      "LINESTRING (0 0, 1 1)" -> "LINESTRING",
      "POLYGON EMPTY" -> "POLYGON",
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))" -> "POLYGON",
      "MULTIPOINT EMPTY" -> "MULTIPOINT",
      "MULTIPOINT (0 0, 1 1)" -> "MULTIPOINT",
      "MULTILINESTRING EMPTY" -> "MULTILINESTRING",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))" -> "MULTILINESTRING",
      "MULTIPOLYGON EMPTY" -> "MULTIPOLYGON",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))" -> "MULTIPOLYGON",
      "GEOMETRYCOLLECTION EMPTY" -> "GEOMETRYCOLLECTION",
      "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))" -> "GEOMETRYCOLLECTION")
    wkts.foreach { case (wkt, tag) =>
      assertSql(s"ST_AsText(ST_GeomFromText('$wkt'))", wkt)
      assertSql(s"ST_GeometryType(ST_GeomFromText('$wkt'))", tag)
    }
  }

  test("st_boundary of a GeometryCollection is NULL, null propagates (st_disjoint.test)") {
    assert(spark.sql("SELECT ST_Boundary(ST_GeomFromText('GEOMETRYCOLLECTION EMPTY'))")
      .collect()(0).isNullAt(0))
    assert(spark.sql(
      """SELECT ST_Disjoint(
           ST_Boundary(ST_GeomFromText('MULTILINESTRING((7 33,4 31 ,9 31 ,13 27 ,7 33))')),
           ST_Boundary(ST_GeomFromText('GEOMETRYCOLLECTION EMPTY')))""").collect()(0).isNullAt(0))
    // Multi* boundaries still work (they are not bare collections)
    assertSql("ST_AsText(ST_Boundary(ST_GeomFromText('MULTILINESTRING((0 0, 1 1), (2 2, 3 3))')))",
      "MULTIPOINT (0 0, 1 1, 2 2, 3 3)")
  }

  test("st_numinteriorrings golden (st_ninteriorrings.test)") {
    assertSql("ST_NumInteriorRings(ST_GeomFromText('POLYGON((0 0, 0 1, 1 1, 1 0, 0 0))'))", 0)
    assertSql("ST_NumInteriorRings(ST_GeomFromText('POLYGON EMPTY'))", 0)
    assertSql("ST_NumInteriorRings(ST_GeomFromText('POLYGON((0 0, 0 1, 1 1, 1 0, 0 0), (0.25 0.25, 0.25 0.75, 0.75 0.75, 0.75 0.25, 0.25 0.25))'))", 1)
  }
}
