package graft

import graft.functions.{Geodesy, HilbertCurve, Jts}
import org.locationtech.jts.geom.Coordinate
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the geometry kernel (pure JVM, no Spark
 *  session). Uses scalacheck Gens sampled deterministically (the
 *  scalatest-scalacheck bridge isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val coord = for {
    x <- Gen.chooseNum(-180.0, 180.0)
    y <- Gen.chooseNum(-85.0, 85.0)
  } yield new Coordinate(x, y)

  private val pointGen = coord.map(Jts.gf.createPoint)

  private val lineGen = for {
    n <- Gen.chooseNum(2, 12)
    cs <- Gen.listOfN(n, coord)
  } yield Jts.gf.createLineString(cs.toArray)

  private val boxGen = for {
    x0 <- Gen.chooseNum(-170.0, 160.0); y0 <- Gen.chooseNum(-80.0, 70.0)
    w <- Gen.chooseNum(0.1, 20.0); h <- Gen.chooseNum(0.1, 15.0)
  } yield Jts.envelope(x0, y0, x0 + w, y0 + h)

  private val geomGen = Gen.oneOf(pointGen, lineGen, boxGen)

  test("WKB roundtrip is identity") {
    samples(geomGen).foreach { g =>
      val back = Jts.read(Jts.write(g))
      assert(back.equalsExact(g), s"$g != $back")
    }
  }

  test("WKT roundtrip preserves topology") {
    samples(geomGen).foreach { g =>
      val back = Jts.fromWkt(Jts.toWkt(g))
      assert(back.equalsExact(g, 1e-9))
    }
  }

  test("GeoJSON roundtrip preserves coordinates") {
    samples(geomGen).foreach { g =>
      val back = graft.functions.GeoJson.parse(graft.functions.GeoJson.write(g))
      assert(back.equalsExact(g, 1e-9))
    }
  }

  test("intersects implies bbox intersects (the join-rewrite invariant)") {
    samples(Gen.zip(boxGen, boxGen)).foreach { case (a, b) =>
      if (a.intersects(b)) assert(a.getEnvelopeInternal.intersects(b.getEnvelopeInternal))
    }
  }

  test("within implies contained bbox (the data-skipping invariant)") {
    samples(Gen.zip(pointGen, boxGen)).foreach { case (p, b) =>
      if (p.within(b)) {
        val e = b.getEnvelopeInternal
        assert(p.getX >= e.getMinX && p.getX <= e.getMaxX &&
          p.getY >= e.getMinY && p.getY <= e.getMaxY)
      }
    }
  }

  test("haversine: symmetric, non-negative, zero on identical points") {
    samples(Gen.zip(coord, coord)).foreach { case (a, b) =>
      val d1 = Geodesy.haversine(a.x, a.y, b.x, b.y)
      val d2 = Geodesy.haversine(b.x, b.y, a.x, a.y)
      assert(d1 >= 0 && math.abs(d1 - d2) < 1e-6)
      assert(Geodesy.haversine(a.x, a.y, a.x, a.y) == 0.0)
    }
  }

  test("vincenty agrees with haversine within ellipsoid flattening") {
    samples(Gen.zip(coord, coord)).foreach { case (a, b) =>
      val hv = Geodesy.haversine(a.x, a.y, b.x, b.y)
      val vc = Geodesy.vincenty(a.x, a.y, b.x, b.y)
      if (hv > 1000) assert(math.abs(vc - hv) / hv < 0.006, s"hv=$hv vc=$vc at $a $b")
    }
  }

  test("hilbert stays in range and is injective on a 1000-cell sample") {
    samples(Gen.zip(Gen.chooseNum(0, 0xFFFF), Gen.chooseNum(0, 0xFFFF))).foreach { case (x, y) =>
      val d = HilbertCurve.xy2d(x, y)
      assert(d >= 0L && d <= 0xFFFFFFFFL)
    }
    val ds = (0 until 1000).map(i => HilbertCurve.xy2d(i % 100, i / 100))
    assert(ds.distinct.size == 1000)
  }

  test("ST_Transform roundtrips through every supported CRS") {
    val crss = Seq("EPSG:3857", "EPSG:32631", "EPSG:32731")
    samples(Gen.zip(Gen.chooseNum(0.1, 8.9), Gen.chooseNum(-75.0, 75.0)), 100).foreach { case (lon, lat) =>
      crss.foreach { crs =>
        val p = Jts.point(lon, lat)
        val there = graft.functions.Crs.transform(p, "EPSG:4326", crs, alwaysXy = true)
        val back = graft.functions.Crs.transform(there, crs, "EPSG:4326", alwaysXy = true)
        val c = back.getCoordinate
        assert(math.abs(c.x - lon) < 1e-8 && math.abs(c.y - lat) < 1e-8,
          s"$crs roundtrip: ($lon,$lat) -> (${c.x},${c.y})")
      }
    }
  }

  test("state-plane CRSs roundtrip inside their zone of validity") {
    val zones = Seq(
      ("EPSG:2260", -75.5, 41.5), ("EPSG:2261", -76.5, 42.5), ("EPSG:2262", -78.6, 42.5),
      ("EPSG:2263", -73.8, 40.7), ("EPSG:32118", -73.8, 40.7),
      ("EPSG:2229", -118.2, 34.1), ("EPSG:3435", -88.0, 41.8),
      ("EPSG:2272", -77.0, 40.0), ("EPSG:2277", -98.5, 30.5), ("EPSG:26918", -74.0, 40.7))
    samples(Gen.zip(Gen.chooseNum(-0.4, 0.4), Gen.chooseNum(-0.4, 0.4)), 40).foreach { case (dx, dy) =>
      zones.foreach { case (crs, lon0, lat0) =>
        val (lon, lat) = (lon0 + dx, lat0 + dy)
        val p = Jts.point(lon, lat)
        val there = graft.functions.Crs.transform(p, "EPSG:4326", crs, alwaysXy = true)
        val back = graft.functions.Crs.transform(there, crs, "EPSG:4326", alwaysXy = true)
        val c = back.getCoordinate
        assert(math.abs(c.x - lon) < 1e-8 && math.abs(c.y - lat) < 1e-8,
          s"$crs roundtrip: ($lon,$lat) -> (${c.x},${c.y})")
      }
    }
  }

  test("Lambert 2SP matches Snyder's published worked example (PP 1395 p.296)") {
    // Clarke 1866, SP 33°/45°, origin 23°N 96°W; point 35°N 75°W.
    val clarke1866 = graft.functions.Crs.Ellipsoid(6378206.4, 1.0 / 294.9786982)
    val sys = graft.functions.Crs.lccForTest(clarke1866, 23.0, -96.0, 33.0, 45.0, 0.0, 0.0)
    val (x, y) = sys.forward(-75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 0.5, s"x=$x")
    assert(math.abs(y - 1564649.5) < 0.5, s"y=$y")
    val (lon, lat) = sys.inverse(x, y)
    assert(math.abs(lon - -75.0) < 1e-9 && math.abs(lat - 35.0) < 1e-9)
  }

  test("Albers matches Snyder's published worked example (PP 1395 p.292)") {
    // Clarke 1866, SP 29.5°/45.5°, origin 23°N 96°W; point 35°N 75°W.
    val clarke1866 = graft.functions.Crs.Ellipsoid(6378206.4, 1.0 / 294.9786982)
    val sys = graft.functions.Crs.albersForTest(clarke1866, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0)
    val (x, y) = sys.forward(-75.0, 35.0)
    assert(math.abs(x - 1885472.7) < 0.5, s"x=$x")
    assert(math.abs(y - 1535925.0) < 0.5, s"y=$y")
    val (lon, lat) = sys.inverse(x, y)
    assert(math.abs(lon - -75.0) < 1e-9 && math.abs(lat - 35.0) < 1e-9)
  }

  test("LAEA matches Snyder's published worked example (PP 1395 p.358)") {
    // Clarke 1866, oblique aspect centered 40°N 100°W; point 30°N 110°W.
    val clarke1866 = graft.functions.Crs.Ellipsoid(6378206.4, 1.0 / 294.9786982)
    val sys = graft.functions.Crs.laeaForTest(clarke1866, 40.0, -100.0, 0.0, 0.0)
    val (x, y) = sys.forward(-110.0, 30.0)
    assert(math.abs(x - -965932.1) < 0.5, s"x=$x")
    assert(math.abs(y - -1056814.9) < 0.5, s"y=$y")
    val (lon, lat) = sys.inverse(x, y)
    assert(math.abs(lon - -110.0) < 1e-9 && math.abs(lat - 30.0) < 1e-9)
  }

  test("equal-area CRSs roundtrip across their zone of use") {
    val zones = Seq(
      ("EPSG:5070", -96.0, 38.0, 20.0, 8.0), ("EPSG:6350", -96.0, 38.0, 20.0, 8.0),
      ("ESRI:102003", -96.0, 38.0, 20.0, 8.0), ("EPSG:3035", 10.0, 52.0, 20.0, 15.0))
    samples(Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(-1.0, 1.0)), 40).foreach {
      case (fx, fy) =>
        zones.foreach { case (crs, lon0, lat0, sx, sy) =>
          val (lon, lat) = (lon0 + fx * sx, lat0 + fy * sy)
          val p = Jts.point(lon, lat)
          val there = graft.functions.Crs.transform(p, "EPSG:4326", crs, alwaysXy = true)
          val back = graft.functions.Crs.transform(there, crs, "EPSG:4326", alwaysXy = true)
          val c = back.getCoordinate
          assert(math.abs(c.x - lon) < 1e-8 && math.abs(c.y - lat) < 1e-8,
            s"$crs roundtrip: ($lon,$lat) -> (${c.x},${c.y})")
        }
    }
  }

  test("EPSG:3035 false origin: (10E, 52N) maps to exactly (4321000, 3210000)") {
    val o = graft.functions.Crs.transform(Jts.point(10.0, 52.0),
      "EPSG:4326", "EPSG:3035", alwaysXy = true).getCoordinate
    assert(math.abs(o.x - 4321000.0) < 1e-6 && math.abs(o.y - 3210000.0) < 1e-6,
      s"(${o.x},${o.y})")
  }

  test("equal-area projections preserve area (vs certified spheroid area)") {
    // A lon/lat-aligned square projected to an equal-area CRS must keep
    // the EXACT ellipsoidal area A = a²·Δλ·(q(top)−q(bot))/2 (that is
    // the defining property; grid scale cancels). The authalic-sphere
    // areaSpheroid path is only a cross-check: it uses geodetic
    // latitudes on the authalic sphere, good to ~e² relative.
    val e2 = graft.functions.Crs.GRS80.e2
    val ee = math.sqrt(e2)
    def qOf(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * ee)) * math.log((1 - ee * s) / (1 + ee * s)))
    }
    val cases = Seq(("EPSG:5070", -90.0, 40.0), ("EPSG:3035", 15.0, 50.0))
    cases.foreach { case (crs, lon, lat) =>
      val d = 0.5
      val sq = Jts.fromWkt(
        s"POLYGON(($lon $lat, ${lon + d} $lat, ${lon + d} ${lat + d}, $lon ${lat + d}, $lon $lat))")
      // densify edges so the projected polygon tracks parallels/meridians
      val dense = org.locationtech.jts.densify.Densifier.densify(sq, 0.005)
      val planar = graft.functions.Crs.transform(dense, "EPSG:4326", crs, alwaysXy = true).getArea
      val a = graft.functions.Crs.GRS80.a
      val exact = a * a * math.toRadians(d) * (qOf(lat + d) - qOf(lat)) / 2
      assert(math.abs(planar - exact) / exact < 1e-6,
        s"$crs: planar $planar vs exact ellipsoidal $exact")
      val spheroid = Geodesy.areaSpheroid(dense)
      assert(math.abs(planar - spheroid) / spheroid < 5e-3,
        s"$crs: planar $planar vs authalic-approx $spheroid")
    }
  }

  test("ftUS zones are the metric zone re-expressed in US survey feet") {
    // EPSG:2263 (ftUS) and EPSG:32118 (m) share projection parameters
    val p = Jts.point(-73.9857, 40.7484)
    val ft = graft.functions.Crs.transform(p, "EPSG:4326", "EPSG:2263", alwaysXy = true).getCoordinate
    val m = graft.functions.Crs.transform(p, "EPSG:4326", "EPSG:32118", alwaysXy = true).getCoordinate
    assert(math.abs(ft.x * graft.functions.Crs.FtUs - m.x) < 1e-6)
    assert(math.abs(ft.y * graft.functions.Crs.FtUs - m.y) < 1e-6)
    // and the LI false easting is the published 984250 ftUS exactly at lon0
    val origin = Jts.point(-74.0, 40.1666666666667)
    val o = graft.functions.Crs.transform(origin, "EPSG:4326", "EPSG:2263", alwaysXy = true).getCoordinate
    assert(math.abs(o.x - 984250.0) < 1e-6 && math.abs(o.y) < 1e-6, s"(${o.x},${o.y})")
  }

  test("projected distances match geodesics within state-plane distortion") {
    // grid scale error for SPCS zones is <= ~1/10000 by design; check a
    // ~11 km segment in each zone against the spheroid distance
    val zones = Seq(("EPSG:2263", -74.0, 40.7, graft.functions.Crs.FtUs),
      ("EPSG:2229", -118.2, 34.1, graft.functions.Crs.FtUs),
      ("EPSG:3435", -88.0, 41.8, graft.functions.Crs.FtUs),
      ("EPSG:26918", -74.0, 40.7, 1.0))
    zones.foreach { case (crs, lon, lat, unit) =>
      val a = Jts.point(lon, lat); val b = Jts.point(lon + 0.1, lat + 0.05)
      val pa = graft.functions.Crs.transform(a, "EPSG:4326", crs, alwaysXy = true).getCoordinate
      val pb = graft.functions.Crs.transform(b, "EPSG:4326", crs, alwaysXy = true).getCoordinate
      val planar = math.hypot((pa.x - pb.x) * unit, (pa.y - pb.y) * unit)
      val geodesic = Geodesy.vincenty(lon, lat, lon + 0.1, lat + 0.05)
      assert(math.abs(planar - geodesic) / geodesic < 5e-4,
        s"$crs: planar $planar vs geodesic $geodesic")
    }
  }

  test("NAD83 UTM matches WGS84 UTM to sub-millimeter (same frame in practice)") {
    val p = Jts.point(-74.0, 40.7)
    val a = graft.functions.Crs.transform(p, "EPSG:4326", "EPSG:26918", alwaysXy = true).getCoordinate
    val b = graft.functions.Crs.transform(p, "EPSG:4326", "EPSG:32618", alwaysXy = true).getCoordinate
    assert(math.abs(a.x - b.x) < 1e-3 && math.abs(a.y - b.y) < 1e-3)
  }
}
