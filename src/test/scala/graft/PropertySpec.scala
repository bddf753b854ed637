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

  test("Transverse Mercator on Airy 1830 matches the OS worked example") {
    // OSGB "A guide to coordinate systems in Great Britain", worked
    // example (Caister water tower): OSGB36 geodetic
    // φ = 52°39'27.2531"N, λ = 1°43'4.5177"E -> E 651409.903, N 313177.270
    val sys = graft.functions.Crs.tmForTest(graft.functions.Crs.Airy1830,
      49.0, -2.0, 0.9996012717, 400000.0, -100000.0)
    val lat = 52.0 + 39.0 / 60 + 27.2531 / 3600
    val lon = 1.0 + 43.0 / 60 + 4.5177 / 3600
    val (x, y) = sys.forward(lon, lat)
    assert(math.abs(x - 651409.903) < 0.005, s"x=$x")
    assert(math.abs(y - 313177.270) < 0.005, s"y=$y")
    val (lonB, latB) = sys.inverse(x, y)
    assert(math.abs(lonB - lon) < 1e-9 && math.abs(latB - lat) < 1e-9)
  }

  test("EPSG:27700 Helmert datum shift: direction and magnitude anchors") {
    import graft.functions.Crs
    val sys = Crs.resolve("EPSG:27700")
    val tm = Crs.tmForTest(Crs.Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0)
    // Anchor 1 (well-known): the OSGB36 zero meridian at Greenwich lies
    // ~5-6 arcsec EAST of the WGS84 zero meridian (~105 m), and OSGB36
    // latitudes are ~1.5-2 arcsec south of WGS84 at London. Project an
    // OSGB36 geodetic point with the bare TM, then ask the full chain
    // for its WGS84 position.
    val (e0, n0) = tm.forward(0.0, 51.4779)
    val (wlon, wlat) = sys.inverse(e0, n0)
    val dLonSec = wlon * 3600
    val dLatSec = (wlat - 51.4779) * 3600
    assert(dLonSec > -6.5 && dLonSec < -4.5, s"greenwich lon shift $dLonSec arcsec")
    assert(dLatSec > 1.0 && dLatSec < 2.5, s"greenwich lat shift $dLatSec arcsec")
    // Anchor 2: the OSGB36<->WGS84 horizontal displacement over GB is
    // famously "about 100 m"; assert 50-160 m at three spread stations
    Seq((-4.0, 56.0), (-1.5, 52.5), (0.5, 51.3)).foreach { case (lon, lat) =>
      val (xw, yw) = sys.forward(lon, lat)   // WGS84 in -> BNG out
      val (xo, yo) = tm.forward(lon, lat)    // same numbers read as OSGB36
      val d = math.hypot(xw - xo, yw - yo)
      assert(d > 50 && d < 160, s"datum displacement at ($lon,$lat): $d m")
    }
    // chain invertibility (Helmert reverse = negated parameters)
    val (lonB, latB) = sys.inverse(sys.forward(-1.5, 52.5)._1, sys.forward(-1.5, 52.5)._2)
    assert(math.abs(lonB - -1.5) < 1e-7 && math.abs(latB - 52.5) < 1e-7)
  }

  test("Polar Stereographic variant B matches the EPSG worked example") {
    // EPSG Guidance 7-2 §3.2.4 (Australian Antarctic): WGS84,
    // latTs = -71°, lon0 = 70°E, FE = FN = 6000000;
    // φ = 75°S, λ = 120°E -> E 7255380.79, N 7053389.56
    val sys = graft.functions.Crs.polarForTest(graft.functions.Crs.WGS84,
      -71.0, 70.0, 6000000.0, 6000000.0)
    val (x, y) = sys.forward(120.0, -75.0)
    assert(math.abs(x - 7255380.79) < 0.05, s"x=$x")
    assert(math.abs(y - 7053389.56) < 0.05, s"y=$y")
    val (lon, lat) = sys.inverse(x, y)
    assert(math.abs(lon - 120.0) < 1e-9 && math.abs(lat - -75.0) < 1e-9)
  }

  test("Oblique Stereographic matches the EPSG worked example (RD New)") {
    // EPSG Guidance 7-2 §3.2.1 worked example (Amersfoort / RD New):
    // Bessel 1841, lat0 = 52°09'22.178"N, lon0 = 5°23'15.500"E,
    // k0 = 0.9999079, FE = 155000, FN = 463000;
    // Amersfoort geodetic φ = 53°N, λ = 6°E -> E 196105.283, N 557057.739
    val sys = graft.functions.Crs.obliqueStereoForTest(graft.functions.Crs.Bessel1841,
      52.1561605555556, 5.38763888888889, 0.9999079, 155000.0, 463000.0)
    val (x, y) = sys.forward(6.0, 53.0)
    assert(math.abs(x - 196105.283) < 0.01, s"x=$x")
    assert(math.abs(y - 557057.739) < 0.01, s"y=$y")
    val (lon, lat) = sys.inverse(x, y)
    assert(math.abs(lon - 6.0) < 1e-9 && math.abs(lat - 53.0) < 1e-9)
    // full chain (WGS84 in): Amsterdam centre lands in its known RD
    // square (~121000, 487000) and roundtrips
    val rd = graft.functions.Crs.resolve("EPSG:28992")
    val (ax, ay) = rd.forward(4.9041, 52.3676)
    assert(math.abs(ax - 121000) < 1500 && math.abs(ay - 487000) < 1500, s"($ax,$ay)")
    val (blon, blat) = rd.inverse(ax, ay)
    assert(math.abs(blon - 4.9041) < 1e-7 && math.abs(blat - 52.3676) < 1e-7)
  }

  test("Swiss Oblique Mercator: origin exactness, WGS84 anchor, roundtrip") {
    import graft.functions.Crs
    // projection-level: the CH1903 geodetic origin (Bern old
    // observatory) maps exactly onto the LV03 false origin
    val proj = Crs.swissForTest(Crs.Bessel1841,
      46.0 + 57.0 / 60 + 8.66 / 3600, 7.0 + 26.0 / 60 + 22.5 / 3600,
      600000.0, 200000.0)
    val (ox, oy) = proj.forward(7.0 + 26.0 / 60 + 22.5 / 3600,
      46.0 + 57.0 / 60 + 8.66 / 3600)
    assert(math.abs(ox - 600000.0) < 1e-6 && math.abs(oy - 200000.0) < 1e-6, s"($ox,$oy)")
    // full chain: the WGS84 position of the LV03 false origin is the
    // published 46°57'03.9"N, 7°26'19.1"E — the grid-free Helmert
    // lands within ~2 m of (600000, 200000)
    val lv03 = Crs.resolve("EPSG:21781")
    val (bx, by) = lv03.forward(7.0 + 26.0 / 60 + 19.1 / 3600,
      46.0 + 57.0 / 60 + 3.9 / 3600)
    assert(math.abs(bx - 600000.0) < 2.5 && math.abs(by - 200000.0) < 2.5, s"($bx,$by)")
    // LV95 is the same projection with the 2.6M/1.2M false origin
    val lv95 = Crs.resolve("EPSG:2056")
    val (ex, ey) = lv95.forward(7.0 + 26.0 / 60 + 19.1 / 3600,
      46.0 + 57.0 / 60 + 3.9 / 3600)
    assert(math.abs(ex - 2600000.0) < 2.5 && math.abs(ey - 1200000.0) < 2.5, s"($ex,$ey)")
    // roundtrip across the zone of use
    for ((lon, lat) <- Seq((6.1, 46.2), (7.45, 46.95), (9.85, 46.5), (8.55, 47.38))) {
      val (x, y) = lv95.forward(lon, lat)
      val (lonB, latB) = lv95.inverse(x, y)
      assert(math.abs(lonB - lon) < 1e-7 && math.abs(latB - lat) < 1e-7, s"($lon,$lat)")
    }
    // conformality at Zurich (tiny orthogonal steps stay orthogonal,
    // isotropic scale) — the defining property the rotation+Mercator
    // composition must preserve
    val eps = 1e-7
    val (x0, y0) = proj.forward(8.54, 47.37)
    val (xe, ye) = proj.forward(8.54 + eps, 47.37)
    val (xn, yn) = proj.forward(8.54, 47.37 + eps)
    val (ax, ay) = (xe - x0, ye - y0); val (bx2, by2) = (xn - x0, yn - y0)
    val cosAngle = (ax * bx2 + ay * by2) / (math.hypot(ax, ay) * math.hypot(bx2, by2))
    assert(math.abs(cosAngle) < 1e-4, s"not conformal: $cosAngle")
  }

  test("Swiss Oblique inverse converges across (and beyond) the validity box") {
    import graft.functions.Crs
    // property: the inverse's isometric-latitude fixed-point iteration
    // (capped at 25 steps) must converge for every point of the LV95
    // validity box AND a margin beyond it — convergence is witnessed
    // by the forward∘inverse roundtrip landing back within 1e-9°
    // (~0.1 mm), far tighter than the 1e-14 rad iteration tolerance
    // would allow if the cap were being hit before convergence.
    val proj = Crs.swissForTest(Crs.Bessel1841,
      46.0 + 57.0 / 60 + 8.66 / 3600, 7.0 + 26.0 / 60 + 22.5 / 3600,
      2600000.0, 1200000.0)
    // corners + alpine extremes: Geneva, Chancy (westmost), Val
    // Müstair (eastmost), Chiasso (south), Bargen (north), Dufourspitze
    val anchors = Seq((6.14, 46.2), (5.956, 46.13), (10.492, 46.61),
      (9.02, 45.82), (8.61, 47.81), (7.87, 45.94))
    for ((lon, lat) <- anchors; (dLon, dLat) <- Seq((0.0, 0.0), (-0.5, -0.5), (0.5, 0.5))) {
      val (x, y) = proj.forward(lon + dLon, lat + dLat)
      val (lonB, latB) = proj.inverse(x, y)
      assert(math.abs(lonB - (lon + dLon)) < 1e-9 && math.abs(latB - (lat + dLat)) < 1e-9,
        s"roundtrip diverged at (${lon + dLon},${lat + dLat}) -> ($lonB,$latB)")
    }
    // randomized sweep over a generous superset of the box
    samples(Gen.zip(Gen.chooseNum(4.5, 12.0), Gen.chooseNum(44.5, 49.0)), 200).foreach {
      case (lon, lat) =>
        val (x, y) = proj.forward(lon, lat)
        val (lonB, latB) = proj.inverse(x, y)
        assert(math.abs(lonB - lon) < 1e-9 && math.abs(latB - lat) < 1e-9,
          s"roundtrip diverged at ($lon,$lat) -> ($lonB,$latB)")
    }
    // full datum chains at the same anchors: Bowring's single-step
    // geocentric->geodetic closure is exact only to ~1e-8° (≈1 mm)
    // per direction, so the chain tolerance is 5e-8° — still sub-cm
    for (code <- Seq("EPSG:2056", "EPSG:21781"); (lon, lat) <- anchors) {
      val p = Jts.point(lon, lat)
      val there = Crs.transform(p, "EPSG:4326", code, alwaysXy = true)
      val back = Crs.transform(there, code, "EPSG:4326", alwaysXy = true)
      val c = back.getCoordinate
      assert(math.abs(c.x - lon) < 5e-8 && math.abs(c.y - lat) < 5e-8,
        s"$code roundtrip: ($lon,$lat) -> (${c.x},${c.y})")
    }
  }

  test("round-4 conformal projections preserve angles and isotropic scale") {
    import graft.functions.Crs
    // conformality check: the images of two tiny orthogonal steps stay
    // orthogonal and equal-length (the defining property of Mercator,
    // polar stereographic, and oblique stereographic projections)
    val systems = Seq(
      ("EPSG:3395 (Mercator)", Crs.resolve("EPSG:3395"), Crs.WGS84, 10.0, 45.0),
      ("polar stereo", Crs.polarForTest(Crs.WGS84, -71.0, 0.0, 0.0, 0.0),
        Crs.WGS84, 60.0, -72.0),
      ("oblique stereo", Crs.obliqueStereoForTest(Crs.Bessel1841,
        52.1561605555556, 5.38763888888889, 0.9999079, 0.0, 0.0),
        Crs.Bessel1841, 5.5, 52.2))
    val eps = 1e-7
    systems.foreach { case (name, sys, ell, lon, lat) =>
      val (x0, y0) = sys.forward(lon, lat)
      val (xe, ye) = sys.forward(lon + eps, lat)
      val (xn, yn) = sys.forward(lon, lat + eps)
      val (ax, ay) = (xe - x0, ye - y0)
      val (bx, by) = (xn - x0, yn - y0)
      val dot = ax * bx + ay * by
      val la = math.hypot(ax, ay); val lb = math.hypot(bx, by)
      assert(math.abs(dot) / (la * lb) < 1e-4, s"$name: not orthogonal (${dot / (la * lb)})")
      // point scale along parallel vs meridian, in GROUND distance:
      // parallel arc per radian = N cosφ, meridian arc = M
      val sinLat = math.sin(math.toRadians(lat))
      val w2 = 1 - ell.e2 * sinLat * sinLat
      val nRad = ell.a / math.sqrt(w2)
      val mRad = ell.a * (1 - ell.e2) / (w2 * math.sqrt(w2))
      val dRad = math.toRadians(eps)
      val kParallel = la / (nRad * math.cos(math.toRadians(lat)) * dRad)
      val kMeridian = lb / (mRad * dRad)
      assert(math.abs(kParallel - kMeridian) / kMeridian < 1e-5,
        s"$name: anisotropic scale ($kParallel vs $kMeridian)")
    }
  }

  test("round-4 CRS catalog: natural origins and landmark parity") {
    import graft.functions.Crs
    // natural origin maps exactly onto the false origin
    val origins = Seq(
      ("EPSG:2154", 3.0, 46.5, 700000.0, 6600000.0),
      ("EPSG:2193", 173.0, 0.0, 1600000.0, 10000000.0),
      ("EPSG:3577", 132.0, 0.0, 0.0, 0.0),
      ("EPSG:3006", 15.0, 0.0, 500000.0, 0.0),
      ("EPSG:3067", 27.0, 0.0, 500000.0, 0.0),
      ("EPSG:2180", 19.0, 0.0, 500000.0, -5300000.0),
      ("EPSG:3395", 0.0, 0.0, 0.0, 0.0),
      ("EPSG:5179", 127.5, 38.0, 1000000.0, 2000000.0))
    origins.foreach { case (crs, lon, lat, fe, fn) =>
      val (x, y) = Crs.resolve(crs).forward(lon, lat)
      assert(math.abs(x - fe) < 1e-6 && math.abs(y - fn) < 1e-6, s"$crs origin: ($x,$y)")
    }
    // Paris in Lambert-93 (IGN-published grid coords, ±1 m)
    val (px, py) = Crs.resolve("EPSG:2154").forward(2.3522, 48.8566)
    assert(math.abs(px - 652469.0) < 2.0 && math.abs(py - 6862035.3) < 2.0, s"paris ($px,$py)")
  }

  test("round-11 legacy-European CRS: origins, landmarks, roundtrips") {
    import graft.functions.Crs
    // grid-free natural origins map exactly onto the false origin
    val paris = 2.0 + 20.0 / 60 + 14.025 / 3600
    val o3812 = Crs.resolve("EPSG:3812").forward(4.0 + 21.0 / 60 + 33.177 / 3600,
      50.0 + 47.0 / 60 + 52.134 / 3600)
    assert(math.abs(o3812._1 - 649328.0) < 1e-6 && math.abs(o3812._2 - 665262.0) < 1e-6,
      s"3812 origin: $o3812")
    val o5110 = Crs.resolve("EPSG:5110").forward(10.5, 58.0)
    assert(math.abs(o5110._1 - 100000.0) < 1e-6 && math.abs(o5110._2 - 1000000.0) < 1e-6,
      s"5110 origin: $o5110")
    // parametric Nordic/French families: natural origin = false origin
    val o3946 = Crs.resolve("EPSG:3946").forward(3.0, 46.0) // CC46
    assert(math.abs(o3946._1 - 1700000.0) < 1e-6 && math.abs(o3946._2 - 5200000.0) < 1e-6,
      s"3946 origin: $o3946")
    val o3011 = Crs.resolve("EPSG:3011").forward(18.0, 0.0) // SWEREF99 18 00
    assert(math.abs(o3011._1 - 150000.0) < 1e-6 && math.abs(o3011._2) < 1e-6,
      s"3011 origin: $o3011")
    val o3880 = Crs.resolve("EPSG:3880").forward(26.0, 0.0) // GK26FIN
    assert(math.abs(o3880._1 - 26500000.0) < 1e-6 && math.abs(o3880._2) < 1e-6,
      s"3880 origin: $o3880")
    val o3763 = Crs.resolve("EPSG:3763").forward(
      -(8.0 + 7.0 / 60 + 59.19 / 3600), 39.0 + 40.0 / 60 + 5.73 / 3600)
    assert(math.abs(o3763._1) < 1e-6 && math.abs(o3763._2) < 1e-6, s"3763 origin: $o3763")
    val o5186 = Crs.resolve("EPSG:5186").forward(127.0, 38.0)
    assert(math.abs(o5186._1 - 200000.0) < 1e-6 && math.abs(o5186._2 - 600000.0) < 1e-6,
      s"5186 origin: $o5186")
    // POSGAR faja 5: origin at the south pole — easting exactly FE on
    // the CM, northing = the CM arc length from the pole at -34.6°
    val o5348 = Crs.resolve("EPSG:5348").forward(-60.0, -34.6)
    assert(math.abs(o5348._1 - 5500000.0) < 1e-6, s"5348 cm easting: $o5348")
    assert(o5348._2 > 6.1e6 && o5348._2 < 6.2e6, s"5348 pole-arc northing: $o5348")
    val o4647 = Crs.resolve("EPSG:4647").forward(9.0, 0.0) // UTM 32N zE-N
    assert(math.abs(o4647._1 - 32500000.0) < 1e-6 && math.abs(o4647._2) < 1e-6,
      s"4647 origin: $o4647")
    val o6372 = Crs.resolve("EPSG:6372").forward(-102.0, 12.0) // Mexico LCC
    assert(math.abs(o6372._1 - 2500000.0) < 1e-6 && math.abs(o6372._2) < 1e-6,
      s"6372 origin: $o6372")
    val o32190 = Crs.resolve("EPSG:32190").forward(-79.5, 0.0) // MTM 10
    assert(math.abs(o32190._1 - 304800.0) < 1e-6 && math.abs(o32190._2) < 1e-6,
      s"32190 origin: $o32190")
    // Lambert II étendu's inner projection origin: the datum shift is
    // bypassed by feeding the projection the NTF geodetic origin via a
    // roundtrip anchor — forward(inverse(FE, FN)) == (FE, FN)
    val ntf = Crs.resolve("EPSG:27572")
    val (plon, plat) = ntf.inverse(600000.0, 2200000.0)
    val back = ntf.forward(plon, plat)
    assert(math.abs(back._1 - 600000.0) < 0.01 && math.abs(back._2 - 2200000.0) < 0.01)
    assert(math.abs(plat - 46.8) < 0.01 && math.abs(plon - paris) < 0.01,
      s"27572 anchor not near the published zone-II origin: ($plon,$plat)")
    // city-landmark parity (public map coordinates, coarse ±1 km: a
    // wrong datum, meridian, zone constant, or false origin throws the
    // result off by 10^2-10^5 m; fine agreement is certified by the
    // SQL-replicated q_geo_transform_extended oracle row)
    val landmarks = Seq(
      ("EPSG:27572", 2.3522, 48.8566, 601150.0, 2428700.0), // Paris
      ("EPSG:31370", 4.3517, 50.8466, 148800.0, 170690.0),  // Brussels
      ("EPSG:31256", 16.3731, 48.2083, 3045.0, 341100.0),   // Vienna
      ("EPSG:31287", 14.0, 47.5, 450270.0, 400270.0),       // Austria center
      ("EPSG:28407", 37.6173, 55.7558, 7413310.0, 6182350.0), // Moscow
      ("EPSG:5110", 10.75, 59.91, 113990.0, 1212790.0),     // Oslo
      // Rome (Termini) in Gauss-Boaga zone 2: ~2.31 ME / 4.64 MN
      ("EPSG:3004", 12.5018, 41.9009, 2313000.0, 4642000.0),
      // Seoul City Hall in Korea 2000 Central Belt 2010
      ("EPSG:5186", 126.9780, 37.5665, 198060.0, 551980.0))
    landmarks.foreach { case (crs, lon, lat, ex, ey) =>
      val (x, y) = Crs.resolve(crs).forward(lon, lat)
      assert(math.abs(x - ex) < 1000 && math.abs(y - ey) < 1000,
        s"$crs landmark: ($x,$y) expected ~($ex,$ey)")
    }
    // every new code roundtrips inside its zone of use
    val zones = Seq(
      ("EPSG:27561", 2.0, 49.8), ("EPSG:27562", 2.5, 46.8), ("EPSG:27563", 3.0, 44.0),
      ("EPSG:27564", 9.0, 42.1), ("EPSG:27571", 2.0, 49.8), ("EPSG:27572", 2.5, 46.8),
      ("EPSG:27573", 3.0, 44.0), ("EPSG:27574", 9.0, 42.1),
      ("EPSG:4275", 2.0, 47.0), ("EPSG:4313", 4.5, 50.5), ("EPSG:4312", 14.0, 47.5),
      ("EPSG:4284", 40.0, 55.0),
      ("EPSG:31370", 4.5, 50.5), ("EPSG:3812", 4.5, 50.5),
      ("EPSG:31254", 10.3, 47.2), ("EPSG:31255", 13.3, 47.5), ("EPSG:31256", 16.3, 48.0),
      ("EPSG:31257", 10.3, 47.2), ("EPSG:31258", 13.3, 47.5), ("EPSG:31259", 16.3, 48.0),
      ("EPSG:31287", 13.5, 47.5),
      ("EPSG:28402", 10.0, 50.0), ("EPSG:28407", 39.5, 56.0), ("EPSG:28430", 176.5, 65.0),
      ("EPSG:5105", 5.6, 59.0), ("EPSG:5110", 10.4, 61.0), ("EPSG:5130", 30.4, 70.0),
      ("EPSG:3942", 2.0, 42.2), ("EPSG:3946", 4.5, 45.9), ("EPSG:3950", 2.5, 50.6),
      ("EPSG:3007", 12.3, 57.7), ("EPSG:3012", 14.0, 64.0), ("EPSG:3018", 23.0, 67.8),
      ("EPSG:3873", 19.2, 66.0), ("EPSG:3880", 26.2, 61.0), ("EPSG:3885", 31.0, 63.0),
      ("EPSG:3763", -8.5, 39.5), ("EPSG:4265", 12.5, 42.0),
      ("EPSG:3003", 9.2, 45.5), ("EPSG:3004", 15.0, 41.9),
      ("EPSG:5185", 126.5, 37.0), ("EPSG:5186", 127.0, 37.5),
      ("EPSG:5187", 129.1, 35.2), ("EPSG:5188", 130.9, 37.5),
      ("EPSG:5344", -71.5, -40.0), ("EPSG:5348", -58.4, -34.6),
      ("EPSG:5350", -54.6, -25.7),
      ("EPSG:4647", 9.5, 50.5), ("EPSG:5650", 14.5, 52.0),
      ("EPSG:6372", -99.1, 19.4),
      ("EPSG:32181", -53.2, 47.5), ("EPSG:32190", -79.4, 43.7),
      ("EPSG:32197", -101.0, 55.0))
    zones.foreach { case (crs, lon, lat) =>
      val sys = Crs.resolve(crs)
      val (x, y) = sys.forward(lon, lat)
      val (lonB, latB) = sys.inverse(x, y)
      assert(math.abs(lonB - lon) < 1e-7 && math.abs(latB - lat) < 1e-7,
        s"$crs roundtrip: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
  }

  test("round-4 CRS catalog roundtrips inside each zone of use") {
    import graft.functions.Crs
    val zones = Seq(
      ("EPSG:2154", 2.0, 47.0), ("EPSG:2193", 174.0, -40.0), ("EPSG:3577", 140.0, -25.0),
      ("EPSG:3006", 16.0, 60.0), ("EPSG:3067", 26.0, 63.0), ("EPSG:2180", 20.0, 52.0),
      ("EPSG:3395", 10.0, 40.0), ("EPSG:5179", 127.0, 37.0), ("EPSG:3414", 103.85, 1.35),
      ("EPSG:2157", -7.5, 53.2), ("EPSG:29902", -7.5, 53.2), ("EPSG:29903", -7.5, 53.2),
      ("EPSG:27700", -1.5, 52.5), ("EPSG:31467", 9.5, 48.5), ("EPSG:23031", 2.0, 41.5),
      ("EPSG:25832", 10.0, 50.0), ("EPSG:28355", 145.0, -37.0), ("EPSG:7855", 145.0, -37.0),
      ("EPSG:31983", -46.0, -23.0), ("EPSG:6677", 139.7, 35.7),
      ("EPSG:3031", 120.0, -75.0), ("EPSG:3413", -40.0, 75.0), ("EPSG:3995", 10.0, 78.0),
      ("EPSG:3034", 10.0, 50.0), ("EPSG:5243", 10.0, 51.0), ("EPSG:3112", 134.0, -25.0),
      ("EPSG:3005", -124.0, 54.0), ("ESRI:102008", -96.0, 40.0))
    samples(Gen.zip(Gen.chooseNum(-0.3, 0.3), Gen.chooseNum(-0.3, 0.3)), 15).foreach {
      case (dx, dy) =>
        zones.foreach { case (crs, lon0, lat0) =>
          val (lon, lat) = (lon0 + dx, lat0 + dy)
          val sys = Crs.resolve(crs)
          val (x, y) = sys.forward(lon, lat)
          val (lonB, latB) = sys.inverse(x, y)
          // datum-shifted chains include the approximate Helmert reverse
          // (negated parameters), good to ~1e-7 deg; exact chains ~1e-9
          assert(math.abs(lonB - lon) < 1e-6 && math.abs(latB - lat) < 1e-6,
            s"$crs roundtrip: ($lon,$lat) -> ($lonB,$latB)")
        }
    }
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
