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
}
