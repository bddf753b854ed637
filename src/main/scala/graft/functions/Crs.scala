package graft.functions

import org.locationtech.jts.geom.{Coordinate, Geometry}

/**
 * Minimal CRS transform engine for ST_Transform (reference:
 * spatial/src/spatial/proj/functions.cpp — full PROJ). PROJ/proj4j is
 * not available offline, so we implement the published projection math
 * (Snyder, USGS PP 1395; Karney/Krüger series) for the CRS families
 * that appear in the reference tests and common workloads:
 *
 *  - EPSG:4326  WGS84 geographic (authority axis order lat/lon)
 *  - EPSG:4269  NAD83 geographic (treated as WGS84-compatible datum)
 *  - EPSG:3857  WGS84 Web Mercator
 *  - EPSG:326xx/327xx WGS84 UTM, EPSG:269xx NAD83(GRS80) UTM
 *  - NAD83 State Plane zones (Lambert Conformal Conic 2SP and
 *    Transverse Mercator, US survey feet or meters) — the zones real
 *    datasets use (e.g. NYC taxi zones are EPSG:2263).
 *
 * `always_xy` mirrors PROJ's flag (proj/functions.cpp:64-81): when
 * false, geographic CRSs use authority order (lat,lon); when true,
 * everything is lon/lat ("GIS friendly") — reference test
 * test/sql/proj.test:1-13 documents this behavior.
 */
object Crs {

  /** (semi-major axis, flattening) */
  final case class Ellipsoid(a: Double, f: Double) {
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
  }
  val WGS84: Ellipsoid = Ellipsoid(6378137.0, 1.0 / 298.257223563)
  val GRS80: Ellipsoid = Ellipsoid(6378137.0, 1.0 / 298.257222101)
  // legacy national ellipsoids (datum-shifted CRSs below)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 1.0 / 299.3249646)
  val AiryModified: Ellipsoid = Ellipsoid(6377340.189, 1.0 / 299.3249646)
  val Bessel1841: Ellipsoid = Ellipsoid(6377397.155, 1.0 / 299.1528128)
  val International1924: Ellipsoid = Ellipsoid(6378388.0, 1.0 / 297.0)
  val Clarke1866: Ellipsoid = Ellipsoid(6378206.4, 1.0 / 294.978698213898)
  // EPSG ellipsoid 7011 (a/b defined): 1/f = a/(a-b) = 6378249.2/21734.2
  val Clarke1880IGN: Ellipsoid = Ellipsoid(6378249.2, 21734.2 / 6378249.2)
  val Krassowsky1940: Ellipsoid = Ellipsoid(6378245.0, 1.0 / 298.3)

  /** meters per US survey foot (exact: 1200/3937) */
  val FtUs: Double = 1200.0 / 3937.0

  sealed trait System {
    /** project lon/lat (degrees) → crs coords */
    def forward(lon: Double, lat: Double): (Double, Double)
    /** crs coords → lon/lat degrees */
    def inverse(x: Double, y: Double): (Double, Double)
    def geographic: Boolean = false
  }

  private object Geographic extends System {
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
    override def geographic: Boolean = true
  }

  private object WebMercator extends System {
    private val A = WGS84.a
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val x = A * math.toRadians(lon)
      val y = A * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lon = math.toDegrees(x / A)
      val lat = math.toDegrees(2 * math.atan(math.exp(y / A)) - math.Pi / 2)
      (lon, lat)
    }
  }

  /** Projected system re-expressed in another linear unit (US survey
   *  feet for most state-plane zones). */
  private final class Scaled(inner: System, metersPerUnit: Double) extends System {
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val (x, y) = inner.forward(lon, lat)
      (x / metersPerUnit, y / metersPerUnit)
    }
    def inverse(x: Double, y: Double): (Double, Double) =
      inner.inverse(x * metersPerUnit, y * metersPerUnit)
  }

  /** Transverse Mercator via the Krüger n-series (6 terms), the same
   *  published algorithm PROJ's etmerc uses; accurate to <0.1 mm.
   *  Generalized over ellipsoid, natural origin (lat0/lon0), scale
   *  factor and false origin so it serves both UTM and the TM
   *  state-plane zones. */
  private final class TransMerc(
      ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double, k0: Double,
      falseE: Double, falseN: Double) extends System {
    private val e2 = ell.e2
    private val n = ell.f / (2 - ell.f)
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    private val AA = ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val lon0 = math.toRadians(lon0Deg)
    private val alpha = Array(
      0.0,
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
    private val beta = Array(
      0.0,
      n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
      1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
      17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
      4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
      4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
      20648693.0 / 638668800 * n6)

    /** ξ for a point on the central meridian at latitude `latDeg` (η=0). */
    private def xiOf(latDeg: Double): Double = {
      val lat = math.toRadians(latDeg)
      val t = math.sinh(atanh(math.sin(lat)) - ell.e * atanh(ell.e * math.sin(lat)))
      val xiP = math.atan(t)
      var xi = xiP
      var j = 1
      while (j <= 6) { xi += alpha(j) * math.sin(2 * j * xiP); j += 1 }
      xi
    }
    // meridian-arc northing of the natural origin (0 for UTM's lat0=0)
    private val m0 = if (lat0Deg == 0.0) 0.0 else k0 * AA * xiOf(lat0Deg)

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      val lon = math.toRadians(lonD) - lon0
      val t = math.sinh(atanh(math.sin(lat)) - ell.e * atanh(ell.e * math.sin(lat)))
      val xiP = math.atan2(t, math.cos(lon))
      val etaP = atanh(math.sin(lon) / math.sqrt(1 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 6) {
        xi += alpha(j) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alpha(j) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
        j += 1
      }
      (falseE + k0 * AA * eta, falseN + k0 * AA * xi - m0)
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val xi = (yIn - falseN + m0) / (k0 * AA)
      val eta = (xIn - falseE) / (k0 * AA)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 6) {
        xiP -= beta(j) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      // fixed-point iteration conformal → geodetic latitude:
      // lat = asin(tanh(atanh(sin(chi)) + e*atanh(e*sin(lat))))
      var lat = chi
      var k = 0
      var prev = 0.0
      do {
        prev = lat
        lat = math.asin(math.tanh(atanh(math.sin(chi)) + ell.e * atanh(ell.e * math.sin(lat))))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      val lon = lon0 + math.atan2(math.sinh(etaP), math.cos(xiP))
      // normalize: zones whose CM sits past the antimeridian (Pulkovo
      // GK 31-32, lon0 183°/189°) would otherwise return lon > 180
      val lonDeg = math.toDegrees(lon)
      val lonNorm =
        if (lonDeg > 180.0) lonDeg - 360.0
        else if (lonDeg <= -180.0) lonDeg + 360.0
        else lonDeg
      (lonNorm, math.toDegrees(lat))
    }
  }

  /** Lambert Conformal Conic (2SP), Snyder PP 1395 pp. 104-110. */
  private final class Lcc2sp(
      ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      sp1Deg: Double, sp2Deg: Double, falseE: Double, falseN: Double) extends System {
    private val e = ell.e
    private val lon0 = math.toRadians(lon0Deg)

    private def mOf(lat: Double): Double =
      math.cos(lat) / math.sqrt(1 - ell.e2 * math.sin(lat) * math.sin(lat))
    private def tOf(lat: Double): Double =
      math.tan(math.Pi / 4 - lat / 2) /
        math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2)

    private val p1 = math.toRadians(sp1Deg)
    private val p2 = math.toRadians(sp2Deg)
    private val p0 = math.toRadians(lat0Deg)
    private val nCone =
      (math.log(mOf(p1)) - math.log(mOf(p2))) / (math.log(tOf(p1)) - math.log(tOf(p2)))
    private val bigF = mOf(p1) / (nCone * math.pow(tOf(p1), nCone))
    private val rho0 = ell.a * bigF * math.pow(tOf(p0), nCone)

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      val theta = nCone * (math.toRadians(lonD) - lon0)
      val rho = ell.a * bigF * math.pow(tOf(lat), nCone)
      (falseE + rho * math.sin(theta), falseN + rho0 - rho * math.cos(theta))
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val dx = xIn - falseE
      val dy = rho0 - (yIn - falseN)
      val sgn = if (nCone >= 0) 1.0 else -1.0
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val t = math.pow(rho / (ell.a * bigF), 1 / nCone)
      // iterate lat = pi/2 - 2*atan(t * ((1-e sin lat)/(1+e sin lat))^(e/2))
      var lat = math.Pi / 2 - 2 * math.atan(t)
      var k = 0
      var prev = 0.0
      do {
        prev = lat
        lat = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      (math.toDegrees(theta / nCone + lon0), math.toDegrees(lat))
    }
  }

  /** Lambert Conic Conformal 1SP (EPSG 9801; Snyder PP 1395 with the
   *  single standard parallel and a scale factor): n = sin(φ1),
   *  ρ = a·F·k0·t^n. The legacy French Lambert zones (NTF / Lambert
   *  I-IV) are the canonical users. EPSG 9801 puts the latitude of
   *  origin ON the standard parallel; PROJ's `+proj=lcc +lat_1=…
   *  +lat_0=…` lets them differ (ρ0 is then evaluated at lat_0), so
   *  the reference latitude is a separate parameter defaulting to the
   *  parallel. */
  private final class Lcc1sp(
      ell: Ellipsoid, spDeg: Double, lon0Deg: Double,
      k0: Double, falseE: Double, falseN: Double,
      lat0RefDeg: Option[Double] = None) extends System {
    private val e = ell.e
    private val lon0 = math.toRadians(lon0Deg)
    private def tOf(lat: Double): Double =
      math.tan(math.Pi / 4 - lat / 2) /
        math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2)
    private val p0 = math.toRadians(spDeg)
    private val nCone = math.sin(p0)
    require(nCone != 0.0,
      "LCC 1SP needs a non-zero standard parallel (lat_1 / latitude of origin)")
    private val m0 = math.cos(p0) / math.sqrt(1 - ell.e2 * math.sin(p0) * math.sin(p0))
    private val bigF = m0 / (nCone * math.pow(tOf(p0), nCone))
    private val aFk = ell.a * bigF * k0
    private val rho0 =
      aFk * math.pow(tOf(math.toRadians(lat0RefDeg.getOrElse(spDeg))), nCone)

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      val theta = nCone * (math.toRadians(lonD) - lon0)
      val rho = aFk * math.pow(tOf(lat), nCone)
      (falseE + rho * math.sin(theta), falseN + rho0 - rho * math.cos(theta))
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val dx = xIn - falseE
      val dy = rho0 - (yIn - falseN)
      val sgn = if (nCone >= 0) 1.0 else -1.0
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val t = math.pow(rho / aFk, 1 / nCone)
      var lat = math.Pi / 2 - 2 * math.atan(t)
      var k = 0
      var prev = 0.0
      do {
        prev = lat
        lat = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      (math.toDegrees(theta / nCone + lon0), math.toDegrees(lat))
    }
  }

  /** Authalic-latitude machinery shared by the equal-area projections
   *  (Snyder PP 1395 eq. 3-12 / 14-15 and the φ-from-q iteration of
   *  eq. 3-16). */
  private final class EqualAreaHelper(ell: Ellipsoid) {
    val e: Double = ell.e; val e2: Double = ell.e2
    def mOf(lat: Double): Double =
      math.cos(lat) / math.sqrt(1 - e2 * math.sin(lat) * math.sin(lat))
    def qOf(lat: Double): Double = {
      val s = math.sin(lat)
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    val qPole: Double = qOf(math.Pi / 2)
    /** geodetic latitude from the authalic function value q (eq. 3-16) */
    def latFromQ(qv: Double): Double = {
      if (math.abs(qv) >= qPole - 1e-14) return if (qv > 0) math.Pi / 2 else -math.Pi / 2
      var lat = math.asin(math.max(-1.0, math.min(1.0, qv / 2)))
      var k = 0
      var prev = 0.0
      do {
        prev = lat
        val s = math.sin(lat)
        val d = 1 - e2 * s * s
        lat += d * d / (2 * math.cos(lat)) *
          (qv / (1 - e2) - s / d + (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      lat
    }
  }

  /** Albers Equal-Area Conic (2SP), Snyder PP 1395 pp. 98-103
   *  (eqs. 14-1..14-21) — the projection behind EPSG:5070/6350
   *  (CONUS Albers) and the continent-scale equal-area grids. */
  private final class Albers2sp(
      ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      sp1Deg: Double, sp2Deg: Double, falseE: Double, falseN: Double) extends System {
    private val h = new EqualAreaHelper(ell)
    private val lon0 = math.toRadians(lon0Deg)
    private val p1 = math.toRadians(sp1Deg)
    private val p2 = math.toRadians(sp2Deg)
    private val m1 = h.mOf(p1)
    private val nCone = (m1 * m1 - h.mOf(p2) * h.mOf(p2)) / (h.qOf(p2) - h.qOf(p1))
    private val bigC = m1 * m1 + nCone * h.qOf(p1)
    private def rhoOf(qv: Double): Double = ell.a * math.sqrt(bigC - nCone * qv) / nCone
    private val rho0 = rhoOf(h.qOf(math.toRadians(lat0Deg)))

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val theta = nCone * (math.toRadians(lonD) - lon0)
      val rho = rhoOf(h.qOf(math.toRadians(latD)))
      (falseE + rho * math.sin(theta), falseN + rho0 - rho * math.cos(theta))
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val dx = xIn - falseE
      val dy = rho0 - (yIn - falseN)
      val sgn = if (nCone >= 0) 1.0 else -1.0
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val qv = (bigC - rho * rho * nCone * nCone / (ell.a * ell.a)) / nCone
      (math.toDegrees(theta / nCone + lon0), math.toDegrees(h.latFromQ(qv)))
    }
  }

  /** Lambert Azimuthal Equal-Area, oblique ellipsoidal case, Snyder
   *  PP 1395 pp. 187-190 (eqs. 24-2..24-14, 3-11/3-12) — the
   *  projection behind EPSG:3035 (the EU statistical grid). */
  private final class Laea(
      ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      falseE: Double, falseN: Double) extends System {
    private val h = new EqualAreaHelper(ell)
    private val lon0 = math.toRadians(lon0Deg)
    private val p0 = math.toRadians(lat0Deg)
    private val beta1 = math.asin(h.qOf(p0) / h.qPole)
    private val rq = ell.a * math.sqrt(h.qPole / 2)
    private val bigD = ell.a * h.mOf(p0) / (rq * math.cos(beta1))
    private val sinB1 = math.sin(beta1); private val cosB1 = math.cos(beta1)

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val dl = math.toRadians(lonD) - lon0
      val beta = math.asin(math.max(-1.0, math.min(1.0, h.qOf(math.toRadians(latD)) / h.qPole)))
      val b = rq * math.sqrt(2 / (1 + sinB1 * math.sin(beta) + cosB1 * math.cos(beta) * math.cos(dl)))
      val x = b * bigD * math.cos(beta) * math.sin(dl)
      val y = (b / bigD) * (cosB1 * math.sin(beta) - sinB1 * math.cos(beta) * math.cos(dl))
      (falseE + x, falseN + y)
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val dx = xIn - falseE
      val dy = yIn - falseN
      val rho = math.sqrt((dx / bigD) * (dx / bigD) + (bigD * dy) * (bigD * dy))
      if (rho < 1e-12) return (math.toDegrees(lon0), math.toDegrees(p0))
      val ce = 2 * math.asin(math.max(-1.0, math.min(1.0, rho / (2 * rq))))
      val qv = h.qPole * (math.cos(ce) * sinB1 + bigD * dy * math.sin(ce) * cosB1 / rho)
      val lon = lon0 + math.atan2(dx * math.sin(ce),
        bigD * rho * cosB1 * math.cos(ce) - bigD * bigD * dy * sinB1 * math.sin(ce))
      (math.toDegrees(lon), math.toDegrees(h.latFromQ(qv)))
    }
  }

  private def atanh(v: Double): Double = 0.5 * math.log((1 + v) / (1 - v))

  /** Ellipsoidal Mercator 1SP (Snyder PP 1395 eqs. 7-6..7-10) — the
   *  projection behind EPSG:3395 (World Mercator). */
  private final class Mercator1sp(
      ell: Ellipsoid, lon0Deg: Double, k0: Double,
      falseE: Double, falseN: Double) extends System {
    private val lon0 = math.toRadians(lon0Deg)
    private val e = ell.e
    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      val x = falseE + ell.a * k0 * (math.toRadians(lonD) - lon0)
      val y = falseN + ell.a * k0 * math.log(math.tan(math.Pi / 4 + lat / 2) *
        math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2))
      (x, y)
    }
    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val t = math.exp(-(yIn - falseN) / (ell.a * k0))
      var lat = math.Pi / 2 - 2 * math.atan(t)
      var k = 0; var prev = 0.0
      do {
        prev = lat
        lat = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      (math.toDegrees(lon0 + (xIn - falseE) / (ell.a * k0)), math.toDegrees(lat))
    }
  }

  /** Polar Stereographic variant B (standard parallel, Snyder PP 1395
   *  eqs. 21-33..21-41 / EPSG guidance 7-2 §3.2.4) — EPSG:3031
   *  (Antarctic), EPSG:3413/3995 (Arctic sea-ice grids). */
  private final class PolarStereo(
      ell: Ellipsoid, latTsDeg: Double, lon0Deg: Double,
      falseE: Double, falseN: Double) extends System {
    private val south = latTsDeg < 0
    private val e = ell.e
    private val lon0 = math.toRadians(lon0Deg)
    private def tOf(lat: Double): Double = // north-aspect isometric factor
      math.tan(math.Pi / 4 - lat / 2) /
        math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2)
    private val ts = math.toRadians(math.abs(latTsDeg))
    private val mc = math.cos(ts) / math.sqrt(1 - ell.e2 * math.sin(ts) * math.sin(ts))
    private val tc = tOf(ts)
    def forward(lonD: Double, latD: Double): (Double, Double) = {
      // south aspect = north formulas with (lat, dl) negated, (x, y) negated
      val lat = math.toRadians(if (south) -latD else latD)
      val dl0 = math.toRadians(lonD) - lon0
      val dl = if (south) -dl0 else dl0
      val rho = ell.a * mc * tOf(lat) / tc
      val x = rho * math.sin(dl)
      val y = -rho * math.cos(dl)
      if (south) (falseE - x, falseN - y) else (falseE + x, falseN + y)
    }
    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val x = if (south) -(xIn - falseE) else xIn - falseE
      val y = if (south) -(yIn - falseN) else yIn - falseN
      val rho = math.sqrt(x * x + y * y)
      if (rho < 1e-12) return (lon0Deg, if (south) -90.0 else 90.0)
      val t = rho * tc / (ell.a * mc)
      var lat = math.Pi / 2 - 2 * math.atan(t)
      var k = 0; var prev = 0.0
      do {
        prev = lat
        lat = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      val dl = math.atan2(x, -y)
      val (lonR, latR) = if (south) (lon0 - dl, -lat) else (lon0 + dl, lat)
      (math.toDegrees(lonR), math.toDegrees(latR))
    }
  }

  /** Polar Stereographic variant A (EPSG method 9810): the scale
   *  factor is given AT the pole (UPS: k0 = 0.994), so
   *  ρ = 2·a·k0·t / √((1+e)^(1+e)·(1-e)^(1-e)) — EPSG Guidance Note 7-2
   *  formulas; the t/iteration machinery matches [[PolarStereo]]. */
  private final class PolarStereoA(
      ell: Ellipsoid, k0: Double, lon0Deg: Double,
      falseE: Double, falseN: Double, south: Boolean) extends System {
    private val e = ell.e
    private val lon0 = math.toRadians(lon0Deg)
    private val bigK = 2.0 * ell.a * k0 /
      math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
    private def tOf(lat: Double): Double =
      math.tan(math.Pi / 4 - lat / 2) /
        math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2)
    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(if (south) -latD else latD)
      val dl0 = math.toRadians(lonD) - lon0
      val dl = if (south) -dl0 else dl0
      val rho = bigK * tOf(lat)
      val x = rho * math.sin(dl)
      val y = -rho * math.cos(dl)
      if (south) (falseE - x, falseN - y) else (falseE + x, falseN + y)
    }
    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val x = if (south) -(xIn - falseE) else xIn - falseE
      val y = if (south) -(yIn - falseN) else yIn - falseN
      val rho = math.sqrt(x * x + y * y)
      if (rho < 1e-12) return (lon0Deg, if (south) -90.0 else 90.0)
      val t = rho / bigK
      var lat = math.Pi / 2 - 2 * math.atan(t)
      var k = 0; var prev = 0.0
      do {
        prev = lat
        lat = math.Pi / 2 - 2 * math.atan(
          t * math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      val dl = math.atan2(x, -y)
      val (lonR, latR) = if (south) (lon0 - dl, -lat) else (lon0 + dl, lat)
      (math.toDegrees(lonR), math.toDegrees(latR))
    }
  }

  /** Equidistant Cylindrical with the equator as standard parallel
   *  (EPSG method 1028 at lat_ts = 0 — EPSG:4087's definition):
   *  x = a·(λ-λ0), y = M(φ). The meridian arc reuses [[TransMerc]]'s
   *  Krüger series (a k0=1 TM evaluated on the central meridian IS the
   *  arc), so the engine has exactly one arc implementation. */
  private final class EquidistCyl(
      ell: Ellipsoid, lon0Deg: Double, falseE: Double, falseN: Double) extends System {
    private val arcTm = new TransMerc(ell, 0.0, lon0Deg, 1.0, 0.0, 0.0)
    private val lon0 = math.toRadians(lon0Deg)
    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val x = falseE + ell.a * (math.toRadians(lonD) - lon0)
      val y = falseN + arcTm.forward(lon0Deg, latD)._2
      (x, y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lon = math.toDegrees(lon0 + (x - falseE) / ell.a)
      val lat = arcTm.inverse(0.0, y - falseN)._2
      (lon, lat)
    }
  }

  /** Oblique Stereographic (EPSG method 9809, Guidance 7-2 §3.2.1 —
   *  conformal-sphere double projection). The projection behind
   *  EPSG:28992 (Amersfoort / RD New, the Dutch national grid). */
  private final class ObliqueStereo(
      ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double, k0: Double,
      falseE: Double, falseN: Double) extends System {
    private val e = ell.e; private val e2 = ell.e2
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private val sin0 = math.sin(lat0); private val cos0 = math.cos(lat0)
    // Gaussian radius of curvature at the origin
    private val rho0 = ell.a * (1 - e2) / math.pow(1 - e2 * sin0 * sin0, 1.5)
    private val nu0 = ell.a / math.sqrt(1 - e2 * sin0 * sin0)
    private val bigR = math.sqrt(rho0 * nu0)
    private val n = math.sqrt(1 + e2 * math.pow(cos0, 4) / (1 - e2))
    private val s1 = (1 + sin0) / (1 - sin0)
    private val s2 = (1 - e * sin0) / (1 + e * sin0)
    private val w1 = math.pow(s1 * math.pow(s2, e), n)
    private val sinChi0a = (w1 - 1) / (w1 + 1)
    private val c = (n + sin0) * (1 - sinChi0a) / ((n - sin0) * (1 + sinChi0a))
    private val w2 = c * w1
    private val chi0 = math.asin((w2 - 1) / (w2 + 1))
    private val sinChi0 = math.sin(chi0); private val cosChi0 = math.cos(chi0)

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      val lam = n * (math.toRadians(lonD) - lon0) + lon0
      val sa = (1 + math.sin(lat)) / (1 - math.sin(lat))
      val sb = (1 - e * math.sin(lat)) / (1 + e * math.sin(lat))
      val w = c * math.pow(sa * math.pow(sb, e), n)
      val chi = math.asin((w - 1) / (w + 1))
      val dl = lam - lon0
      val b = 1 + math.sin(chi) * sinChi0 + math.cos(chi) * cosChi0 * math.cos(dl)
      val x = falseE + 2 * bigR * k0 * math.cos(chi) * math.sin(dl) / b
      val y = falseN + 2 * bigR * k0 *
        (math.sin(chi) * cosChi0 - math.cos(chi) * sinChi0 * math.cos(dl)) / b
      (x, y)
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val ep = xIn - falseE; val np = yIn - falseN
      val g = 2 * bigR * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * bigR * k0 * math.tan(chi0) + g
      val i = math.atan2(ep, h + np)
      val j = math.atan2(ep, g - np) - i
      val chi = chi0 + 2 * math.atan((np - ep * math.tan(j / 2)) / (2 * bigR * k0))
      val lam = j + 2 * i + lon0
      val lon = (lam - lon0) / n + lon0
      // conformal -> geodetic latitude (isometric-latitude Newton steps)
      val psi = 0.5 * math.log((1 + math.sin(chi)) / (c * (1 - math.sin(chi)))) / n
      var lat = 2 * math.atan(math.exp(psi)) - math.Pi / 2
      var k = 0; var prev = 0.0
      do {
        prev = lat
        val s = math.sin(lat)
        val psiI = math.log(math.tan(lat / 2 + math.Pi / 4) *
          math.pow((1 - e * s) / (1 + e * s), e / 2))
        lat = lat - (psiI - psi) * math.cos(lat) * (1 - e2 * s * s) / (1 - e2)
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** Swiss Oblique Mercator ("Swiss Oblique Cylindrical", EPSG method
   *  9814 — Rosenmund 1903, swisstopo's published rigorous formulas):
   *  a triple projection — ellipsoid → conformal sphere at the origin
   *  (Gaussian radius R, meridian-convergence factor α, constant K),
   *  sphere rotation carrying the origin to the pseudo-equator, then
   *  an equatorial spherical Mercator. The projection behind
   *  EPSG:2056 (CH1903+ / LV95) and EPSG:21781 (CH1903 / LV03). */
  private final class SwissOblique(
      ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      falseE: Double, falseN: Double) extends System {
    private val e = ell.e; private val e2 = ell.e2
    private val p0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private val sin0 = math.sin(p0)
    // Gaussian radius of curvature at the origin
    private val bigR = ell.a * math.sqrt(1 - e2) / (1 - e2 * sin0 * sin0)
    private val alpha = math.sqrt(1 + e2 / (1 - e2) * math.pow(math.cos(p0), 4))
    private val b0 = math.asin(sin0 / alpha)
    private val bigK = math.log(math.tan(math.Pi / 4 + b0 / 2)) -
      alpha * math.log(math.tan(math.Pi / 4 + p0 / 2)) +
      alpha * e / 2 * math.log((1 + e * sin0) / (1 - e * sin0))
    private val sinB0 = math.sin(b0); private val cosB0 = math.cos(b0)

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      // ellipsoid -> conformal sphere (S = α·ψ(φ) + K, b = gd(S))
      val s = alpha * math.log(math.tan(math.Pi / 4 + lat / 2)) -
        alpha * e / 2 * math.log((1 + e * math.sin(lat)) / (1 - e * math.sin(lat))) + bigK
      val b = 2 * (math.atan(math.exp(s)) - math.Pi / 4)
      val l = alpha * (math.toRadians(lonD) - lon0)
      // rotate (b0, 0) to the pseudo-equator origin
      val bBar = math.asin(cosB0 * math.sin(b) - sinB0 * math.cos(b) * math.cos(l))
      val lBar = math.atan2(math.cos(b) * math.sin(l),
        cosB0 * math.cos(b) * math.cos(l) + sinB0 * math.sin(b))
      (falseE + bigR * lBar, falseN + bigR * atanh(math.sin(bBar)))
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val lBar = (xIn - falseE) / bigR
      val bBar = 2 * math.atan(math.exp((yIn - falseN) / bigR)) - math.Pi / 2
      // reverse rotation
      val b = math.asin(cosB0 * math.sin(bBar) + sinB0 * math.cos(bBar) * math.cos(lBar))
      val l = math.atan2(math.cos(bBar) * math.sin(lBar),
        cosB0 * math.cos(bBar) * math.cos(lBar) - sinB0 * math.sin(bBar))
      val lon = lon0 + l / alpha
      // conformal-sphere latitude -> geodetic (isometric fixed point)
      val psi = (math.log(math.tan(math.Pi / 4 + b / 2)) - bigK) / alpha
      var lat = b
      var k = 0; var prev = 0.0
      do {
        prev = lat
        lat = 2 * math.atan(math.exp(psi +
          e / 2 * math.log((1 + e * math.sin(lat)) / (1 - e * math.sin(lat))))) - math.Pi / 2
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** Krovak oblique conformal conic (EPSG method 9819/1041; Guidance
   *  Note 7-2 "Krovak" worked formulas) — the S-JTSK projection behind
   *  EPSG:5514 (Czechia/Slovakia). Ellipsoid → conformal sphere via
   *  the Gaussian B exponent, rotation to the oblique pole at azimuth
   *  αc, then a conic at the pseudo standard parallel φp. Outputs the
   *  East-North orientation (PROJ's `+proj=krovak`): x = −westing,
   *  y = −southing — negative over the whole valid area. */
  private final class Krovak(
      ell: Ellipsoid, latCDeg: Double, lon0Deg: Double, alphaDeg: Double,
      latPDeg: Double, k0: Double, falseE: Double, falseN: Double) extends System {
    private val e = ell.e; private val e2 = ell.e2
    private val phiC = math.toRadians(latCDeg)
    private val lon0 = math.toRadians(lon0Deg)
    private val alphaC = math.toRadians(alphaDeg)
    private val phiP = math.toRadians(latPDeg)
    private val bigA = ell.a * math.sqrt(1 - e2) /
      (1 - e2 * math.sin(phiC) * math.sin(phiC))
    private val bigB = math.sqrt(1 + e2 * math.pow(math.cos(phiC), 4) / (1 - e2))
    private val gamma0 = math.asin(math.sin(phiC) / bigB)
    private val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1 + e * math.sin(phiC)) / (1 - e * math.sin(phiC)), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bigB)
    private val n = math.sin(phiP)
    private val r0 = k0 * bigA / math.tan(phiP)
    // r(T) = rN / tan^n(T/2 + π/4) with rN = r0·tan^n(π/4 + φp/2)
    private val rN = r0 * math.pow(math.tan(math.Pi / 4 + phiP / 2), n)
    private val sinA = math.sin(alphaC); private val cosA = math.cos(alphaC)

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      val u = 2 * (math.atan(t0 * math.pow(math.tan(lat / 2 + math.Pi / 4), bigB) /
        math.pow((1 + e * math.sin(lat)) / (1 - e * math.sin(lat)), e * bigB / 2)) -
        math.Pi / 4)
      val v = bigB * (lon0 - math.toRadians(lonD))
      val t = math.asin(cosA * math.sin(u) + sinA * math.cos(u) * math.cos(v))
      val d = math.asin(math.cos(u) * math.sin(v) / math.cos(t))
      val r = rN / math.pow(math.tan(t / 2 + math.Pi / 4), n)
      // southing = r cos(nD), westing = r sin(nD); East-North negates
      (falseE - r * math.sin(n * d), falseN - r * math.cos(n * d))
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val westing = -(xIn - falseE)
      val southing = -(yIn - falseN)
      val r = math.sqrt(westing * westing + southing * southing)
      val theta = math.atan2(westing, southing)
      val d = theta / n
      val t = 2 * (math.atan(math.pow(rN / r, 1.0 / n)) - math.Pi / 4)
      val u = math.asin(cosA * math.sin(t) - sinA * math.cos(t) * math.cos(d))
      val v = math.asin(math.cos(t) * math.sin(d) / math.cos(u))
      // conformal latitude U -> geodetic (fixed point, EPSG iteration)
      var lat = u
      var k = 0; var prev = 0.0
      do {
        prev = lat
        lat = 2 * (math.atan(math.pow(t0, -1.0 / bigB) *
          math.pow(math.tan(u / 2 + math.Pi / 4), 1.0 / bigB) *
          math.pow((1 + e * math.sin(lat)) / (1 - e * math.sin(lat)), e / 2)) -
          math.Pi / 4)
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      (math.toDegrees(lon0 - v / bigB), math.toDegrees(lat))
    }
  }

  /**
   * 7-parameter Helmert transformation (position-vector convention,
   * EPSG method 9606), parameters LOCAL datum → WGS84. Rotations in
   * arc-seconds, scale in ppm. The reverse direction negates the
   * parameters (EPSG's documented approximation; sub-mm for the
   * parameter magnitudes in this catalog — what PROJ does absent a
   * grid). Geodetic↔geocentric uses h=0 and Bowring's closed-form
   * inverse (sub-0.1 mm at surface heights), so the whole chain is a
   * fixed arithmetic sequence replicable by the SQL oracle.
   */
  final case class Helmert(
      tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, dsPpm: Double)

  private def helmertShift(
      lonD: Double, latD: Double, from: Ellipsoid, to: Ellipsoid,
      h: Helmert, sign: Int): (Double, Double) = {
    val lon = math.toRadians(lonD); val lat = math.toRadians(latD)
    // geodetic (h=0) -> geocentric on `from`
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    val nu = from.a / math.sqrt(1 - from.e2 * sinLat * sinLat)
    val x0 = nu * cosLat * math.cos(lon)
    val y0 = nu * cosLat * math.sin(lon)
    val z0 = nu * (1 - from.e2) * sinLat
    // position-vector Helmert, direction via sign
    val as = math.Pi / (180.0 * 3600.0)
    val rx = sign * h.rxSec * as; val ry = sign * h.rySec * as; val rz = sign * h.rzSec * as
    val m = 1 + sign * h.dsPpm * 1e-6
    val x1 = m * (x0 - rz * y0 + ry * z0) + sign * h.tx
    val y1 = m * (rz * x0 + y0 - rx * z0) + sign * h.ty
    val z1 = m * (-ry * x0 + rx * y0 + z0) + sign * h.tz
    // geocentric -> geodetic on `to` (Bowring closed form)
    val b = to.a * (1 - to.f)
    val ep2 = to.e2 / (1 - to.e2)
    val p = math.sqrt(x1 * x1 + y1 * y1)
    val theta = math.atan2(z1 * to.a, p * b)
    val latOut = math.atan2(
      z1 + ep2 * b * math.pow(math.sin(theta), 3),
      p - to.e2 * to.a * math.pow(math.cos(theta), 3))
    (math.toDegrees(math.atan2(y1, x1)), math.toDegrees(latOut))
  }

  /** A projected system on a non-WGS84 datum: geodetic coordinates
   *  shift through the Helmert transform on the way in/out, so the
   *  System contract (WGS84 lon/lat <-> CRS coords) is preserved. */
  private final class DatumShifted(inner: System, ell: Ellipsoid, h: Helmert) extends System {
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val (llon, llat) = helmertShift(lon, lat, WGS84, ell, h, -1)
      inner.forward(llon, llat)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (llon, llat) = inner.inverse(x, y)
      helmertShift(llon, llat, ell, WGS84, h, +1)
    }
  }

  /** Datum bridge that PREFERS an NTv2 grid (when the session's
   *  `spark.graft.crs.gridDir` holds a SYSTEM_F=`from` SYSTEM_T=`to`
   *  file — reference proj/functions.cpp:488-517 applies PROJ's
   *  embedded grids the same way) and falls back to the parametric
   *  Helmert otherwise, so accuracy degrades gracefully, never
   *  availability. Grid lookup is per-call (a cached map read) so a
   *  conf change is honored even for cached System instances. */
  private def bridgeToLocal(lon: Double, lat: Double,
      ell: Ellipsoid, h: Helmert, from: String, to: String): (Double, Double) =
    Ntv2.gridFor(from, to).flatMap(_.inverse(lon, lat))
      .getOrElse(helmertShift(lon, lat, WGS84, ell, h, -1))

  private def bridgeToWgs(lon: Double, lat: Double,
      ell: Ellipsoid, h: Helmert, from: String, to: String): (Double, Double) =
    Ntv2.gridFor(from, to).flatMap(_.forward(lon, lat))
      .getOrElse(helmertShift(lon, lat, ell, WGS84, h, +1))

  /** Geographic CRS on a grid-shiftable datum (e.g. EPSG:4267 NAD27). */
  private final class GridGeographic(
      ell: Ellipsoid, h: Helmert, from: String, to: String) extends System {
    def forward(lon: Double, lat: Double): (Double, Double) =
      bridgeToLocal(lon, lat, ell, h, from, to)
    def inverse(x: Double, y: Double): (Double, Double) =
      bridgeToWgs(x, y, ell, h, from, to)
    override def geographic: Boolean = true
  }

  /** Projected CRS on a grid-shiftable datum (e.g. NAD27 UTM zones). */
  private final class GridDatumShifted(
      inner: System, ell: Ellipsoid, h: Helmert, from: String, to: String) extends System {
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val (llon, llat) = bridgeToLocal(lon, lat, ell, h, from, to)
      inner.forward(llon, llat)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (llon, llat) = inner.inverse(x, y)
      bridgeToWgs(llon, llat, ell, h, from, to)
    }
  }

  /** One registry row, mirroring the reference's ST_List_Proj_CRS
   *  output columns (proj/functions.cpp:380-430). */
  final case class CrsInfo(
      authName: String, code: String, name: String, kind: String,
      areaName: String, methodName: String, build: () => System)

  private def lccFt(code: String, name: String, area: String,
      lat0: Double, lon0: Double, sp1: Double, sp2: Double,
      feM: Double, fnM: Double): CrsInfo =
    CrsInfo("EPSG", code, name, "projected", area, "Lambert Conic Conformal (2SP)",
      () => new Scaled(new Lcc2sp(GRS80, lat0, lon0, sp1, sp2, feM, fnM), FtUs))

  private def tmFt(code: String, name: String, area: String,
      lat0: Double, lon0: Double, k0: Double, feM: Double, fnM: Double): CrsInfo =
    CrsInfo("EPSG", code, name, "projected", area, "Transverse Mercator",
      () => new Scaled(new TransMerc(GRS80, lat0, lon0, k0, feM, fnM), FtUs))

  /** Static CRS catalog (beyond the parametric UTM families). State
   *  plane parameters are the published EPSG/SPCS83 definitions; false
   *  origins are entered in meters and re-expressed in US survey feet
   *  by the unit wrapper (e.g. 300000 m = 984250 ftUS exactly). */
  val registry: Seq[CrsInfo] = Seq(
    CrsInfo("EPSG", "4326", "WGS 84", "geographic 2D", "World", "", () => Geographic),
    CrsInfo("EPSG", "4269", "NAD83", "geographic 2D", "North America", "", () => Geographic),
    CrsInfo("EPSG", "4267", "NAD27", "geographic 2D", "North America", "",
      () => new GridGeographic(Clarke1866, Nad27Helmert, "NAD27", "NAD83")),
    CrsInfo("OGC", "CRS84", "WGS 84 (CRS84)", "geographic 2D", "World", "", () => Geographic),
    CrsInfo("EPSG", "3857", "WGS 84 / Pseudo-Mercator", "projected", "World between 85.06°S and 85.06°N",
      "Popular Visualisation Pseudo Mercator", () => WebMercator),
    // NAD83 State Plane — New York (ftUS)
    tmFt("2260", "NAD83 / New York East (ftUS)", "USA - New York - east of 73°40'W",
      38.8333333333333, -74.5, 0.9999, 150000.0, 0.0),
    tmFt("2261", "NAD83 / New York Central (ftUS)", "USA - New York - central",
      40.0, -76.5833333333333, 0.9999, 250000.0, 0.0),
    tmFt("2262", "NAD83 / New York West (ftUS)", "USA - New York - west",
      40.0, -78.5833333333333, 0.9999, 350000.0, 0.0),
    lccFt("2263", "NAD83 / New York Long Island (ftUS)", "USA - New York - Long Island",
      40.1666666666667, -74.0, 40.6666666666667, 41.0333333333333, 300000.0, 0.0),
    CrsInfo("EPSG", "32118", "NAD83 / New York Long Island", "projected",
      "USA - New York - Long Island", "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 40.1666666666667, -74.0, 40.6666666666667, 41.0333333333333,
        300000.0, 0.0)),
    // NAD83 State Plane — California zone 5 (ftUS): LA metro
    lccFt("2229", "NAD83 / California zone 5 (ftUS)", "USA - California - SPCS - 5",
      33.5, -118.0, 34.0333333333333, 35.4666666666667, 2000000.0, 500000.0),
    // NAD83 State Plane — Illinois East (ftUS): Chicago
    tmFt("3435", "NAD83 / Illinois East (ftUS)", "USA - Illinois - east",
      36.6666666666667, -88.3333333333333, 0.999975, 300000.0, 0.0),
    // NAD83 State Plane — Pennsylvania South (ftUS): Philadelphia
    lccFt("2272", "NAD83 / Pennsylvania South (ftUS)", "USA - Pennsylvania - south",
      39.3333333333333, -77.75, 39.9333333333333, 40.9666666666667, 600000.0, 0.0),
    // NAD83 State Plane — Texas Central (ftUS): Austin
    lccFt("2277", "NAD83 / Texas Central (ftUS)", "USA - Texas - central",
      29.6666666666667, -100.333333333333, 30.1166666666667, 31.8833333333333,
      700000.0, 3000000.0),
    // Equal-area projections (continent-scale statistics / raster grids)
    CrsInfo("EPSG", "5070", "NAD83 / Conus Albers", "projected", "USA - CONUS onshore",
      "Albers Equal Area",
      () => new Albers2sp(GRS80, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0)),
    CrsInfo("EPSG", "6350", "NAD83(2011) / Conus Albers", "projected", "USA - CONUS onshore",
      "Albers Equal Area",
      () => new Albers2sp(GRS80, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0)),
    CrsInfo("ESRI", "102003", "USA Contiguous Albers Equal Area Conic", "projected",
      "USA - CONUS", "Albers Equal Area",
      () => new Albers2sp(GRS80, 37.5, -96.0, 29.5, 45.5, 0.0, 0.0)),
    CrsInfo("EPSG", "3035", "ETRS89-extended / LAEA Europe", "projected", "Europe",
      "Lambert Azimuthal Equal Area",
      () => new Laea(GRS80, 52.0, 10.0, 4321000.0, 3210000.0)),

    // ---- top-of-the-EPSG-usage-list additions (round 4) ----------------
    // WGS84-compatible geographic datums (ETRS89/GDA/NZGD/JGD/SIRGAS/
    // CGCS agree with WGS84 at the sub-meter level; PROJ's grid-free
    // default treats them as identical, and so do we)
    CrsInfo("EPSG", "4258", "ETRS89", "geographic 2D", "Europe", "", () => Geographic),
    CrsInfo("EPSG", "4171", "RGF93 v1", "geographic 2D", "France", "", () => Geographic),
    CrsInfo("EPSG", "4283", "GDA94", "geographic 2D", "Australia", "", () => Geographic),
    CrsInfo("EPSG", "7844", "GDA2020", "geographic 2D", "Australia", "", () => Geographic),
    CrsInfo("EPSG", "4167", "NZGD2000", "geographic 2D", "New Zealand", "", () => Geographic),
    CrsInfo("EPSG", "4619", "SWEREF99", "geographic 2D", "Sweden", "", () => Geographic),
    CrsInfo("EPSG", "6668", "JGD2011", "geographic 2D", "Japan", "", () => Geographic),
    CrsInfo("EPSG", "4674", "SIRGAS 2000", "geographic 2D", "Latin America", "", () => Geographic),
    CrsInfo("EPSG", "4490", "China Geodetic Coordinate System 2000", "geographic 2D",
      "China", "", () => Geographic),
    // World Mercator (ellipsoidal 1SP)
    CrsInfo("EPSG", "3395", "WGS 84 / World Mercator", "projected",
      "World between 80°S and 84°N", "Mercator (variant A)",
      () => new Mercator1sp(WGS84, 0.0, 1.0, 0.0, 0.0)),
    // France: Lambert-93 (the national grid)
    CrsInfo("EPSG", "2154", "RGF93 v1 / Lambert-93", "projected", "France",
      "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0)),
    // Europe-wide conformal grid
    CrsInfo("EPSG", "3034", "ETRS89-extended / LCC Europe", "projected", "Europe",
      "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0)),
    // Germany: national LCC
    CrsInfo("EPSG", "5243", "ETRS89 / LCC Germany (N-E)", "projected", "Germany",
      "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 51.0, 10.5, 48.6666666666667, 53.6666666666667, 0.0, 0.0)),
    // Nordics / Poland / Finland national TM grids (ETRS89-family)
    CrsInfo("EPSG", "3006", "SWEREF99 TM", "projected", "Sweden", "Transverse Mercator",
      () => new TransMerc(GRS80, 0.0, 15.0, 0.9996, 500000.0, 0.0)),
    CrsInfo("EPSG", "3067", "ETRS89 / TM35FIN(E,N)", "projected", "Finland",
      "Transverse Mercator",
      () => new TransMerc(GRS80, 0.0, 27.0, 0.9996, 500000.0, 0.0)),
    CrsInfo("EPSG", "2180", "ETRS89 / Poland CS92", "projected", "Poland",
      "Transverse Mercator",
      () => new TransMerc(GRS80, 0.0, 19.0, 0.9993, 500000.0, -5300000.0)),
    // New Zealand Transverse Mercator
    CrsInfo("EPSG", "2193", "NZGD2000 / New Zealand Transverse Mercator 2000",
      "projected", "New Zealand", "Transverse Mercator",
      () => new TransMerc(GRS80, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0)),
    // Korea 2000 / Unified CS
    CrsInfo("EPSG", "5179", "Korea 2000 / Unified CS", "projected", "Republic of Korea",
      "Transverse Mercator",
      () => new TransMerc(GRS80, 38.0, 127.5, 0.9996, 1000000.0, 2000000.0)),
    // Singapore SVY21
    CrsInfo("EPSG", "3414", "SVY21 / Singapore TM", "projected", "Singapore",
      "Transverse Mercator",
      () => new TransMerc(WGS84, 1.36666666666667, 103.833333333333, 1.0,
        28001.642, 38744.572)),
    // Ireland: ITM (ETRS89) and the legacy Irish Grid (datum-shifted)
    CrsInfo("EPSG", "2157", "IRENET95 / Irish Transverse Mercator", "projected",
      "Ireland", "Transverse Mercator",
      () => new TransMerc(GRS80, 53.5, -8.0, 0.99982, 600000.0, 750000.0)),
    CrsInfo("EPSG", "29902", "TM65 / Irish Grid", "projected", "Ireland",
      "Transverse Mercator",
      () => new GridDatumShifted(
        new TransMerc(AiryModified, 53.5, -8.0, 1.000035, 200000.0, 250000.0),
        AiryModified, Helmert(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15),
        "TM65", "ETRS89")),
    CrsInfo("EPSG", "29903", "TM75 / Irish Grid", "projected", "Ireland",
      "Transverse Mercator",
      () => new GridDatumShifted(
        new TransMerc(AiryModified, 53.5, -8.0, 1.000035, 200000.0, 250000.0),
        AiryModified, Helmert(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15),
        "TM75", "ETRS89")),
    // Great Britain: OSGB36 British National Grid (Airy 1830 + Helmert
    // EPSG:1314 — the grid-free transformation PROJ also defaults to)
    CrsInfo("EPSG", "27700", "OSGB36 / British National Grid", "projected",
      "United Kingdom", "Transverse Mercator",
      () => new GridDatumShifted(
        new TransMerc(Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0),
        Airy1830, Helmert(446.448, -125.157, 542.060, 0.150, 0.247, 0.842, -20.4894),
        "OSGB36", "ETRS89")),
    // Australia: continental Albers + GDA94 national Lambert
    CrsInfo("EPSG", "3577", "GDA94 / Australian Albers", "projected", "Australia",
      "Albers Equal Area",
      () => new Albers2sp(GRS80, 0.0, 132.0, -18.0, -36.0, 0.0, 0.0)),
    CrsInfo("EPSG", "3112", "GDA94 / Geoscience Australia Lambert", "projected",
      "Australia", "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 0.0, 134.0, -18.0, -36.0, 0.0, 0.0)),
    // Canada: BC Albers; continent-scale ESRI Albers
    CrsInfo("EPSG", "3005", "NAD83 / BC Albers", "projected", "Canada - British Columbia",
      "Albers Equal Area",
      () => new Albers2sp(GRS80, 45.0, -126.0, 50.0, 58.5, 1000000.0, 0.0)),
    CrsInfo("ESRI", "102008", "North America Albers Equal Area Conic", "projected",
      "North America", "Albers Equal Area",
      () => new Albers2sp(GRS80, 40.0, -96.0, 20.0, 60.0, 0.0, 0.0)),
    // Netherlands: Amersfoort / RD New (Oblique Stereographic on
    // Bessel 1841 + the published grid-free Helmert to WGS84)
    CrsInfo("EPSG", "28992", "Amersfoort / RD New", "projected", "Netherlands",
      "Oblique Stereographic",
      () => new DatumShifted(
        new ObliqueStereo(Bessel1841, 52.1561605555556, 5.38763888888889,
          0.9999079, 155000.0, 463000.0),
        Bessel1841,
        Helmert(565.4171, 50.3319, 465.5524, -0.398957, 0.343988, -1.87740, 4.0725))),
    // Polar science grids (Polar Stereographic variant B)
    CrsInfo("EPSG", "3031", "WGS 84 / Antarctic Polar Stereographic", "projected",
      "Antarctica", "Polar Stereographic (variant B)",
      () => new PolarStereo(WGS84, -71.0, 0.0, 0.0, 0.0)),
    CrsInfo("EPSG", "3413", "WGS 84 / NSIDC Sea Ice Polar Stereographic North",
      "projected", "Arctic", "Polar Stereographic (variant B)",
      () => new PolarStereo(WGS84, 70.0, -45.0, 0.0, 0.0)),
    CrsInfo("EPSG", "3995", "WGS 84 / Arctic Polar Stereographic", "projected",
      "Arctic", "Polar Stereographic (variant B)",
      () => new PolarStereo(WGS84, 71.0, 0.0, 0.0, 0.0)),
    // Switzerland: LV95/LV03 (Swiss Oblique Mercator on Bessel 1841;
    // CH1903+ -> ETRS89 is the published translation-only Helmert
    // EPSG:1676, CH1903 -> WGS84 the rounded EPSG:1753)
    CrsInfo("EPSG", "2056", "CH1903+ / LV95", "projected", "Switzerland",
      "Swiss Oblique Cylindrical",
      () => new DatumShifted(
        new SwissOblique(Bessel1841, 46.0 + 57.0 / 60 + 8.66 / 3600,
          7.0 + 26.0 / 60 + 22.5 / 3600, 2600000.0, 1200000.0),
        Bessel1841, Helmert(674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0))),
    CrsInfo("EPSG", "21781", "CH1903 / LV03", "projected", "Switzerland",
      "Swiss Oblique Cylindrical",
      () => new DatumShifted(
        new SwissOblique(Bessel1841, 46.0 + 57.0 / 60 + 8.66 / 3600,
          7.0 + 26.0 / 60 + 22.5 / 3600, 600000.0, 200000.0),
        Bessel1841, Helmert(674.4, 15.1, 405.3, 0.0, 0.0, 0.0, 0.0)))) ++
    statePlaneSweep ++ worldCrsExtras ++ europeLegacyExtras

  // ---- round-10 catalog sweep ---------------------------------------------

  /** One NAD83 State Plane ftUS zone (published SPCS83/EPSG
   *  definitions). `kind` T = Transverse Mercator (p1 = k0, p2
   *  unused), L = Lambert Conformal Conic 2SP (p1/p2 = standard
   *  parallels). False origins in METERS (EPSG states CO/NC in exact
   *  ftUS — entered as ftUS·[[FtUs]]); `fips` names the ESRI WKT. */
  private[functions] final case class SpZone(code: String, state: String, zone: String,
      fips: String, kind: Char, lat0: Double, lon0: Double,
      p1: Double, p2: Double, feM: Double, fnM: Double)

  private lazy val k17 = 1.0 - 1.0 / 17000.0 // SPCS83 TM zones quoting 1:17000
  private lazy val k30 = 1.0 - 1.0 / 30000.0

  private[functions] lazy val spZones: Seq[SpZone] = Seq(
    SpZone("2226", "California", "zone 2", "0402", 'L',
      37.6666666666667, -122.0, 38.3333333333333, 39.8333333333333, 2000000.0, 500000.0),
    SpZone("2227", "California", "zone 3", "0403", 'L',
      36.5, -120.5, 37.0666666666667, 38.4333333333333, 2000000.0, 500000.0),
    SpZone("2228", "California", "zone 4", "0404", 'L',
      35.3333333333333, -119.0, 36.0, 37.25, 2000000.0, 500000.0),
    SpZone("2230", "California", "zone 6", "0406", 'L',
      32.1666666666667, -116.25, 32.7833333333333, 33.8833333333333, 2000000.0, 500000.0),
    SpZone("2231", "Colorado", "North", "0501", 'L',
      39.3333333333333, -105.5, 39.7166666666667, 40.7833333333333,
      3000000.0 * FtUs, 1000000.0 * FtUs),
    SpZone("2232", "Colorado", "Central", "0502", 'L',
      37.8333333333333, -105.5, 38.45, 39.75, 3000000.0 * FtUs, 1000000.0 * FtUs),
    SpZone("2233", "Colorado", "South", "0503", 'L',
      36.6666666666667, -105.5, 37.2333333333333, 38.4333333333333,
      3000000.0 * FtUs, 1000000.0 * FtUs),
    SpZone("2236", "Florida", "East", "0901", 'T',
      24.3333333333333, -81.0, k17, 0, 200000.0, 0.0),
    SpZone("2237", "Florida", "West", "0902", 'T',
      24.3333333333333, -82.0, k17, 0, 200000.0, 0.0),
    SpZone("2238", "Florida", "North", "0903", 'L',
      29.0, -84.5, 29.5833333333333, 30.75, 600000.0, 0.0),
    SpZone("2239", "Georgia", "East", "1001", 'T',
      30.0, -82.1666666666667, 0.9999, 0, 200000.0, 0.0),
    SpZone("2240", "Georgia", "West", "1002", 'T',
      30.0, -84.1666666666667, 0.9999, 0, 700000.0, 0.0),
    SpZone("3436", "Illinois", "West", "1202", 'T',
      36.6666666666667, -90.1666666666667, k17, 0, 700000.0, 0.0),
    SpZone("2965", "Indiana", "East", "1301", 'T',
      37.5, -85.6666666666667, k30, 0, 100000.0, 250000.0),
    SpZone("2966", "Indiana", "West", "1302", 'T',
      37.5, -87.0833333333333, k30, 0, 900000.0, 250000.0),
    SpZone("2248", "Maryland", "", "1900", 'L',
      37.6666666666667, -77.0, 38.3, 39.45, 400000.0, 0.0),
    SpZone("2249", "Massachusetts", "Mainland", "2001", 'L',
      41.0, -71.5, 41.7166666666667, 42.6833333333333, 200000.0, 750000.0),
    SpZone("3424", "New Jersey", "", "2900", 'T',
      38.8333333333333, -74.5, 0.9999, 0, 150000.0, 0.0),
    SpZone("2264", "North Carolina", "", "3200", 'L',
      33.75, -79.0, 34.3333333333333, 36.1666666666667, 2000000.0 * FtUs, 0.0),
    SpZone("3734", "Ohio", "North", "3401", 'L',
      39.6666666666667, -82.5, 40.4333333333333, 41.7, 600000.0, 0.0),
    SpZone("3735", "Ohio", "South", "3402", 'L',
      38.0, -82.5, 38.7333333333333, 40.0333333333333, 600000.0, 0.0),
    SpZone("2271", "Pennsylvania", "North", "3701", 'L',
      40.1666666666667, -77.75, 40.8833333333333, 41.95, 600000.0, 0.0),
    SpZone("2276", "Texas", "North Central", "4202", 'L',
      31.6666666666667, -98.5, 32.1333333333333, 33.9666666666667, 600000.0, 2000000.0),
    SpZone("2278", "Texas", "South Central", "4204", 'L',
      27.8333333333333, -99.0, 28.3833333333333, 30.2833333333333, 600000.0, 4000000.0),
    SpZone("2283", "Virginia", "North", "4501", 'L',
      37.6666666666667, -78.5, 38.0333333333333, 39.2, 3500000.0, 2000000.0),
    SpZone("2284", "Virginia", "South", "4502", 'L',
      36.3333333333333, -78.5, 36.7666666666667, 37.9666666666667, 3500000.0, 1000000.0),
    SpZone("2285", "Washington", "North", "4601", 'L',
      47.0, -120.833333333333, 47.5, 48.7333333333333, 500000.0, 0.0),
    SpZone("2286", "Washington", "South", "4602", 'L',
      45.3333333333333, -120.5, 45.8333333333333, 47.3333333333333, 500000.0, 0.0),
    // r11 tranche: remaining high-traffic ftUS zones (published SPCS83
    // parameters; states on international feet — AZ/MI/MT/OR/ND —
    // stay out of the ftUS sweep by design)
    SpZone("2225", "California", "zone 1", "0401", 'L',
      39.3333333333333, -122.0, 40.0, 41.6666666666667, 2000000.0, 500000.0),
    SpZone("2246", "Kentucky", "North", "1601", 'L',
      37.5, -84.25, 37.9666666666667, 38.9666666666667, 500000.0, 0.0),
    SpZone("2247", "Kentucky", "South", "1602", 'L',
      36.3333333333333, -85.75, 36.7333333333333, 37.9333333333333, 500000.0, 500000.0),
    SpZone("2267", "Oklahoma", "North", "3501", 'L',
      35.0, -98.0, 35.5666666666667, 36.7666666666667, 600000.0, 0.0),
    SpZone("2268", "Oklahoma", "South", "3502", 'L',
      33.3333333333333, -98.0, 33.9333333333333, 35.2333333333333, 600000.0, 0.0),
    SpZone("2274", "Tennessee", "", "4100", 'L',
      34.3333333333333, -86.0, 35.25, 36.4166666666667, 600000.0, 0.0),
    SpZone("2275", "Texas", "North", "4201", 'L',
      34.0, -101.5, 34.65, 36.1833333333333, 200000.0, 1000000.0),
    SpZone("2279", "Texas", "South", "4205", 'L',
      25.6666666666667, -98.5, 26.1666666666667, 27.8333333333333, 300000.0, 5000000.0),
    SpZone("3421", "Nevada", "East", "2701", 'T',
      34.75, -115.583333333333, 0.9999, 0, 200000.0, 8000000.0),
    SpZone("3422", "Nevada", "Central", "2702", 'T',
      34.75, -116.666666666667, 0.9999, 0, 500000.0, 6000000.0),
    SpZone("3423", "Nevada", "West", "2703", 'T',
      34.75, -118.583333333333, 0.9999, 0, 800000.0, 4000000.0))

  private lazy val statePlaneSweep: Seq[CrsInfo] = spZones.map { z =>
    val zn = if (z.zone.isEmpty) "" else s" ${z.zone}"
    if (z.kind == 'T')
      tmFt(z.code, s"NAD83 / ${z.state}$zn (ftUS)", s"USA - ${z.state} -$zn",
        z.lat0, z.lon0, z.p1, z.feM, z.fnM)
    else
      lccFt(z.code, s"NAD83 / ${z.state}$zn (ftUS)", s"USA - ${z.state} -$zn",
        z.lat0, z.lon0, z.p1, z.p2, z.feM, z.fnM)
  }

  private lazy val worldCrsExtras: Seq[CrsInfo] = Seq(
    // Canada-wide LCC (the Atlas grid; CSRS twin is grid-free identical)
    CrsInfo("EPSG", "3978", "NAD83 / Canada Atlas Lambert", "projected", "Canada",
      "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 49.0, -95.0, 49.0, 77.0, 0.0, 0.0)),
    CrsInfo("EPSG", "3979", "NAD83(CSRS) / Canada Atlas Lambert", "projected", "Canada",
      "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 49.0, -95.0, 49.0, 77.0, 0.0, 0.0)),
    CrsInfo("EPSG", "3338", "NAD83 / Alaska Albers", "projected", "USA - Alaska",
      "Albers Equal Area",
      () => new Albers2sp(GRS80, 50.0, -154.0, 55.0, 65.0, 0.0, 0.0)),
    // Universal Polar Stereographic (variant A: k0 = 0.994 at the pole)
    CrsInfo("EPSG", "32661", "WGS 84 / UPS North (N,E)", "projected",
      "Arctic (60°N+)", "Polar Stereographic (variant A)",
      () => new PolarStereoA(WGS84, 0.994, 0.0, 2000000.0, 2000000.0, south = false)),
    CrsInfo("EPSG", "32761", "WGS 84 / UPS South (N,E)", "projected",
      "Antarctic (60°S+)", "Polar Stereographic (variant A)",
      () => new PolarStereoA(WGS84, 0.994, 0.0, 2000000.0, 2000000.0, south = true)),
    // world equidistant grid (global lat/lon rasters)
    CrsInfo("EPSG", "4087", "WGS 84 / World Equidistant Cylindrical", "projected",
      "World", "Equidistant Cylindrical",
      () => new EquidistCyl(WGS84, 0.0, 0.0, 0.0)),

    // ---- round-13 sweep: Middle East / Asia / Baltic nationals -------
    // Israeli TM Grid (EPSG 2039): published proj parameters + the
    // grid-free IGD-to-WGS84 translation PROJ ships as +towgs84
    CrsInfo("EPSG", "2039", "Israel 1993 / Israeli TM Grid", "projected",
      "Israel", "Transverse Mercator",
      () => new DatumShifted(
        new TransMerc(GRS80, 31.73439361111111, 35.20451694444445,
          1.0000067, 219529.584, 626907.39),
        GRS80, Helmert(-48.0, 55.0, 52.0, 0.0, 0.0, 0.0, 0.0))),
    // GGRS87 / Greek Grid (EPSG 2100): GRS80 + translation (EPSG 1272)
    CrsInfo("EPSG", "2100", "GGRS87 / Greek Grid", "projected",
      "Greece", "Transverse Mercator",
      () => new DatumShifted(
        new TransMerc(GRS80, 0.0, 24.0, 0.9996, 500000.0, 0.0),
        GRS80, Helmert(-199.87, 74.79, 246.62, 0.0, 0.0, 0.0, 0.0))),
    // Estonian 1997 / L-EST97 (EPSG 3301): ETRS89-family, grid-free
    CrsInfo("EPSG", "3301", "Estonian Coordinate System of 1997", "projected",
      "Estonia", "Lambert Conic Conformal (2SP)",
      () => new Lcc2sp(GRS80, 57.51755393055556, 24.0,
        59.33333333333334, 58.0, 500000.0, 6375000.0)),
    // Hong Kong 1980 Grid (EPSG 2326): Intl 1924 + 7-param (EPSG 1825)
    CrsInfo("EPSG", "2326", "Hong Kong 1980 Grid System", "projected",
      "Hong Kong", "Transverse Mercator",
      () => new DatumShifted(
        new TransMerc(International1924, 22.31213333333333, 114.1785555555556,
          1.0, 836694.05, 819069.8),
        International1924,
        Helmert(-162.619, -276.959, -161.764, 0.067753, -2.243649, -1.158827, -1.094246))),
    // KKJ / Finland zone 3 (EPSG 2393): Intl 1924 + 7-param (EPSG 10098)
    CrsInfo("EPSG", "2393", "KKJ / Finland Uniform Coordinate System", "projected",
      "Finland", "Transverse Mercator",
      () => new DatumShifted(
        new TransMerc(International1924, 0.0, 27.0, 1.0, 3500000.0, 0.0),
        International1924,
        Helmert(-96.062, -82.428, -121.753, 4.801, 0.345, -1.376, 1.496))),
    // S-JTSK / Krovak East North (EPSG 5514): the Czech/Slovak national
    // grid — Bessel + the grid-free translation PROJ ships as +towgs84
    CrsInfo("EPSG", "5514", "S-JTSK / Krovak East North", "projected",
      "Czechia; Slovakia", "Krovak (East North Orientated)",
      () => new DatumShifted(
        new Krovak(Bessel1841, 49.5, 24.833333333333332, 30.28813972222222,
          78.5, 0.9999, 0.0, 0.0),
        Bessel1841, Helmert(589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0))))

  /** Datum-shifted Gauss-Krüger / ED50 UTM helpers for the parametric
   *  ranges in [[resolve]]. */
  private val DhdnHelmert = Helmert(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
  // NAD27 -> NAD83/WGS84: the classic CONUS translation-only parameters
  // (what PROJ uses absent a grid); NTv2 grids refine this when present
  private val Nad27Helmert = Helmert(-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)
  private val Ed50Helmert = Helmert(-87.0, -96.0, -120.0, 0.0, 0.0, 0.0, 0.0)
  // NTF -> WGS84/RGF93 (EPSG 1193, the grid-free default; ntf_r93.gsb
  // upgrades it when a grid dir is configured)
  private val NtfHelmert = Helmert(-168.0, -60.0, 320.0, 0.0, 0.0, 0.0, 0.0)
  // BD72 -> WGS84 (EPSG 15929 re-expressed position-vector — the
  // +towgs84 string PROJ publishes for Belgian Lambert 72)
  private val Bd72Helmert =
    Helmert(-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747)
  // MGI -> WGS84 (EPSG 1618 position vector; AT_GIS_GRID refines it)
  private val MgiHelmert =
    Helmert(577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232)
  // Pulkovo 1942 -> WGS84 (EPSG 1254, the USSR translation-only set)
  private val PulkovoHelmert = Helmert(28.0, -130.0, -95.0, 0.0, 0.0, 0.0, 0.0)
  // Monte Mario -> WGS84 (the position-vector set PROJ publishes for
  // the Gauss-Boaga zones)
  private val MonteMarioHelmert =
    Helmert(-104.1, -49.1, -9.9, 0.971, -2.917, 0.714, -11.68)

  // Paris meridian: 2°20'14.025" E of Greenwich (EPSG 8903)
  private val ParisLon = 2.0 + 20.0 / 60 + 14.025 / 3600

  /** SWEREF99 local-zone central meridians (EPSG 3007-3018; the
   *  published "SWEREF99 dd mm" projection set — TM, k0 = 1,
   *  FE 150 km). Codes are not arithmetic in longitude. */
  private val SwerefZones: Map[Int, Double] = Map(
    3007 -> 12.0, 3008 -> 13.5, 3009 -> 15.0, 3010 -> 16.5, 3011 -> 18.0,
    3012 -> 14.25, 3013 -> 15.75, 3014 -> 17.25, 3015 -> 18.75,
    3016 -> 20.25, 3017 -> 21.75, 3018 -> 23.25)

  private def swerefName(lon0: Double): String = {
    val d = lon0.toInt; val m = math.round((lon0 - d) * 60).toInt
    f"SWEREF99 $d%02d $m%02d"
  }

  /** Round-11 catalog sweep: the legacy European national systems a
   *  migrating user hits first — French NTF Lambert zones (LCC 1SP on
   *  Clarke 1880 IGN, longitudes of origin on the Paris meridian),
   *  Belgian Lambert 72/2008, Austrian MGI Gauss-Krüger + Lambert. */
  private lazy val europeLegacyExtras: Seq[CrsInfo] = {
    def ntfLambert(code: String, name: String, lat0: Double, k0: Double,
        fe: Double, fn: Double): CrsInfo =
      CrsInfo("EPSG", code, name, "projected", "France",
        "Lambert Conic Conformal (1SP)",
        () => new GridDatumShifted(
          new Lcc1sp(Clarke1880IGN, lat0, ParisLon, k0, fe, fn),
          Clarke1880IGN, NtfHelmert, "NTF", "RGF93"))
    def mgiGk(code: String, name: String, lon0: Double, fe: Double): CrsInfo =
      CrsInfo("EPSG", code, name, "projected", "Austria", "Transverse Mercator",
        () => new GridDatumShifted(
          new TransMerc(Bessel1841, 0.0, lon0, 1.0, fe, -5000000.0),
          Bessel1841, MgiHelmert, "MGI", "ETRS89"))
    Seq(
      CrsInfo("EPSG", "4275", "NTF", "geographic 2D", "France", "",
        () => new GridGeographic(Clarke1880IGN, NtfHelmert, "NTF", "RGF93")),
      CrsInfo("EPSG", "4313", "BD72", "geographic 2D", "Belgium", "",
        () => new GridGeographic(International1924, Bd72Helmert, "BD72", "ETRS89")),
      CrsInfo("EPSG", "4312", "MGI", "geographic 2D", "Austria", "",
        () => new GridGeographic(Bessel1841, MgiHelmert, "MGI", "ETRS89")),
      CrsInfo("EPSG", "4284", "Pulkovo 1942", "geographic 2D",
        "Russia / CIS", "",
        () => new GridGeographic(Krassowsky1940, PulkovoHelmert, "PULKOVO1942", "WGS84")),
      // published IGN zone constants: lat0 in grads on the definition
      // sheet (49.5/46.8/44.1/42.165 degrees), k0 per zone
      ntfLambert("27561", "NTF (Paris) / Lambert Nord France", 49.5,
        0.999877341, 600000.0, 200000.0),
      ntfLambert("27562", "NTF (Paris) / Lambert Centre France", 46.8,
        0.99987742, 600000.0, 200000.0),
      ntfLambert("27563", "NTF (Paris) / Lambert Sud France", 44.1,
        0.999877499, 600000.0, 200000.0),
      ntfLambert("27564", "NTF (Paris) / Lambert Corse", 42.165,
        0.99994471, 234.358, 185861.369),
      ntfLambert("27571", "NTF (Paris) / Lambert zone I", 49.5,
        0.999877341, 600000.0, 1200000.0),
      ntfLambert("27572", "NTF (Paris) / Lambert zone II", 46.8,
        0.99987742, 600000.0, 2200000.0),
      ntfLambert("27573", "NTF (Paris) / Lambert zone III", 44.1,
        0.999877499, 600000.0, 3200000.0),
      ntfLambert("27574", "NTF (Paris) / Lambert zone IV", 42.165,
        0.99994471, 234.358, 4185861.369),
      CrsInfo("EPSG", "31370", "BD72 / Belgian Lambert 72", "projected",
        "Belgium", "Lambert Conic Conformal (2SP)",
        () => new DatumShifted(
          new Lcc2sp(International1924, 90.0, 4.0 + 22.0 / 60 + 2.952 / 3600,
            51.0 + 10.0 / 60 + 0.00204 / 3600, 49.0 + 50.0 / 60 + 0.00204 / 3600,
            150000.013, 5400088.438),
          International1924, Bd72Helmert)),
      CrsInfo("EPSG", "3812", "ETRS89 / Belgian Lambert 2008", "projected",
        "Belgium", "Lambert Conic Conformal (2SP)",
        () => new Lcc2sp(GRS80, 50.0 + 47.0 / 60 + 52.134 / 3600,
          4.0 + 21.0 / 60 + 33.177 / 3600, 49.0 + 50.0 / 60, 51.0 + 10.0 / 60,
          649328.0, 665262.0)),
      mgiGk("31254", "MGI / Austria GK West", 10.0 + 20.0 / 60, 0.0),
      mgiGk("31255", "MGI / Austria GK Central", 13.0 + 20.0 / 60, 0.0),
      mgiGk("31256", "MGI / Austria GK East", 16.0 + 20.0 / 60, 0.0),
      mgiGk("31257", "MGI / Austria GK M28", 10.0 + 20.0 / 60, 150000.0),
      mgiGk("31258", "MGI / Austria GK M31", 13.0 + 20.0 / 60, 450000.0),
      mgiGk("31259", "MGI / Austria GK M34", 16.0 + 20.0 / 60, 750000.0),
      CrsInfo("EPSG", "31287", "MGI / Austria Lambert", "projected",
        "Austria", "Lambert Conic Conformal (2SP)",
        () => new DatumShifted(
          new Lcc2sp(Bessel1841, 47.5, 13.0 + 20.0 / 60, 49.0, 46.0,
            400000.0, 400000.0),
          Bessel1841, MgiHelmert)),
      // Portugal: ETRS89 / Portugal TM06 (grid-free, natural origin at
      // the Melriça geodetic center)
      CrsInfo("EPSG", "3763", "ETRS89 / Portugal TM06", "projected",
        "Portugal", "Transverse Mercator",
        () => new TransMerc(GRS80,
          39.0 + 40.0 / 60 + 5.73 / 3600, -(8.0 + 7.0 / 60 + 59.19 / 3600),
          1.0, 0.0, 0.0)),
      // Italy: Monte Mario / Italy zones 1-2 (Gauss-Boaga grid,
      // International 1924 + the published 7-param shift)
      CrsInfo("EPSG", "4265", "Monte Mario", "geographic 2D", "Italy", "",
        () => new GridGeographic(International1924, MonteMarioHelmert,
          "MONTEMARIO", "ETRS89")),
      CrsInfo("EPSG", "3003", "Monte Mario / Italy zone 1", "projected",
        "Italy - west", "Transverse Mercator",
        () => new GridDatumShifted(
          new TransMerc(International1924, 0.0, 9.0, 0.9996, 1500000.0, 0.0),
          International1924, MonteMarioHelmert, "MONTEMARIO", "ETRS89")),
      CrsInfo("EPSG", "3004", "Monte Mario / Italy zone 2", "projected",
        "Italy - east", "Transverse Mercator",
        () => new GridDatumShifted(
          new TransMerc(International1924, 0.0, 15.0, 0.9996, 2520000.0, 0.0),
          International1924, MonteMarioHelmert, "MONTEMARIO", "ETRS89")),
      // zone-prefixed ETRS89 UTM variants (zE-N: FE carries the zone)
      CrsInfo("EPSG", "4647", "ETRS89 / UTM zone 32N (zE-N)", "projected",
        "Germany", "Transverse Mercator",
        () => new TransMerc(GRS80, 0.0, 9.0, 0.9996, 32500000.0, 0.0)),
      CrsInfo("EPSG", "5650", "ETRS89 / UTM zone 33N (zE-N)", "projected",
        "Germany", "Transverse Mercator",
        () => new TransMerc(GRS80, 0.0, 15.0, 0.9996, 33500000.0, 0.0)),
      // Mexico: national LCC on ITRF2008
      CrsInfo("EPSG", "6372", "Mexico ITRF2008 / LCC", "projected",
        "Mexico", "Lambert Conic Conformal (2SP)",
        () => new Lcc2sp(GRS80, 12.0, -102.0, 17.5, 29.5, 2500000.0, 0.0)),
      // Korea 2000 belts (2010 false-northing set, k0 = 1)
      CrsInfo("EPSG", "5185", "Korea 2000 / West Belt 2010", "projected",
        "South Korea", "Transverse Mercator",
        () => new TransMerc(GRS80, 38.0, 125.0, 1.0, 200000.0, 600000.0)),
      CrsInfo("EPSG", "5186", "Korea 2000 / Central Belt 2010", "projected",
        "South Korea", "Transverse Mercator",
        () => new TransMerc(GRS80, 38.0, 127.0, 1.0, 200000.0, 600000.0)),
      CrsInfo("EPSG", "5187", "Korea 2000 / East Belt 2010", "projected",
        "South Korea", "Transverse Mercator",
        () => new TransMerc(GRS80, 38.0, 129.0, 1.0, 200000.0, 600000.0)),
      CrsInfo("EPSG", "5188", "Korea 2000 / East Sea Belt 2010", "projected",
        "South Korea", "Transverse Mercator",
        () => new TransMerc(GRS80, 38.0, 131.0, 1.0, 200000.0, 600000.0)))
  }

  /** CGCS2000 Gauss-Kruger parameters (EPSG 4491-4554): central
   *  meridian + false easting. 6-degree zones 13-23 (CM = 6z-3,
   *  FE = z*1e6 + 500000) with CM-only twins 4502-4512 (75E..135E,
   *  FE = 500000); 3-degree zones 25-45 (CM = 3z, zone-prefixed FE)
   *  with CM-only twins 4534-4554. lat0 = 0, k0 = 1 throughout. */
  private def cgcsGkParams(code: Int): (Double, Double) =
    if (code <= 4501) { val z = code - 4478; (z * 6.0 - 3.0, z * 1000000.0 + 500000.0) }
    else if (code <= 4512) (75.0 + (code - 4502) * 6.0, 500000.0)
    else if (code <= 4533) { val z = code - 4488; (z * 3.0, z * 1000000.0 + 500000.0) }
    else (75.0 + (code - 4534) * 3.0, 500000.0)

  /** Japan plane rectangular CS zone origins (JGD2011, EPSG:6669-6687 =
   *  zones I-XIX; published zone table, k0 = 0.9999, no false origin). */
  private val JapanZones: Array[(Double, Double)] = Array(
    (33.0, 129.5), (33.0, 131.0), (36.0, 132.0 + 10.0 / 60), (33.0, 133.5),
    (36.0, 134.0 + 20.0 / 60), (36.0, 136.0), (36.0, 137.0 + 10.0 / 60),
    (36.0, 138.5), (36.0, 139.0 + 50.0 / 60), (40.0, 140.0 + 50.0 / 60),
    (44.0, 140.25), (44.0, 142.25), (44.0, 144.25), (26.0, 142.0),
    (26.0, 127.5), (26.0, 124.0), (26.0, 131.0), (20.0, 136.0), (26.0, 154.0))

  private val byKey: Map[String, CrsInfo] =
    registry.map(i => s"${i.authName}:${i.code}" -> i).toMap

  /** Rows for the st_list_proj_crs table function: the static registry
   *  plus the parametric UTM families. */
  def listAll(): Seq[(String, String, String, String, Boolean, String, String, String)] = {
    val fixed = registry.map(i =>
      (i.authName, i.code, i.name, i.kind, false, i.areaName, i.methodName, "Earth"))
    val utmWgs = (1 to 60).flatMap { z =>
      Seq(
        ("EPSG", s"${32600 + z}", s"WGS 84 / UTM zone ${z}N", "projected", false,
          s"Between ${z * 6 - 186}°E and ${z * 6 - 180}°E, northern hemisphere", "Transverse Mercator", "Earth"),
        ("EPSG", s"${32700 + z}", s"WGS 84 / UTM zone ${z}S", "projected", false,
          s"Between ${z * 6 - 186}°E and ${z * 6 - 180}°E, southern hemisphere", "Transverse Mercator", "Earth"))
    }
    val utmNad = (1 to 23).map { z =>
      ("EPSG", s"${26900 + z}", s"NAD83 / UTM zone ${z}N", "projected", false,
        s"North America - ${z * 6 - 186}°W to ${z * 6 - 180}°W", "Transverse Mercator", "Earth")
    }
    val utmNad27 = (1 to 22).map { z =>
      ("EPSG", s"${26700 + z}", s"NAD27 / UTM zone ${z}N", "projected", false,
        s"North America - ${z * 6 - 186}°W to ${z * 6 - 180}°W", "Transverse Mercator", "Earth")
    }
    val jgd2000 = (1 to 19).map { z =>
      ("EPSG", s"${2442 + z}", s"JGD2000 / Japan Plane Rectangular CS $z", "projected",
        false, "Japan", "Transverse Mercator", "Earth")
    }
    val utmEtrs = (28 to 38).map { z =>
      ("EPSG", s"${25800 + z}", s"ETRS89 / UTM zone ${z}N", "projected", false,
        "Europe", "Transverse Mercator", "Earth")
    }
    val mga94 = (48 to 58).map { z =>
      ("EPSG", s"${28300 + z}", s"GDA94 / MGA zone $z", "projected", false,
        "Australia", "Transverse Mercator", "Earth")
    }
    val mga2020 = (46 to 59).map { z =>
      ("EPSG", s"${7800 + z}", s"GDA2020 / MGA zone $z", "projected", false,
        "Australia", "Transverse Mercator", "Earth")
    }
    val sirgas = (11 to 22).map { z =>
      ("EPSG", s"${31954 + z}", s"SIRGAS 2000 / UTM zone ${z}N", "projected", false,
        "Latin America", "Transverse Mercator", "Earth")
    } ++ (17 to 25).map { z =>
      ("EPSG", s"${31960 + z}", s"SIRGAS 2000 / UTM zone ${z}S", "projected", false,
        "Latin America", "Transverse Mercator", "Earth")
    }
    val japan = (1 to 19).map { z =>
      ("EPSG", s"${6668 + z}", s"JGD2011 / Japan Plane Rectangular CS $z", "projected",
        false, "Japan", "Transverse Mercator", "Earth")
    }
    val gk = (2 to 5).map { z =>
      ("EPSG", s"${31464 + z}", s"DHDN / 3-degree Gauss-Krüger zone $z", "projected",
        false, "Germany", "Transverse Mercator", "Earth")
    }
    val ed50 = (28 to 38).map { z =>
      ("EPSG", s"${23000 + z}", s"ED50 / UTM zone ${z}N", "projected", false,
        "Europe - Mediterranean", "Transverse Mercator", "Earth")
    }
    val pulkovo = (2 to 32).map { z =>
      ("EPSG", s"${28400 + z}", s"Pulkovo 1942 / Gauss-Kruger zone $z", "projected",
        false, "Russia / CIS", "Transverse Mercator", "Earth")
    }
    val ntm = (5 to 30).map { z =>
      ("EPSG", s"${5100 + z}", s"ETRS89 / NTM zone $z", "projected", false,
        "Norway", "Transverse Mercator", "Earth")
    }
    val frCc = (3942 to 3950).map { c =>
      ("EPSG", s"$c", s"RGF93 v1 / CC${c - 3900}", "projected", false,
        "France", "Lambert Conic Conformal (2SP)", "Earth")
    }
    val sweref = SwerefZones.toSeq.sortBy(_._1).map { case (c, lon0) =>
      ("EPSG", s"$c", swerefName(lon0), "projected", false,
        "Sweden", "Transverse Mercator", "Earth")
    }
    val finGk = (3873 to 3885).map { c =>
      ("EPSG", s"$c", s"ETRS89 / GK${c - 3873 + 19}FIN", "projected", false,
        "Finland", "Transverse Mercator", "Earth")
    }
    val posgar = Seq(("EPSG", "5340", "POSGAR 2007", "geographic 2D", false,
      "Argentina", "", "Earth")) ++ (1 to 7).map { f =>
      ("EPSG", s"${5343 + f}", s"POSGAR 2007 / Argentina $f", "projected",
        false, "Argentina", "Transverse Mercator", "Earth")
    }
    val mtm = (1 to 17).map { z =>
      ("EPSG", s"${32180 + z}", s"NAD83 / MTM zone $z", "projected", false,
        "Canada", "Transverse Mercator", "Earth")
    }
    // CGCS2000 Gauss-Kruger grids (EPSG 4491-4554): 6-degree zones 13-23
    // (zone-prefixed false easting) + CM twins, 3-degree zones 25-45 +
    // CM twins. CGCS2000 uses the GRS80-identical ellipsoid and is
    // WGS84-compatible grid-free (like the 4490 geographic entry).
    val cgcsGk = (13 to 23).map { z =>
      ("EPSG", s"${4478 + z}", s"CGCS2000 / Gauss-Kruger zone $z", "projected",
        false, "China", "Transverse Mercator", "Earth")
    } ++ (0 to 10).map { i =>
      ("EPSG", s"${4502 + i}", s"CGCS2000 / Gauss-Kruger CM ${75 + 6 * i}E",
        "projected", false, "China", "Transverse Mercator", "Earth")
    } ++ (25 to 45).map { z =>
      ("EPSG", s"${4488 + z}", s"CGCS2000 / 3-degree Gauss-Kruger zone $z",
        "projected", false, "China", "Transverse Mercator", "Earth")
    } ++ (0 to 20).map { i =>
      ("EPSG", s"${4534 + i}", s"CGCS2000 / 3-degree Gauss-Kruger CM ${75 + 3 * i}E",
        "projected", false, "China", "Transverse Mercator", "Earth")
    }
    fixed ++ utmWgs ++ utmNad ++ utmNad27 ++ utmEtrs ++ mga94 ++ mga2020 ++
      sirgas ++ japan ++ jgd2000 ++ gk ++ ed50 ++ pulkovo ++ ntm ++
      frCc ++ sweref ++ finGk ++ posgar ++ mtm ++ cgcsGk
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, System]()

  // ---- PROJ-string / WKT1 CRS input ---------------------------------------
  // The reference's ST_Transform accepts "any format the PROJ library
  // supports" (docs/functions.md:1947); the two text forms users
  // actually paste are proj4 `+proj=...` strings and the WKT1 a .prj
  // sidecar / st_read_meta.crs.wkt carries. Both resolve onto the same
  // System classes as the EPSG catalog. Per PROJ semantics, CRSs built
  // from these forms use GIS (easting/northing | lon/lat) axis order
  // regardless of always_xy, so geographic results never swap.

  /** Identity wrapper that clears the `geographic` axis-swap flag —
   *  proj-string/WKT1 geographic CRSs are always lon/lat ordered. */
  private final class XyOrder(inner: System) extends System {
    def forward(lon: Double, lat: Double): (Double, Double) = inner.forward(lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = inner.inverse(x, y)
  }

  private def ellpsByName(name: String): Option[Ellipsoid] =
    name.toLowerCase match {
      case "wgs84" => Some(WGS84)
      case "grs80" => Some(GRS80)
      case "airy" => Some(Airy1830)
      case "mod_airy" => Some(AiryModified)
      case "bessel" => Some(Bessel1841)
      case "intl" => Some(International1924)
      case "clrk66" => Some(Clarke1866)
      case "clrk80ign" => Some(Clarke1880IGN)
      case "krass" => Some(Krassowsky1940)
      case "sphere" => Some(Ellipsoid(6370997.0, 0.0))
      case _ => None
    }

  /** PROJ's +datum= shorthands: ellipsoid + grid-free datum shift. */
  private def datumByName(name: String): Option[(Ellipsoid, Option[Helmert])] =
    name.toLowerCase match {
      case "wgs84" => Some((WGS84, None))
      case "nad83" => Some((GRS80, None))
      case "nad27" => Some((Clarke1866, Some(Nad27Helmert)))
      case "osgb36" => Some((Airy1830,
        Some(Helmert(446.448, -125.157, 542.060, 0.150, 0.247, 0.842, -20.4894))))
      case "potsdam" => Some((Bessel1841, Some(DhdnHelmert)))
      case "ire65" => Some((AiryModified,
        Some(Helmert(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15))))
      case "ntf" => Some((Clarke1880IGN, Some(NtfHelmert)))
      case _ => None
    }

  private[functions] def parseProjString(str: String): System = {
    val kv = scala.collection.mutable.LinkedHashMap[String, String]()
    str.trim.split("\\s+").foreach { tok =>
      if (tok.startsWith("+")) {
        val body = tok.substring(1)
        val i = body.indexOf('=')
        if (i < 0) kv(body.toLowerCase) = ""
        else kv(body.substring(0, i).toLowerCase) = body.substring(i + 1)
      }
    }
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"unsupported PROJ string: $msg in '$str'")
    def num(k: String, dflt: Double): Double =
      kv.get(k).map(_.toDouble).getOrElse(dflt)
    val proj = kv.getOrElse("proj", fail("missing +proj"))

    // datum: +datum wins, else +ellps/+a/+b/+rf, +towgs84 adds a shift
    val datum = kv.get("datum").map(d => datumByName(d).getOrElse(fail(s"+datum=$d")))
    val ell: Ellipsoid = datum.map(_._1)
      .orElse(kv.get("ellps").map(e => ellpsByName(e).getOrElse(fail(s"+ellps=$e"))))
      .getOrElse {
        (kv.get("a"), kv.get("b"), kv.get("rf")) match {
          case (Some(a), Some(b), _) =>
            val av = a.toDouble; Ellipsoid(av, (av - b.toDouble) / av)
          case (Some(a), None, Some(rf)) =>
            val r = rf.toDouble; Ellipsoid(a.toDouble, if (r == 0) 0.0 else 1.0 / r)
          case (Some(a), None, None) => Ellipsoid(a.toDouble, 0.0)
          case _ => WGS84
        }
      }
    // An explicitly present +towgs84 is authoritative (PROJ semantics):
    // an all-zero parameter list is still a REAL shift — the geocentric
    // roundtrip swaps ellipsoids (tens of meters on intl vs WGS84) — and
    // it overrides any +datum Helmert rather than falling back to it.
    val shift: Option[Helmert] =
      if (kv.contains("towgs84")) kv.get("towgs84").map { s =>
        val p = s.split(",").map(_.trim.toDouble)
        if (p.length == 3) Helmert(p(0), p(1), p(2), 0, 0, 0, 0)
        else if (p.length == 7) Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6))
        else fail("+towgs84 needs 3 or 7 parameters")
      }
      else datum.flatMap(_._2)

    // prime meridian: lon_0 is relative to +pm
    val pm = kv.get("pm").map {
      case p if p.equalsIgnoreCase("paris") => ParisLon
      case p if p.equalsIgnoreCase("greenwich") => 0.0
      case p => p.toDouble
    }.getOrElse(0.0)
    val lon0 = pm + num("lon_0", 0.0)
    val lat0 = num("lat_0", 0.0)
    val k0 = kv.get("k_0").orElse(kv.get("k")).map(_.toDouble).getOrElse(1.0)
    val x0 = num("x_0", 0.0); val y0 = num("y_0", 0.0)

    val inner: System = proj.toLowerCase match {
      case "longlat" | "latlong" | "lonlat" => Geographic
      case "webmerc" => WebMercator
      case "merc" =>
        val kts = kv.get("lat_ts").map { ts =>
          val t = math.toRadians(ts.toDouble)
          math.cos(t) / math.sqrt(1 - ell.e2 * math.sin(t) * math.sin(t))
        }.getOrElse(k0)
        new Mercator1sp(ell, lon0, kts, x0, y0)
      case "tmerc" | "etmerc" => new TransMerc(ell, lat0, lon0, k0, x0, y0)
      case "utm" =>
        val z = kv.getOrElse("zone", fail("+proj=utm needs +zone")).toInt
        if (z < 1 || z > 60) fail(s"+zone=$z")
        new TransMerc(ell, 0.0, z * 6 - 183 + pm, 0.9996,
          500000.0, if (kv.contains("south")) 10000000.0 else 0.0)
      case "lcc" =>
        if (kv.contains("lat_2"))
          new Lcc2sp(ell, lat0, lon0, num("lat_1", lat0), num("lat_2", lat0), x0, y0)
        else {
          if (!kv.contains("lat_1") && !kv.contains("lat_0"))
            fail("+proj=lcc needs +lat_1 (and optionally +lat_0/+lat_2)")
          // PROJ semantics: the cone follows lat_1, ρ0 follows lat_0
          new Lcc1sp(ell, num("lat_1", lat0), lon0, k0, x0, y0, Some(lat0))
        }
      case "aea" =>
        new Albers2sp(ell, lat0, lon0, num("lat_1", 0.0), num("lat_2", 0.0), x0, y0)
      case "laea" => new Laea(ell, lat0, lon0, x0, y0)
      case "stere" =>
        if (math.abs(math.abs(lat0) - 90.0) > 1e-9)
          fail("+proj=stere is supported at the poles only (use sterea obliquely)")
        kv.get("lat_ts") match {
          case Some(ts) => new PolarStereo(ell,
            if (lat0 < 0) -math.abs(ts.toDouble) else math.abs(ts.toDouble),
            lon0, x0, y0)
          case None => new PolarStereoA(ell, k0, lon0, x0, y0, south = lat0 < 0)
        }
      case "sterea" => new ObliqueStereo(ell, lat0, lon0, k0, x0, y0)
      case "somerc" => new SwissOblique(ell, lat0, lon0, x0, y0)
      case "eqc" =>
        if (num("lat_ts", 0.0) != 0.0) fail("+proj=eqc with a non-zero +lat_ts")
        new EquidistCyl(ell, lon0, x0, y0)
      case "krovak" =>
        // PROJ parameter defaults ARE the S-JTSK constants
        new Krovak(ell,
          if (kv.contains("lat_0")) lat0 else 49.5,
          if (kv.contains("lon_0")) lon0 else 24.833333333333332,
          num("alpha", 30.28813972222222), 78.5,
          if (kv.contains("k") || kv.contains("k_0")) k0 else 0.9999,
          x0, y0)
      case other => fail(s"+proj=$other")
    }
    val shifted = shift match {
      case Some(h) => new DatumShifted(inner, ell, h)
      case None => inner
    }
    val unitScaled = kv.get("units") match {
      case _ if inner eq Geographic => shifted
      case Some("m") | None =>
        kv.get("to_meter").map(m => new Scaled(shifted, m.toDouble)).getOrElse(shifted)
      case Some("us-ft") => new Scaled(shifted, FtUs)
      case Some("ft") => new Scaled(shifted, 0.3048)
      case Some(u) => fail(s"+units=$u")
    }
    // proj-string CRSs are always xy/lon-lat ordered
    if (unitScaled.geographic) new XyOrder(unitScaled) else unitScaled
  }

  /** Minimal WKT1 tree: `NAME["str", 1.5, CHILD[...]]`. */
  private final case class WktNode(name: String, values: Seq[Any]) {
    def str(i: Int): String = values(i).asInstanceOf[String]
    def dbl(i: Int): Double = values(i).asInstanceOf[Double]
    def children(n: String): Seq[WktNode] =
      values.collect { case w: WktNode if w.name.equalsIgnoreCase(n) => w }
    def child(n: String): Option[WktNode] = children(n).headOption
  }

  private def parseWktTree(s: String): WktNode = {
    var p = 0
    def skipWs(): Unit = while (p < s.length && s(p).isWhitespace) p += 1
    def parseNode(): WktNode = {
      skipWs()
      val start = p
      while (p < s.length && s(p) != '[' && s(p) != '(') p += 1
      val name = s.substring(start, p).trim
      require(p < s.length, s"WKT: missing '[' after '$name'")
      val close = if (s(p) == '[') ']' else ')'
      p += 1
      val vals = scala.collection.mutable.ArrayBuffer[Any]()
      var done = false
      while (!done) {
        skipWs()
        require(p < s.length, s"WKT: unterminated $name")
        s(p) match {
          case '"' =>
            p += 1; val st = p
            while (p < s.length && s(p) != '"') p += 1
            require(p < s.length, "WKT: unterminated string")
            vals += s.substring(st, p); p += 1
          case c if c == close => done = true; p += 1
          case ',' => p += 1
          case c if c.isLetter =>
            // lookahead: a nested node (NAME[...]) vs a bare enum
            // keyword (AXIS["Latitude",NORTH] — WKT1_GDAL dialect)
            val st = p
            while (p < s.length && (s(p).isLetterOrDigit || s(p) == '_')) p += 1
            val word = s.substring(st, p)
            skipWs()
            if (p < s.length && (s(p) == '[' || s(p) == '(')) {
              p = st // rewind: parseNode consumes the name itself
              vals += parseNode()
            } else vals += word
          case _ =>
            val st = p
            while (p < s.length && s(p) != ',' && s(p) != close) p += 1
            vals += s.substring(st, p).trim.toDouble
        }
      }
      WktNode(name.toUpperCase, vals.toSeq)
    }
    parseNode()
  }

  /** WKT1 resolves by composing the two text layers: the tree maps to
   *  a canonical proj4 string ([[wktToProj4Impl]] — ONE place decides
   *  variant/fallback semantics), and [[parseProjString]] builds the
   *  System from it. Double.toString round-trips bit-exactly, so the
   *  composed transform is identical to a direct construction. */
  private[functions] def parseWkt1(str: String): System =
    parseProjString(wktToProj4Impl(str))

  /** Derive a proj4 string from WKT1 text — what st_read_meta's
   *  `crs.proj4` column carries (the reference fills it via GDAL's
   *  OSR export, st_read_meta.cpp:26-56). None when the projection is
   *  outside the supported set. */
  def wktToProj4(wktText: String): Option[String] =
    try Some(wktToProj4Impl(wktText)) catch { case _: Exception => None }

  /** PROJJSON (PROJ's JSON CRS encoding, proj.org/schemas) derived
   *  from a proj4 string — what st_read_meta's `crs.projjson` column
   *  carries (the reference fills it via GDAL OSR,
   *  gdal/functions/st_read_meta.cpp:26-91). Composes through the
   *  SAME proj-string tokens [[parseProjString]] consumes, so the
   *  JSON can never describe a different transform than the engine
   *  runs. None when the projection is outside the supported set. */
  def proj4ToProjJson(proj4: String): Option[String] =
    try Some(projJsonImpl(proj4)) catch { case _: Exception => None }

  def wktToProjJson(wktText: String): Option[String] =
    wktToProj4(wktText).flatMap(proj4ToProjJson)

  /** Total wrapper over [[projJsonToProj4]] for metadata consumers. */
  def projJsonToProj4Opt(jsonText: String): Option[String] =
    try Some(projJsonToProj4(jsonText)) catch { case _: Exception => None }

  /** Any accepted CRS text form -> a PROJJSON document (what GeoParquet
   *  1.1 'geo' metadata carries in its `crs` field). Catalog codes ride
   *  the WKT exporter and keep their authority id. */
  def anyToProjJson(text: String): Option[String] = {
    val t = text.trim
    if (t.isEmpty) None
    else if (t.startsWith("{")) Some(t)
    else if (t.startsWith("+")) proj4ToProjJson(t)
    else {
      val up = t.take(8).toUpperCase
      if (up.startsWith("PROJCS") || up.startsWith("GEOGCS") ||
          up.startsWith("PROJCRS") || up.startsWith("GEOGCRS") ||
          up.startsWith("GEODCRS") || up.startsWith("BOUNDCRS")) wktToProjJson(t)
      else "^(EPSG|ESRI):(\\d+)$".r.findFirstMatchIn(t.toUpperCase).flatMap { m =>
        esriWkt(t).flatMap(wktToProjJson).map { js =>
          js.dropRight(1) +
            s""","id":{"authority":"${m.group(1)}","code":${m.group(2)}}}"""
        }
      }
    }
  }

  /** PROJJSON input (the reference accepts it through proj_create,
   *  proj/functions.cpp:488-517): map the document onto the same
   *  canonical proj4 string every other text form composes through —
   *  the EPSG method/parameter mapping is [[epsgMethodCore]], shared
   *  with the WKT2 reader, so the two modern text forms can never
   *  diverge. Covers GeographicCRS / ProjectedCRS / BoundCRS. */
  private[functions] def projJsonToProj4(jsonText: String): String = {
    import com.fasterxml.jackson.databind.JsonNode
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"unsupported PROJJSON CRS: $msg")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root0 =
      try mapper.readTree(jsonText)
      catch { case e: Exception => fail(s"malformed JSON (${e.getMessage})") }
    def typ(n: JsonNode): String =
      Option(n.get("type")).map(_.asText("")).getOrElse("")

    // numeric value that may carry a unit object; returns (value, unit)
    def valueUnit(p: JsonNode): (Double, JsonNode) =
      (Option(p.get("value")).map(_.asDouble).getOrElse(fail("parameter without value")),
        p.get("unit"))
    def angDeg(v: Double, unit: JsonNode): Double = {
      if (unit == null || unit.isTextual) unit match {
        case null => v
        case u if u.asText == "degree" => v
        case u if u.asText == "grad" => v * 0.9
        case u if u.asText == "radian" => math.toDegrees(v)
        case u => fail(s"angular unit '${u.asText}'")
      } else {
        // {conversion_factor: radians per unit} — same ulp snap as WKT
        val d = Option(unit.get("conversion_factor")).map(_.asDouble)
          .getOrElse(fail("angular unit without conversion_factor")) * 180.0 / math.Pi
        v * (if (math.abs(d - 1.0) < 1e-9) 1.0 else d)
      }
    }
    def linM(v: Double, unit: JsonNode): Double = {
      if (unit == null || unit.isTextual) unit match {
        case null => v
        case u if u.asText == "metre" => v
        case u if u.asText == "US survey foot" => v * FtUs
        case u if u.asText == "foot" => v * 0.3048
        case u => fail(s"linear unit '${u.asText}'")
      } else v * Option(unit.get("conversion_factor")).map(_.asDouble)
        .getOrElse(fail("linear unit without conversion_factor"))
    }

    def geogTokens(g: JsonNode): Seq[String] = {
      val datum = Option(g.get("datum")).orElse(Option(g.get("datum_ensemble")))
        .getOrElse(fail(s"${typ(g)} without datum/datum_ensemble"))
      val ell = Option(datum.get("ellipsoid")).getOrElse(fail("datum without ellipsoid"))
      val dName = Option(datum.get("name")).map(_.asText("")).getOrElse("").toLowerCase
      val a = Option(ell.get("semi_major_axis")).orElse(Option(ell.get("radius")))
        .map(_.asDouble).getOrElse(fail("ellipsoid without semi_major_axis"))
      val invF = Option(ell.get("inverse_flattening")).map(_.asDouble)
        .orElse(Option(ell.get("semi_minor_axis")).map(b => a / (a - b.asDouble)))
        .getOrElse(0.0)
      val base =
        if (dName.contains("world geodetic system 1984")) Seq("+datum=WGS84")
        else if (dName.contains("north american datum 1983")) Seq("+datum=NAD83")
        else ellpsTokens(a, invF)
      val pmDeg = Option(g.get("prime_meridian"))
        .flatMap(p => Option(p.get("longitude"))).map { lonNode =>
          if (lonNode.isNumber) lonNode.asDouble
          else angDeg(Option(lonNode.get("value")).map(_.asDouble)
            .getOrElse(fail("prime_meridian longitude without value")), lonNode.get("unit"))
        }.getOrElse(0.0)
      val pm =
        if (pmDeg == 0.0) Seq.empty
        else if (math.abs(pmDeg - ParisLon) < 1e-9) Seq("+pm=paris")
        else Seq(s"+pm=${pmDeg.toString}")
      base ++ pm
    }

    // BoundCRS: source + a WGS84-hub transformation -> +towgs84
    val (root, boundTow) =
      if (typ(root0) == "BoundCRS") {
        val src = Option(root0.get("source_crs")).getOrElse(fail("BoundCRS without source_crs"))
        Option(root0.get("target_crs")).foreach { tgt =>
          val tName = (Option(tgt.get("name")).map(_.asText("")).getOrElse("") + " " +
            Option(tgt.get("datum")).orElse(Option(tgt.get("datum_ensemble")))
              .flatMap(d => Option(d.get("name")).map(_.asText(""))).getOrElse("")).toLowerCase
          if (!tName.contains("wgs 84") && !tName.contains("world geodetic system 1984"))
            fail("BoundCRS target is not WGS84")
        }
        val tow = Option(root0.get("transformation")).map { t =>
          val method = Option(t.get("method")).flatMap(m => Option(m.get("name")))
            .map(_.asText("")).getOrElse("").toLowerCase
          val sgn = if (method.contains("coordinate frame")) -1.0 else 1.0
          val ps = scala.jdk.CollectionConverters.IteratorHasAsScala(
            Option(t.get("parameters")).map(_.elements()).getOrElse(fail("transformation without parameters"))
          ).asScala.map { p =>
            val n = Option(p.get("name")).map(_.asText("")).getOrElse("").toLowerCase
            val (v, unit) = valueUnit(p)
            n -> (v, Option(unit).flatMap(u => if (u.isTextual) Some(u.asText) else None).getOrElse(""))
          }.toMap
          def g(n: String): Double = ps.get(n).map(_._1).getOrElse(0.0)
          def rot(n: String): Double = ps.get(n).map { case (v, u) =>
            u match {
              case "" | "arc-second" => v
              case "milliarc-second" => v / 1000.0
              case "radian" => math.toDegrees(v) * 3600.0
              case other => fail(s"rotation unit '$other'")
            }
          }.getOrElse(0.0)
          val ds = ps.get("scale difference").map { case (v, u) =>
            // PROJJSON carries ppm explicitly; a unitless near-1 value
            // is the abridged ratio form
            if (u == "parts per million") v
            else if (u.isEmpty && math.abs(v - 1.0) < 0.01) (v - 1.0) * 1e6
            else if (u.isEmpty) v
            else fail(s"scale-difference unit '$u'")
          }.getOrElse(0.0)
          val seven = Seq(
            g("x-axis translation"), g("y-axis translation"), g("z-axis translation"),
            sgn * rot("x-axis rotation"), sgn * rot("y-axis rotation"),
            sgn * rot("z-axis rotation"), ds)
          val p7 = if (seven.drop(3).forall(_ == 0.0)) seven.take(3) else seven
          s"+towgs84=${p7.map(projFmt).mkString(",")}"
        }.toSeq
        (src, tow)
      } else (root0, Seq.empty[String])

    typ(root) match {
      case "GeographicCRS" | "GeodeticCRS" =>
        (Seq("+proj=longlat") ++ geogTokens(root) ++ boundTow :+ "+no_defs").mkString(" ")
      case "ProjectedCRS" =>
        val baseGeog = Option(root.get("base_crs")).getOrElse(fail("ProjectedCRS without base_crs"))
        val conv = Option(root.get("conversion")).getOrElse(fail("ProjectedCRS without conversion"))
        val method = Option(conv.get("method")).flatMap(m => Option(m.get("name")))
          .map(_.asText("")).getOrElse(fail("conversion without method")).toLowerCase
        val pmap: Map[String, (Double, JsonNode)] =
          scala.jdk.CollectionConverters.IteratorHasAsScala(
            Option(conv.get("parameters")).map(_.elements())
              .getOrElse(java.util.Collections.emptyIterator[JsonNode]())
          ).asScala.map { p =>
            val n = Option(p.get("name")).map(_.asText("")).getOrElse("").toLowerCase
            n -> valueUnit(p)
          }.toMap
        val core = epsgMethodCore(method,
          (d, ns) => ns.collectFirst(Function.unlift(pmap.get))
            .map { case (v, u) => angDeg(v, u) }.getOrElse(d),
          (d, ns) => ns.collectFirst(Function.unlift(pmap.get))
            .map { case (v, u) => linM(v, u) }.getOrElse(d),
          (d, ns) => ns.collectFirst(Function.unlift(pmap.get)).map(_._1).getOrElse(d))
        // CS axis unit -> +units / +to_meter
        val unitFactor = Option(root.get("coordinate_system"))
          .flatMap(cs => Option(cs.get("axis")))
          .flatMap(ax => if (ax.isArray && ax.size > 0) Option(ax.get(0).get("unit")) else None)
          .map { u =>
            if (u.isTextual) u.asText match {
              case "metre" => 1.0
              case "US survey foot" => FtUs
              case "foot" => 0.3048
              case other => fail(s"axis unit '$other'")
            } else Option(u.get("conversion_factor")).map(_.asDouble).getOrElse(1.0)
          }.getOrElse(1.0)
        val units =
          if (unitFactor == 1.0) Seq("+units=m")
          else if (math.abs(unitFactor - FtUs) < 1e-9) Seq("+units=us-ft")
          else if (math.abs(unitFactor - 0.3048) < 1e-9) Seq("+units=ft")
          else Seq(s"+to_meter=${unitFactor.toString}")
        (core ++ geogTokens(baseGeog) ++ boundTow ++ units :+ "+no_defs").mkString(" ")
      case other => fail(s"top-level type '$other'")
    }
  }

  private def projJsonImpl(proj4: String): String = {
    val kv = scala.collection.mutable.LinkedHashMap[String, String]()
    proj4.trim.split("\\s+").foreach { tok =>
      if (tok.startsWith("+")) {
        val body = tok.substring(1)
        val i = body.indexOf('=')
        if (i < 0) kv(body.toLowerCase) = ""
        else kv(body.substring(0, i).toLowerCase) = body.substring(i + 1)
      }
    }
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"no PROJJSON form: $msg")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    def jnum(v: Double): String =
      if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString else v.toString
    def num(k: String, dflt: Double): Double =
      kv.get(k).map(_.toDouble).getOrElse(dflt)
    val proj = kv.getOrElse("proj", fail("missing +proj"))

    // datum/ellipsoid resolution mirrors parseProjString
    val datum = kv.get("datum").flatMap(datumByName)
    val ell: Ellipsoid = datum.map(_._1)
      .orElse(kv.get("ellps").flatMap(ellpsByName))
      .getOrElse {
        (kv.get("a"), kv.get("b"), kv.get("rf")) match {
          case (Some(a), Some(b), _) =>
            val av = a.toDouble; Ellipsoid(av, (av - b.toDouble) / av)
          case (Some(a), None, Some(rf)) =>
            val r = rf.toDouble; Ellipsoid(a.toDouble, if (r == 0) 0.0 else 1.0 / r)
          case (Some(a), None, None) => Ellipsoid(a.toDouble, 0.0)
          case _ => WGS84
        }
      }
    val ellName = Seq(
      "WGS 84" -> WGS84, "GRS 1980" -> GRS80, "Airy 1830" -> Airy1830,
      "Airy Modified 1849" -> AiryModified, "Bessel 1841" -> Bessel1841,
      "International 1924" -> International1924, "Clarke 1866" -> Clarke1866,
      "Clarke 1880 (IGN)" -> Clarke1880IGN, "Krassowsky 1940" -> Krassowsky1940)
      .find { case (_, e) =>
        math.abs(e.a - ell.a) < 1e-4 && math.abs(e.f - ell.f) < 1e-12
      }.map(_._1).getOrElse("unknown")
    val datumName = kv.get("datum").map(_.toLowerCase) match {
      case Some("wgs84") => "World Geodetic System 1984"
      case Some("nad83") => "North American Datum 1983"
      case Some("nad27") => "North American Datum 1927"
      case Some("osgb36") => "Ordnance Survey of Great Britain 1936"
      case Some("potsdam") => "Deutsches Hauptdreiecksnetz"
      case Some("ire65") => "TM65"
      case Some("ntf") => "Nouvelle Triangulation Francaise"
      case _ =>
        if (ellName == "unknown") "unknown"
        else s"Unknown based on $ellName ellipsoid"
    }
    val ellJson =
      if (ell.f == 0.0)
        s"""{"name":"${esc(ellName)}","radius":${jnum(ell.a)}}"""
      else
        s"""{"name":"${esc(ellName)}","semi_major_axis":${jnum(ell.a)},"inverse_flattening":${jnum(if (ell.f == 0) 0 else 1.0 / ell.f)}}"""
    val pmDeg = kv.get("pm").map {
      case p if p.equalsIgnoreCase("paris") => ParisLon
      case p if p.equalsIgnoreCase("greenwich") => 0.0
      case p => p.toDouble
    }.getOrElse(0.0)
    val pmJson =
      if (pmDeg == 0.0) ""
      else s""","prime_meridian":{"name":"${if (math.abs(pmDeg - ParisLon) < 1e-9) "Paris" else "unknown"}","longitude":${jnum(pmDeg)}}"""
    val geogJson =
      s"""{"type":"GeographicCRS","name":"${esc(datumName)}","datum":{"type":"GeodeticReferenceFrame","name":"${esc(datumName)}","ellipsoid":$ellJson$pmJson},"coordinate_system":{"subtype":"ellipsoidal","axis":[{"name":"Longitude","abbreviation":"lon","direction":"east","unit":"degree"},{"name":"Latitude","abbreviation":"lat","direction":"north","unit":"degree"}]}}"""
    val schema = """"$schema":"https://proj.org/schemas/v0.7/projjson.schema.json""""
    if (proj.toLowerCase == "longlat" || proj.toLowerCase == "latlong" ||
        proj.toLowerCase == "lonlat")
      return s"""{$schema,${geogJson.substring(1)}"""

    // projected: method name + EPSG parameter names per family
    val lat0 = num("lat_0", 0.0); val lon0 = num("lon_0", 0.0)
    val k0 = kv.get("k_0").orElse(kv.get("k")).map(_.toDouble).getOrElse(1.0)
    val x0 = num("x_0", 0.0); val y0 = num("y_0", 0.0)
    type P = (String, Double, String) // name, value, unit
    def nat(extra: Seq[P] = Seq.empty): Seq[P] = Seq(
      ("Latitude of natural origin", lat0, "degree"),
      ("Longitude of natural origin", lon0, "degree")) ++ extra ++ Seq(
      ("False easting", x0, "metre"),
      ("False northing", y0, "metre"))
    val scaleP: P = ("Scale factor at natural origin", k0, "unity")
    val (methodName, methodCode, params): (String, Int, Seq[P]) =
      proj.toLowerCase match {
        case "tmerc" | "etmerc" =>
          ("Transverse Mercator", 9807, nat(Seq(scaleP)))
        case "utm" =>
          val z = kv.getOrElse("zone", fail("+proj=utm needs +zone")).toInt
          ("Transverse Mercator", 9807, Seq(
            ("Latitude of natural origin", 0.0, "degree"),
            ("Longitude of natural origin", (z * 6 - 183).toDouble, "degree"),
            ("Scale factor at natural origin", 0.9996, "unity"),
            ("False easting", 500000.0, "metre"),
            ("False northing", if (kv.contains("south")) 10000000.0 else 0.0, "metre")))
        case "lcc" if kv.contains("lat_2") =>
          ("Lambert Conic Conformal (2SP)", 9802, Seq(
            ("Latitude of false origin", lat0, "degree"),
            ("Longitude of false origin", lon0, "degree"),
            ("Latitude of 1st standard parallel", num("lat_1", lat0), "degree"),
            ("Latitude of 2nd standard parallel", num("lat_2", lat0), "degree"),
            ("Easting at false origin", x0, "metre"),
            ("Northing at false origin", y0, "metre")))
        case "lcc" =>
          ("Lambert Conic Conformal (1SP)", 9801, Seq(
            ("Latitude of natural origin", num("lat_1", lat0), "degree"),
            ("Longitude of natural origin", lon0, "degree"),
            ("Scale factor at natural origin", k0, "unity"),
            ("False easting", x0, "metre"),
            ("False northing", y0, "metre")))
        case "aea" =>
          ("Albers Equal Area", 9822, Seq(
            ("Latitude of false origin", lat0, "degree"),
            ("Longitude of false origin", lon0, "degree"),
            ("Latitude of 1st standard parallel", num("lat_1", 0.0), "degree"),
            ("Latitude of 2nd standard parallel", num("lat_2", 0.0), "degree"),
            ("Easting at false origin", x0, "metre"),
            ("Northing at false origin", y0, "metre")))
        case "laea" =>
          ("Lambert Azimuthal Equal Area", 9820, nat())
        case "webmerc" =>
          ("Popular Visualisation Pseudo Mercator", 1024, nat())
        case "merc" if kv.contains("lat_ts") =>
          ("Mercator (variant B)", 9805, Seq(
            ("Latitude of 1st standard parallel", num("lat_ts", 0.0), "degree"),
            ("Longitude of natural origin", lon0, "degree"),
            ("False easting", x0, "metre"),
            ("False northing", y0, "metre")))
        case "merc" =>
          ("Mercator (variant A)", 9804, nat(Seq(scaleP)))
        case "stere" if kv.contains("lat_ts") =>
          ("Polar Stereographic (variant B)", 9829, Seq(
            ("Latitude of standard parallel", num("lat_ts", 0.0), "degree"),
            ("Longitude of origin", lon0, "degree"),
            ("False easting", x0, "metre"),
            ("False northing", y0, "metre")))
        case "stere" =>
          ("Polar Stereographic (variant A)", 9810, nat(Seq(scaleP)))
        case "sterea" =>
          ("Oblique Stereographic", 9809, nat(Seq(scaleP)))
        case "somerc" =>
          ("Hotine Oblique Mercator (variant B)", 9815, Seq(
            ("Latitude of projection centre", lat0, "degree"),
            ("Longitude of projection centre", lon0, "degree"),
            ("Azimuth at projection centre", 90.0, "degree"),
            ("Angle from Rectified to Skew Grid", 90.0, "degree"),
            ("Scale factor at projection centre", k0, "unity"),
            ("Easting at projection centre", x0, "metre"),
            ("Northing at projection centre", y0, "metre")))
        case "eqc" =>
          ("Equidistant Cylindrical", 1028, Seq(
            ("Latitude of 1st standard parallel", num("lat_ts", 0.0), "degree"),
            ("Longitude of natural origin", lon0, "degree"),
            ("False easting", x0, "metre"),
            ("False northing", y0, "metre")))
        case "krovak" =>
          ("Krovak (East North Orientated)", 1041, Seq(
            ("Latitude of projection centre", num("lat_0", 49.5), "degree"),
            ("Longitude of origin", num("lon_0", 24.833333333333332), "degree"),
            ("Co-latitude of cone axis", num("alpha", 30.28813972222222), "degree"),
            ("Latitude of pseudo standard parallel", 78.5, "degree"),
            ("Scale factor on pseudo standard parallel",
              kv.get("k_0").orElse(kv.get("k")).map(_.toDouble).getOrElse(0.9999), "unity"),
            ("False easting", x0, "metre"),
            ("False northing", y0, "metre")))
        case other => fail(s"+proj=$other")
      }
    val paramJson = params.map { case (n, v, u) =>
      s"""{"name":"${esc(n)}","value":${jnum(v)},"unit":"$u"}"""
    }.mkString(",")
    // +units / +to_meter describe the CS axis unit
    val (unitName, unitFactor) = kv.get("units").map {
      case "m" => ("metre", 1.0)
      case "us-ft" => ("US survey foot", FtUs)
      case "ft" => ("foot", 0.3048)
      case u => (u, kv.get("to_meter").map(_.toDouble).getOrElse(1.0))
    }.getOrElse(kv.get("to_meter").map(t => ("unknown", t.toDouble)).getOrElse(("metre", 1.0)))
    val unitJson =
      if (unitFactor == 1.0) s""""$unitName""""
      else s"""{"type":"LinearUnit","name":"${esc(unitName)}","conversion_factor":${jnum(unitFactor)}}"""
    s"""{$schema,"type":"ProjectedCRS","name":"unknown","base_crs":$geogJson,"conversion":{"name":"unknown","method":{"name":"${esc(methodName)}","id":{"authority":"EPSG","code":$methodCode}},"parameters":[$paramJson]},"coordinate_system":{"subtype":"Cartesian","axis":[{"name":"Easting","abbreviation":"E","direction":"east","unit":$unitJson},{"name":"Northing","abbreviation":"N","direction":"north","unit":$unitJson}]}}"""
  }

  private def projFmt(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString

  private def ellpsTokens(a: Double, invF: Double): Seq[String] = {
    val known = Seq(
      "WGS84" -> WGS84, "GRS80" -> GRS80, "airy" -> Airy1830,
      "mod_airy" -> AiryModified, "bessel" -> Bessel1841,
      "intl" -> International1924, "clrk66" -> Clarke1866,
      "clrk80ign" -> Clarke1880IGN, "krass" -> Krassowsky1940)
    val f = if (invF == 0) 0.0 else 1.0 / invF
    known.find { case (_, e) =>
      math.abs(e.a - a) < 1e-4 && math.abs(e.f - f) < 1e-12
    } match {
      case Some((name, _)) => Seq(s"+ellps=$name")
      case None => Seq(s"+a=${projFmt(a)}", s"+rf=${projFmt(invF)}")
    }
  }


  /** EPSG conversion-method name -> core proj tokens — ONE decision
   *  point shared by the WKT2 (ISO 19162) and PROJJSON readers: both
   *  carry the same published EPSG method/parameter names, and mapping
   *  them twice would invite semantic divergence. The accessors return
   *  values already converted to degrees / metres / unity. */
  private def epsgMethodCore(method: String,
      angOf: (Double, Seq[String]) => Double,
      linOf: (Double, Seq[String]) => Double,
      scaOf: (Double, Seq[String]) => Double): Seq[String] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"unsupported CRS conversion: $msg")
    def ang(dflt: Double, names: String*): Double = angOf(dflt, names)
    def lin(dflt: Double, names: String*): Double = linOf(dflt, names)
    def sca(dflt: Double, names: String*): Double = scaOf(dflt, names)
    val lat0 = ang(0, "latitude of natural origin", "latitude of origin")
    val lon0 = ang(0, "longitude of natural origin", "central meridian")
    val k0 = sca(1.0, "scale factor at natural origin", "scale factor")
    val x0 = lin(0, "false easting")
    val y0 = lin(0, "false northing")
    // false-origin family (lcc 2sp / albers)
    val latF = ang(0, "latitude of false origin")
    val lonF = ang(0, "longitude of false origin")
    val xF = lin(0, "easting at false origin")
    val yF = lin(0, "northing at false origin")
    val sp1 = Some(ang(Double.NaN, "latitude of 1st standard parallel")).filterNot(_.isNaN)
    val sp2 = Some(ang(Double.NaN, "latitude of 2nd standard parallel")).filterNot(_.isNaN)
    def fmt(v: Double) = projFmt(v)
    method match {
      case m if m.contains("transverse mercator") && !m.contains("south") =>
        Seq("+proj=tmerc", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}",
          s"+k=${k0.toString}", s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("lambert conic conformal") &&
          (m.contains("belgium") || m.contains("michigan")) =>
        // EPSG 9803/1051 carry corrections plain 2SP math would
        // silently drop — fail loudly like other unsupported methods
        fail(s"METHOD '$m'")
      case m if m.contains("lambert conic conformal") && m.contains("2sp") =>
        Seq("+proj=lcc", s"+lat_0=${fmt(latF)}", s"+lon_0=${fmt(lonF)}",
          s"+lat_1=${fmt(sp1.getOrElse(latF))}", s"+lat_2=${fmt(sp2.getOrElse(latF))}",
          s"+x_0=${fmt(xF)}", s"+y_0=${fmt(yF)}")
      case m if m.contains("lambert conic conformal") =>
        // 1SP: natural-origin family; cone follows the origin latitude
        Seq("+proj=lcc", s"+lat_1=${fmt(lat0)}", s"+lat_0=${fmt(lat0)}",
          s"+lon_0=${fmt(lon0)}", s"+k_0=${k0.toString}",
          s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("albers") =>
        Seq("+proj=aea", s"+lat_0=${fmt(latF)}", s"+lon_0=${fmt(lonF)}",
          s"+lat_1=${fmt(sp1.getOrElse(0.0))}", s"+lat_2=${fmt(sp2.getOrElse(0.0))}",
          s"+x_0=${fmt(xF)}", s"+y_0=${fmt(yF)}")
      case m if m.contains("lambert azimuthal equal area") =>
        Seq("+proj=laea", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}",
          s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("hotine oblique mercator (variant b)") =>
        // Swiss/Hungarian somerc: azimuth 90 at the projection centre
        val az = ang(0, "azimuth of initial line", "azimuth at projection centre")
        if (math.abs(az - 90.0) > 1e-9)
          fail(s"Hotine oblique Mercator with azimuth $az (somerc form only)")
        val kSom = sca(1.0, "scale factor on initial line",
          "scale factor at projection centre")
        if (kSom != 1.0)
          fail(s"Hotine oblique Mercator with scale $kSom (somerc form only)")
        Seq("+proj=somerc",
          s"+lat_0=${fmt(ang(0, "latitude of projection centre"))}",
          s"+lon_0=${fmt(ang(0, "longitude of projection centre"))}",
          s"+x_0=${fmt(lin(0, "easting at projection centre"))}",
          s"+y_0=${fmt(lin(0, "northing at projection centre"))}")
      case m if m.contains("pseudo mercator") || m.contains("pseudo-mercator") =>
        // mirror the WKT1 mercator_auxiliary_sphere guard: webmerc
        // has no natural-origin/false-origin freedom here
        if (lon0 != 0.0 || x0 != 0.0 || y0 != 0.0)
          fail(s"Pseudo-Mercator with non-zero origin (lon_0=$lon0 x_0=$x0 y_0=$y0)")
        Seq("+proj=webmerc")
      case m if m.contains("mercator (variant a)") =>
        Seq("+proj=merc", s"+lon_0=${fmt(lon0)}", s"+k=${k0.toString}",
          s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("mercator (variant b)") =>
        Seq("+proj=merc", s"+lon_0=${fmt(lon0)}",
          s"+lat_ts=${fmt(sp1.getOrElse(0.0))}",
          s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("polar stereographic (variant a)") =>
        Seq("+proj=stere", s"+lat_0=${fmt(if (lat0 < 0) -90.0 else 90.0)}",
          s"+lon_0=${fmt(lon0)}", s"+k=${k0.toString}",
          s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("polar stereographic") =>
        val ts = ang(lat0, "latitude of standard parallel")
        val lo = ang(0, "longitude of origin", "longitude of natural origin")
        Seq("+proj=stere", s"+lat_0=${fmt(if (ts < 0) -90.0 else 90.0)}",
          s"+lat_ts=${fmt(ts)}", s"+lon_0=${fmt(lo)}",
          s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("oblique stereographic") =>
        Seq("+proj=sterea", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}",
          s"+k=${k0.toString}", s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("equidistant cylindrical") =>
        // thread sp1 through so parseProjString's lat_ts guard
        // decides (it rejects non-zero) instead of mis-projecting
        Seq("+proj=eqc", s"+lat_ts=${fmt(sp1.getOrElse(0.0))}",
          s"+lon_0=${fmt(lon0)}",
          s"+x_0=${fmt(x0)}", s"+y_0=${fmt(y0)}")
      case m if m.contains("krovak") &&
          (m.contains("east north") || m.contains("east-north")) =>
        val psp = ang(78.5, "latitude of pseudo standard parallel")
        if (math.abs(psp - 78.5) > 1e-9)
          fail(s"Krovak pseudo standard parallel $psp (78.5 only)")
        Seq("+proj=krovak",
          s"+lat_0=${fmt(ang(49.5, "latitude of projection centre"))}",
          s"+lon_0=${fmt(ang(24.833333333333332, "longitude of origin", "longitude of projection centre"))}",
          s"+alpha=${fmt(ang(30.28813972222222, "co-latitude of cone axis", "azimuth of initial line"))}",
          s"+k=${sca(0.9999, "scale factor on pseudo standard parallel").toString}",
          s"+x_0=${fmt(lin(0, "false easting"))}", s"+y_0=${fmt(lin(0, "false northing"))}")
      case m if m.contains("krovak") =>
        // plain EPSG 9819 carries south-west axes in the CS, which this
        // proj4 composition cannot express — fail, don't flip silently
        fail(s"METHOD '$m' (only the East-North-orientated variant is supported)")
      case other => fail(s"METHOD '$other'")
    }
  }

  private def wktToProj4Impl(wktText: String): String = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"unsupported WKT CRS: $msg")
    val root = parseWktTree(wktText.trim)
    if (root.name == "PROJCRS" || root.name == "GEOGCRS" ||
        root.name == "GEODCRS" || root.name == "BOUNDCRS")
      return wkt2ToProj4(root)
    def fmt(v: Double): String = projFmt(v)
    // geog tokens: datum/ellipsoid, TOWGS84 passthrough, prime
    // meridian; the +datum shorthands are WGS84-frame no-ops ONLY —
    // NAD27 must NOT map to +datum=NAD27 (that would inject a Helmert
    // the TOWGS84-less source WKT does not carry)
    def geogTokens(g: WktNode): (Seq[String], Double) = {
      val datum = g.child("DATUM").getOrElse(fail("GEOGCS without DATUM"))
      val sph = datum.child("SPHEROID").orElse(datum.child("ELLIPSOID"))
        .getOrElse(fail("DATUM without SPHEROID"))
      val dName = datum.str(0).toLowerCase
      val base =
        if (dName.contains("wgs_1984") || dName.contains("wgs84")) Seq("+datum=WGS84")
        else if (dName.contains("north_american_1983")) Seq("+datum=NAD83")
        else ellpsTokens(sph.dbl(1), sph.dbl(2))
      val tow = datum.child("TOWGS84").map { t =>
        val ps = t.values.collect { case d: Double => d }
        if (ps.length != 3 && ps.length != 7) fail("TOWGS84 needs 3 or 7 values")
        s"+towgs84=${ps.map(fmt).mkString(",")}"
      }.toSeq
      // degree units must convert by EXACTLY 1 (the rounded literal
      // times 180/pi lands 1 ulp above 1.0 — pole-origin NaN)
      val degPerUnit = g.child("UNIT").map(_.dbl(1) * 180.0 / math.Pi)
        .map(u => if (math.abs(u - 1.0) < 1e-9) 1.0 else u).getOrElse(1.0)
      val pmDeg = g.child("PRIMEM").map(_.dbl(1) * degPerUnit).getOrElse(0.0)
      val pm =
        if (pmDeg == 0.0) Seq.empty
        else if (math.abs(pmDeg - ParisLon) < 1e-9) Seq("+pm=paris")
        else Seq(s"+pm=${pmDeg.toString}")
      (base ++ tow ++ pm, degPerUnit)
    }
    if (root.name == "GEOGCS") {
      val (g, _) = geogTokens(root)
      return (Seq("+proj=longlat") ++ g :+ "+no_defs").mkString(" ")
    }
    if (root.name != "PROJCS") fail(s"top-level ${root.name} (PROJCS/GEOGCS only)")
    val geog = root.child("GEOGCS").getOrElse(fail("PROJCS without GEOGCS"))
    val (gTokens, degPerUnit) = geogTokens(geog)
    val params: Map[String, Double] = root.children("PARAMETER")
      .map(pn => pn.str(0).toLowerCase -> pn.dbl(1)).toMap
    def ang(d: Double, names: String*): Double =
      names.flatMap(params.get).headOption.map(_ * degPerUnit).getOrElse(d)
    def lin(d: Double, names: String*): Double =
      names.flatMap(params.get).headOption.getOrElse(d)
    // linear UNIT (meters per unit); false origins are stated in it,
    // proj +x_0/+y_0 are always meters
    val unit = root.children("UNIT").lastOption.map(_.dbl(1)).getOrElse(1.0)
    val lat0 = ang(0, "latitude_of_origin", "latitude_of_center")
    val lon0 = ang(0, "central_meridian", "longitude_of_origin", "longitude_of_center")
    val sp1 = params.get("standard_parallel_1").map(_ * degPerUnit)
    val sp2 = params.get("standard_parallel_2").map(_ * degPerUnit)
    val k0 = lin(1.0, "scale_factor")
    val x0m = lin(0, "false_easting") * unit
    val y0m = lin(0, "false_northing") * unit
    val projName = root.child("PROJECTION").map(_.str(0).toLowerCase)
      .getOrElse(fail("PROJCS without PROJECTION"))
    val core: Seq[String] = projName match {
      case "transverse_mercator" | "gauss_kruger" =>
        Seq("+proj=tmerc", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}", s"+k=${k0.toString}")
      case "lambert_conformal_conic_2sp" =>
        Seq("+proj=lcc", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}",
          s"+lat_1=${fmt(sp1.getOrElse(lat0))}", s"+lat_2=${fmt(sp2.getOrElse(lat0))}")
      case "lambert_conformal_conic" | "lambert_conformal_conic_1sp" =>
        if (sp2.isDefined)
          Seq("+proj=lcc", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}",
            s"+lat_1=${fmt(sp1.getOrElse(lat0))}", s"+lat_2=${fmt(sp2.get)}")
        else {
          // 1SP: rho0 reference = latitude of origin when stated,
          // else the standard parallel (EPSG 9801 puts them together)
          val sp = sp1.getOrElse(lat0)
          val lat0Ref =
            if (params.contains("latitude_of_origin") ||
              params.contains("latitude_of_center")) lat0 else sp
          Seq("+proj=lcc", s"+lat_1=${fmt(sp)}", s"+lat_0=${fmt(lat0Ref)}",
            s"+lon_0=${fmt(lon0)}", s"+k_0=${k0.toString}")
        }
      case "albers" | "albers_conic_equal_area" =>
        Seq("+proj=aea", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}",
          s"+lat_1=${fmt(sp1.getOrElse(0.0))}", s"+lat_2=${fmt(sp2.getOrElse(0.0))}")
      case "lambert_azimuthal_equal_area" =>
        Seq("+proj=laea", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}")
      case "mercator_1sp" =>
        Seq("+proj=merc", s"+lon_0=${fmt(lon0)}", s"+k=${k0.toString}")
      case "mercator" | "mercator_2sp" =>
        // standard parallel wins; otherwise the scale factor carries
        Seq("+proj=merc", s"+lon_0=${fmt(lon0)}") ++
          sp1.map(ts => s"+lat_ts=${fmt(ts)}").orElse(Some(s"+k=${k0.toString}"))
      case "mercator_auxiliary_sphere" =>
        if (x0m != 0 || y0m != 0) fail("Mercator_Auxiliary_Sphere with false origins")
        Seq("+proj=webmerc")
      case "polar_stereographic_variant_a" =>
        Seq("+proj=stere", s"+lat_0=${fmt(if (lat0 < 0) -90.0 else 90.0)}",
          s"+lon_0=${fmt(lon0)}", s"+k=${k0.toString}")
      case "polar_stereographic" | "polar_stereographic_variant_b" =>
        // a stated non-unit scale factor means variant A even under
        // the plain name (GDAL emits EPSG:5041-style WKT this way)
        if (params.contains("scale_factor") && k0 != 1.0)
          Seq("+proj=stere", s"+lat_0=${fmt(if (lat0 < 0) -90.0 else 90.0)}",
            s"+lon_0=${fmt(lon0)}", s"+k=${k0.toString}")
        else
          Seq("+proj=stere", s"+lat_0=${fmt(if (lat0 < 0) -90.0 else 90.0)}",
            s"+lat_ts=${fmt(sp1.getOrElse(lat0))}", s"+lon_0=${fmt(lon0)}")
      case "oblique_stereographic" | "double_stereographic" =>
        Seq("+proj=sterea", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}", s"+k=${k0.toString}")
      case "hotine_oblique_mercator_azimuth_center" | "swiss_oblique_cylindrical" =>
        Seq("+proj=somerc", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}")
      case "equidistant_cylindrical" | "equirectangular" | "plate_carree" =>
        Seq("+proj=eqc", s"+lon_0=${fmt(lon0)}")
      case "krovak" =>
        // ESRI models East-North Krovak via X_Scale=-1 / Y_Scale=1 /
        // XY_Plane_Rotation=90 — the only orientation this engine has
        if (lin(-1.0, "x_scale") != -1.0 || lin(1.0, "y_scale") != 1.0 ||
            lin(90.0, "xy_plane_rotation") != 90.0)
          fail("Krovak south-west orientation (need X_Scale/Y_Scale/XY_Plane_Rotation = -1/1/90)")
        val psp = ang(78.5, "pseudo_standard_parallel_1")
        if (math.abs(psp - 78.5) > 1e-9)
          fail(s"Krovak pseudo standard parallel $psp (78.5 only)")
        Seq("+proj=krovak", s"+lat_0=${fmt(lat0)}", s"+lon_0=${fmt(lon0)}",
          s"+alpha=${fmt(ang(30.28813972222222, "azimuth"))}",
          s"+k=${lin(0.9999, "scale_factor").toString}")
      case other => fail(s"PROJECTION '$other'")
    }
    val units =
      if (unit == 1.0) Seq("+units=m")
      else if (math.abs(unit - FtUs) < 1e-9) Seq("+units=us-ft") // .prj literals truncate
      else if (math.abs(unit - 0.3048) < 1e-9) Seq("+units=ft")
      else Seq(s"+to_meter=${unit.toString}")
    (core ++ Seq(s"+x_0=${fmt(x0m)}", s"+y_0=${fmt(y0m)}") ++
      gTokens ++ units :+ "+no_defs").mkString(" ")
  }

  /** WKT2 (ISO 19162, the PROJCRS/GEOGCRS form PROJ >= 6 and QGIS
   *  emit) onto the same canonical proj4 string WKT1 composes through
   *  — ONE decision point ([[parseProjString]]) still owns transform
   *  semantics. Covers PROJCRS/GEOGCRS/GEODCRS plus BOUNDCRS (the
   *  WKT2 carrier of the towgs84 ballpark transformation). The
   *  reference accepts these via PROJ (proj/functions.cpp:488-517). */
  private def wkt2ToProj4(root0: WktNode): String = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"unsupported WKT2 CRS: $msg")
    // BOUNDCRS[SOURCECRS[crs], TARGETCRS[wgs84], ABRIDGEDTRANSFORMATION[...]]
    val (root, boundTow) =
      if (root0.name == "BOUNDCRS") {
        val src = root0.child("SOURCECRS")
          .flatMap(_.values.collectFirst { case w: WktNode => w })
          .getOrElse(fail("BOUNDCRS without SOURCECRS"))
        // the ABRIDGEDTRANSFORMATION is only a towgs84 shift when the
        // hub really is WGS84 — a different TARGETCRS would mis-read it
        root0.child("TARGETCRS")
          .flatMap(_.values.collectFirst { case w: WktNode => w })
          .foreach { tgt =>
            val datumName = tgt.child("DATUM").orElse(tgt.child("ENSEMBLE"))
              .map(_.str(0).toLowerCase).getOrElse("")
            if (!datumName.contains("world geodetic system 1984") &&
                !tgt.str(0).toLowerCase.contains("wgs 84"))
              fail("BOUNDCRS target is not WGS84")
          }
        val tow = root0.child("ABRIDGEDTRANSFORMATION").map { t =>
          val method = t.child("METHOD").map(_.str(0).toLowerCase).getOrElse("")
          val ps = t.children("PARAMETER")
            .map(p => p.str(0).toLowerCase -> p.dbl(1)).toMap
          def g(n: String): Double = ps.getOrElse(n, 0.0)
          // abridged scale difference is carried as the ratio M = 1 + dS*1e-6;
          // coordinate-frame rotations are the position-vector negation
          val sgn = if (method.contains("coordinate frame")) -1.0 else 1.0
          val ds = ps.get("scale difference").map(m => (m - 1.0) * 1e6).getOrElse(0.0)
          val seven = Seq(
            g("x-axis translation"), g("y-axis translation"), g("z-axis translation"),
            sgn * g("x-axis rotation"), sgn * g("y-axis rotation"),
            sgn * g("z-axis rotation"), ds)
          val p =
            if (seven.drop(3).forall(_ == 0.0)) seven.take(3) else seven
          s"+towgs84=${p.map(projFmt).mkString(",")}"
        }.toSeq
        (src, tow)
      } else (root0, Seq.empty[String])

    // unit factors: per-node ANGLEUNIT (radians per unit -> degrees per
    // unit, snapped so the rounded degree literal converts by EXACTLY 1
    // — same ulp trap as WKT1) and LENGTHUNIT (metres per unit)
    def angFactor(n: WktNode): Double =
      n.child("ANGLEUNIT").orElse(n.child("UNIT")).map { u =>
        val d = u.dbl(1) * 180.0 / math.Pi
        if (math.abs(d - 1.0) < 1e-9) 1.0 else d
      }.getOrElse(1.0)
    def lenFactor(n: WktNode): Double =
      n.child("LENGTHUNIT").orElse(n.child("UNIT")).map(_.dbl(1)).getOrElse(1.0)

    def geogTokens2(g: WktNode): Seq[String] = {
      val datum = g.child("DATUM").orElse(g.child("ENSEMBLE")).orElse(g.child("TRF"))
        .getOrElse(fail(s"${g.name} without DATUM/ENSEMBLE"))
      val ell = datum.child("ELLIPSOID").orElse(datum.child("SPHEROID"))
        .getOrElse(fail("DATUM without ELLIPSOID"))
      val a = ell.dbl(1) * lenFactor(ell)
      val invF = ell.dbl(2)
      val dName = datum.str(0).toLowerCase
      val base =
        if (dName.contains("world geodetic system 1984")) Seq("+datum=WGS84")
        else if (dName.contains("north american datum 1983")) Seq("+datum=NAD83")
        else ellpsTokens(a, invF)
      val pmDeg = g.child("PRIMEM").map(p => p.dbl(1) * angFactor(p)).getOrElse(0.0)
      val pm =
        if (pmDeg == 0.0) Seq.empty
        else if (math.abs(pmDeg - ParisLon) < 1e-9) Seq("+pm=paris")
        else Seq(s"+pm=${pmDeg.toString}")
      base ++ pm
    }

    root.name match {
      case "GEOGCRS" | "GEODCRS" =>
        (Seq("+proj=longlat") ++ geogTokens2(root) ++ boundTow :+ "+no_defs").mkString(" ")
      case "PROJCRS" =>
        val baseGeog = root.child("BASEGEOGCRS").orElse(root.child("BASEGEODCRS"))
          .getOrElse(fail("PROJCRS without BASEGEOGCRS"))
        val conv = root.child("CONVERSION").getOrElse(fail("PROJCRS without CONVERSION"))
        val method = conv.child("METHOD").getOrElse(fail("CONVERSION without METHOD"))
          .str(0).toLowerCase
        val pnodes: Map[String, WktNode] = conv.children("PARAMETER")
          .map(p => p.str(0).toLowerCase -> p).toMap
        def ang(dflt: Double, names: String*): Double =
          names.flatMap(pnodes.get).headOption
            .map(p => p.dbl(1) * angFactor(p)).getOrElse(dflt)
        def lin(dflt: Double, names: String*): Double =
          names.flatMap(pnodes.get).headOption
            .map(p => p.dbl(1) * lenFactor(p)).getOrElse(dflt)
        def sca(dflt: Double, names: String*): Double =
          names.flatMap(pnodes.get).headOption.map(_.dbl(1)).getOrElse(dflt)
        val core: Seq[String] = epsgMethodCore(method,
          (d, ns) => ang(d, ns: _*), (d, ns) => lin(d, ns: _*), (d, ns) => sca(d, ns: _*))
        // CS unit: a PROJCRS-level LENGTHUNIT after the axes, or the
        // first axis's own unit (GDAL emits both spellings)
        val unit = root.child("LENGTHUNIT").map(_.dbl(1))
          .orElse(root.children("AXIS").headOption.flatMap(a =>
            a.child("LENGTHUNIT").map(_.dbl(1))))
          .getOrElse(1.0)
        val units =
          if (unit == 1.0) Seq("+units=m")
          else if (math.abs(unit - FtUs) < 1e-9) Seq("+units=us-ft")
          else if (math.abs(unit - 0.3048) < 1e-9) Seq("+units=ft")
          else Seq(s"+to_meter=${unit.toString}")
        // false origins above are already converted to metres
        // (lenFactor), so x_0/y_0 stay as emitted by the core arm
        (core ++ geogTokens2(baseGeog) ++ boundTow ++ units :+ "+no_defs").mkString(" ")
      case other => fail(s"top-level $other")
    }
  }


  /** Digits after the 5-char "EPSG:"/"ESRI:" prefix as an Int, or -1 when
   *  non-numeric — pattern guards must not throw mid-match, so malformed
   *  codes like "EPSG:4bad" fall through to the catalog-pointer error. */
  private def epsgNum(c: String): Int = {
    val d = c.drop(5)
    if (d.nonEmpty && d.length <= 9 && d.forall(_.isDigit)) d.toInt else -1
  }

  def resolve(crsIn: String): System = {
    val trimmed = crsIn.trim
    // text-form keys are arbitrary user strings (a per-row CRS column
    // can mint unboundedly many) — bound the cache like the covering
    // cache does
    if (cache.size > 4096) cache.clear()
    if (trimmed.startsWith("+"))
      return cache.computeIfAbsent(trimmed, parseProjString(_))
    // PROJJSON documents compose through the same proj4 path as WKT2
    // (parseProjString already xy-orders geographic results)
    if (trimmed.startsWith("{"))
      return cache.computeIfAbsent(trimmed, t => parseProjString(projJsonToProj4(t)))
    val upHead = trimmed.take(8).toUpperCase
    if (upHead.startsWith("PROJCS") || upHead.startsWith("GEOGCS") ||
        upHead.startsWith("PROJCRS") || upHead.startsWith("GEOGCRS") ||
        upHead.startsWith("GEODCRS") || upHead.startsWith("BOUNDCRS"))
      return cache.computeIfAbsent(trimmed, parseWkt1(_))
    val crs = crsIn.trim.toUpperCase
    val cached = cache.get(crs)
    if (cached != null) return cached
    val sys = crs match {
      case "WGS84" | "CRS84" | "OGC:CRS84" => Geographic
      case "EPSG:900913" => WebMercator
      case c if byKey.contains(c) => byKey(c).build()
      case c if c.startsWith("EPSG:321") && c.length == 10 => // NAD83 / MTM 1-17
        val code = epsgNum(c)
        if (code >= 32181 && code <= 32197) {
          val zone = code - 32180
          // Canadian Modified TM: 3° zones, k0 0.9999, FE 304 800 m.
          // Newfoundland zones 1-2 sit off the grid; zones 3-11 run
          // -58.5° .. -82.5° in 3° steps; the Ontario series 12-17
          // restarts at -81° (published NRCan/EPSG table)
          val lon0 = zone match {
            case 1 => -53.0
            case 2 => -56.0
            case z if z <= 11 => -49.5 - 3.0 * z
            case z => -81.0 - 3.0 * (z - 12)
          }
          new TransMerc(GRS80, 0.0, lon0, 0.9999, 304800.0, 0.0)
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:32") && c.length == 10 => // EPSG:326xx / EPSG:327xx
        val code = epsgNum(c)
        if (code >= 32601 && code <= 32660)
          new TransMerc(WGS84, 0, (code - 32600) * 6 - 183, 0.9996, 500000.0, 0.0)
        else if (code >= 32701 && code <= 32760)
          new TransMerc(WGS84, 0, (code - 32700) * 6 - 183, 0.9996, 500000.0, 10000000.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:269") && c.length == 10 => // EPSG:269xx NAD83 UTM
        val code = epsgNum(c)
        if (code >= 26901 && code <= 26923)
          new TransMerc(GRS80, 0, (code - 26900) * 6 - 183, 0.9996, 500000.0, 0.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:267") && c.length == 10 => // EPSG:267xx NAD27 UTM
        val code = epsgNum(c)
        if (code >= 26701 && code <= 26722)
          new GridDatumShifted(
            new TransMerc(Clarke1866, 0, (code - 26700) * 6 - 183, 0.9996, 500000.0, 0.0),
            Clarke1866, Nad27Helmert, "NAD27", "NAD83")
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:24") && c.length == 9 => // JGD2000 zones I-XIX
        val code = epsgNum(c)
        if (code >= 2443 && code <= 2461) {
          val (lat0, lon0) = JapanZones(code - 2443)
          new TransMerc(GRS80, lat0, lon0, 0.9999, 0.0, 0.0)
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      // CGCS2000 Gauss-Kruger (grid-free WGS84-compatible, like 4490;
      // range in the guard so the geographic 44xx/45xx literals keep
      // matching their own arms)
      case c if c.startsWith("EPSG:4") && c.length == 9 && {
          val code = epsgNum(c); code >= 4491 && code <= 4554 } =>
        val (cm, fe) = cgcsGkParams(epsgNum(c))
        new TransMerc(GRS80, 0.0, cm, 1.0, fe, 0.0)
      case c if c.startsWith("EPSG:258") && c.length == 10 => // ETRS89 / UTM 28N-38N
        val code = epsgNum(c)
        if (code >= 25828 && code <= 25838)
          new TransMerc(GRS80, 0, (code - 25800) * 6 - 183, 0.9996, 500000.0, 0.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:283") && c.length == 10 => // GDA94 / MGA 48-58
        val code = epsgNum(c)
        if (code >= 28348 && code <= 28358)
          new TransMerc(GRS80, 0, (code - 28300) * 6 - 183, 0.9996, 500000.0, 10000000.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:78") && c.length == 9 => // GDA2020 / MGA 46-59
        val code = epsgNum(c)
        if (code >= 7846 && code <= 7859)
          new TransMerc(GRS80, 0, (code - 7800) * 6 - 183, 0.9996, 500000.0, 10000000.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:319") && c.length == 10 => // SIRGAS 2000 / UTM
        val code = epsgNum(c)
        if (code >= 31965 && code <= 31976) // zones 11N-22N
          new TransMerc(GRS80, 0, (code - 31954) * 6 - 183, 0.9996, 500000.0, 0.0)
        else if (code >= 31977 && code <= 31985) // zones 17S-25S
          new TransMerc(GRS80, 0, (code - 31960) * 6 - 183, 0.9996, 500000.0, 10000000.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:66") && c.length == 9 => // JGD2011 zones I-XIX
        val code = epsgNum(c)
        if (code >= 6669 && code <= 6687) {
          val (lat0, lon0) = JapanZones(code - 6669)
          new TransMerc(GRS80, lat0, lon0, 0.9999, 0.0, 0.0)
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:314") && c.length == 10 => // DHDN Gauss-Krüger 2-5
        val code = epsgNum(c)
        if (code >= 31466 && code <= 31469) {
          val zone = code - 31464 // 31466 -> zone 2
          new DatumShifted(
            new TransMerc(Bessel1841, 0, zone * 3, 1.0, zone * 1000000.0 + 500000.0, 0.0),
            Bessel1841, DhdnHelmert)
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:284") && c.length == 10 => // Pulkovo 1942 / GK 2-32
        val code = epsgNum(c)
        if (code >= 28402 && code <= 28432) {
          val zone = code - 28400
          new GridDatumShifted(
            new TransMerc(Krassowsky1940, 0, zone * 6 - 3, 1.0,
              zone * 1000000.0 + 500000.0, 0.0),
            Krassowsky1940, PulkovoHelmert, "PULKOVO1942", "WGS84")
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:51") && c.length == 9 => // ETRS89 / NTM 5-30
        val code = epsgNum(c)
        if (code >= 5105 && code <= 5130)
          new TransMerc(GRS80, 58.0, (code - 5100) + 0.5, 1.0, 100000.0, 1000000.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:53") && c.length == 9 => // POSGAR 2007 fajas 1-7
        val code = epsgNum(c)
        if (code == 5340) Geographic // POSGAR 2007 (SIRGAS-frame)
        else if (code >= 5344 && code <= 5350) {
          val faja = code - 5343
          // Argentine Gauss-Krüger: origin at the SOUTH POLE (lat0
          // -90° — the Krüger ξ series is exact there: atanh(±1)
          // flows through atan to ±π/2), CM -72° + 3° per faja
          new TransMerc(GRS80, -90.0, -72.0 + (faja - 1) * 3.0, 1.0,
            faja * 1000000.0 + 500000.0, 0.0)
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:39") && c.length == 9 => // RGF93 / CC42-CC50
        val code = epsgNum(c)
        if (code >= 3942 && code <= 3950) {
          val lat0 = (code - 3900).toDouble // CC42 -> 42°N ... CC50 -> 50°N
          new Lcc2sp(GRS80, lat0, 3.0, lat0 - 0.75, lat0 + 0.75,
            1700000.0, 1200000.0 + (code - 3942) * 1000000.0)
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:30") && c.length == 9 => // SWEREF99 local zones
        val code = epsgNum(c)
        SwerefZones.get(code) match {
          case Some(lon0) => new TransMerc(GRS80, 0.0, lon0, 1.0, 150000.0, 0.0)
          case None => throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
        }
      case c if c.startsWith("EPSG:38") && c.length == 9 => // ETRS89 / GK19-31FIN
        val code = epsgNum(c)
        if (code >= 3873 && code <= 3885) {
          val lon0 = (code - 3873 + 19).toDouble
          new TransMerc(GRS80, 0.0, lon0, 1.0, lon0 * 1000000.0 + 500000.0, 0.0)
        } else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:230") && c.length == 10 => // ED50 / UTM 28N-38N
        val code = epsgNum(c)
        if (code >= 23028 && code <= 23038)
          new DatumShifted(
            new TransMerc(International1924, 0, (code - 23000) * 6 - 183, 0.9996, 500000.0, 0.0),
            International1924, Ed50Helmert)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case _ => throw new IllegalArgumentException(
        s"unsupported CRS: $crsIn (see st_list_proj_crs() for the supported catalog, " +
          "or pass the definition as a PROJ '+proj=' string or WKT1 text)")
    }
    cache.put(crs, sys)
    sys
  }

  /** Coordinate-pair transform with the same axis-order semantics as
   *  [[transform]] — the kernel behind the native-tier (struct) tier,
   *  no geometry object in the loop. */
  def transformXY(x: Double, y: Double, s: System, d: System,
      alwaysXy: Boolean): (Double, Double) = {
    val (ix, iy) = if (s.geographic && !alwaysXy) (y, x) else (x, y)
    val (lon, lat) = s.inverse(ix, iy)
    val (ox, oy) = d.forward(lon, lat)
    if (d.geographic && !alwaysXy) (oy, ox) else (ox, oy)
  }

  def transform(g: Geometry, src: String, dst: String, alwaysXy: Boolean): Geometry = {
    val s = resolve(src); val d = resolve(dst)
    val copy = g.copy()
    copy.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: Coordinate): Unit = {
        // authority axis order for geographic CRSs is (lat, lon) unless always_xy
        val (ix, iy) = if (s.geographic && !alwaysXy) (c.y, c.x) else (c.x, c.y)
        val (lon, lat) = s.inverse(ix, iy)
        val (ox, oy) = d.forward(lon, lat)
        if (d.geographic && !alwaysXy) { c.x = oy; c.y = ox }
        else { c.x = ox; c.y = oy }
      }
    })
    copy.geometryChanged()
    copy
  }

  /** Test seam: Lambert 2SP on an arbitrary ellipsoid (Snyder's worked
   *  example uses Clarke 1866). */
  private[graft] def lccForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double, sp1: Double, sp2: Double,
      fe: Double, fn: Double): System = new Lcc2sp(ell, lat0, lon0, sp1, sp2, fe, fn)

  // ---- ESRI WKT1 generation (for .prj sidecars / st_read_meta) --------

  private val GeogWgs84 =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""
  private val GeogNad83 =
    """GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""
  private val GeogEtrs89 =
    """GEOGCS["GCS_ETRS_1989",DATUM["D_ETRS_1989",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  private def geogcsOf(gcs: String, datum: String,
      spheroid: String = "GRS_1980", a: Double = 6378137.0, invF: Double = 298.257222101) =
    s"""GEOGCS["$gcs",DATUM["$datum",SPHEROID["$spheroid",$a,$invF]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  private val GeogRgf93 = geogcsOf("GCS_RGF_1993", "D_RGF_1993")
  private val GeogGda94 = geogcsOf("GCS_GDA_1994", "D_GDA_1994")
  private val GeogGda2020 = geogcsOf("GCS_GDA2020", "D_GDA2020")
  private val GeogNzgd2000 = geogcsOf("GCS_NZGD_2000", "D_NZGD_2000")
  private val GeogSweref99 = geogcsOf("GCS_SWEREF99", "D_SWEREF99")
  private val GeogJgd2011 = geogcsOf("GCS_JGD_2011", "D_JGD_2011")
  private val GeogJgd2000 = geogcsOf("GCS_JGD_2000", "D_JGD_2000")
  private val GeogNad27 = geogcsOf("GCS_North_American_1927", "D_North_American_1927",
    "Clarke_1866", 6378206.4, 294.978698213898)
  private val GeogSirgas2000 = geogcsOf("GCS_SIRGAS_2000", "D_SIRGAS_2000")
  private val GeogCgcs2000 = geogcsOf("GCS_China_Geodetic_Coordinate_System_2000", "D_China_2000")
  private val GeogKorea2000 = geogcsOf("GCS_Korea_2000", "D_Korea_2000")
  private val GeogIrenet95 = geogcsOf("GCS_IRENET95", "D_IRENET95")
  private val GeogOsgb36 =
    geogcsOf("GCS_OSGB_1936", "D_OSGB_1936", "Airy_1830", 6377563.396, 299.3249646)
  private val GeogTm65 =
    geogcsOf("GCS_TM65", "D_TM65", "Airy_Modified", 6377340.189, 299.3249646)
  private val GeogTm75 =
    geogcsOf("GCS_TM75", "D_TM75", "Airy_Modified", 6377340.189, 299.3249646)
  private val GeogDhdn = geogcsOf("GCS_Deutsches_Hauptdreiecksnetz",
    "D_Deutsches_Hauptdreiecksnetz", "Bessel_1841", 6377397.155, 299.1528128)
  private val GeogEd50 = geogcsOf("GCS_European_1950", "D_European_1950",
    "International_1924", 6378388.0, 297.0)
  private val GeogCh1903Plus = geogcsOf("GCS_CH1903+", "D_CH1903+",
    "Bessel_1841", 6377397.155, 299.1528128)
  private val GeogCh1903 = geogcsOf("GCS_CH1903", "D_CH1903",
    "Bessel_1841", 6377397.155, 299.1528128)
  private val GeogNtf = geogcsOf("GCS_NTF", "D_NTF",
    "Clarke_1880_IGN", 6378249.2, 293.466021293627)
  /** NTF with the Paris prime meridian (ESRI states PRIMEM in degrees
   *  even for grad-based systems). */
  private val GeogNtfParis =
    s"""GEOGCS["GCS_NTF_Paris",DATUM["D_NTF",SPHEROID["Clarke_1880_IGN",6378249.2,293.466021293627]],PRIMEM["Paris",$ParisLon],UNIT["Degree",0.0174532925199433]]"""
  private val GeogBelge72 = geogcsOf("GCS_Belge_1972", "D_Belge_1972",
    "International_1924", 6378388.0, 297.0)
  private val GeogMgi = geogcsOf("GCS_MGI", "D_MGI",
    "Bessel_1841", 6377397.155, 299.1528128)
  private val GeogPulkovo42 = geogcsOf("GCS_Pulkovo_1942", "D_Pulkovo_1942",
    "Krasovsky_1940", 6378245.0, 298.3)
  private val GeogMonteMario = geogcsOf("GCS_Monte_Mario", "D_Monte_Mario",
    "International_1924", 6378388.0, 297.0)
  private val GeogPosgar2007 = geogcsOf("GCS_POSGAR_2007", "D_POSGAR_2007")
  private val GeogMexItrf08 = geogcsOf("GCS_Mexico_ITRF2008", "D_Mexico_ITRF2008")
  private val GeogIsrael = geogcsOf("GCS_Israel", "D_Israel")
  private val GeogGgrs87 = geogcsOf("GCS_GGRS_1987", "D_GGRS_1987")
  private val GeogEst97 = geogcsOf("GCS_Estonia_1997", "D_Estonia_1997")
  private val GeogHk1980 = geogcsOf("GCS_Hong_Kong_1980", "D_Hong_Kong_1980",
    "International_1924", 6378388.0, 297.0)
  private val GeogKkj = geogcsOf("GCS_KKJ", "D_KKJ",
    "International_1924", 6378388.0, 297.0)
  private val GeogSJtsk = geogcsOf("GCS_S_JTSK", "D_S_JTSK",
    "Bessel_1841", 6377397.155, 299.1528128)

  private def projcs(name: String, geogcs: String, method: String,
      params: Seq[(String, Double)], unitName: String, mpu: Double): String = {
    val ps = params.map { case (k, v) => s"""PARAMETER["$k",$v]""" }.mkString(",")
    s"""PROJCS["$name",$geogcs,PROJECTION["$method"],$ps,UNIT["$unitName",$mpu]]"""
  }

  private def lccWkt(name: String, geogcs: String, lat0: Double, lon0: Double,
      sp1: Double, sp2: Double, feU: Double, fnU: Double, unit: String, mpu: Double) =
    projcs(name, geogcs, "Lambert_Conformal_Conic",
      Seq("False_Easting" -> feU, "False_Northing" -> fnU, "Central_Meridian" -> lon0,
        "Standard_Parallel_1" -> sp1, "Standard_Parallel_2" -> sp2,
        "Latitude_Of_Origin" -> lat0), unit, mpu)

  private def tmWkt(name: String, geogcs: String, lat0: Double, lon0: Double,
      k0: Double, feU: Double, fnU: Double, unit: String, mpu: Double) =
    projcs(name, geogcs, "Transverse_Mercator",
      Seq("False_Easting" -> feU, "False_Northing" -> fnU, "Central_Meridian" -> lon0,
        "Scale_Factor" -> k0, "Latitude_Of_Origin" -> lat0), unit, mpu)

  /** WKT for the round-10 sweep codes, generated from the SAME
   *  [[spZones]] table the registry builds from (one source of truth:
   *  a parameter typo shows up identically in transform and WKT, and
   *  the corner-coordinate oracle catches it). */
  private lazy val sweepWktByCode: Map[String, String] = {
    def fipsName(z: SpZone) = {
      val st = z.state.replace(" ", "_")
      val zn = if (z.zone.isEmpty) "" else "_" + z.zone.replace(" ", "_")
      s"NAD_1983_StatePlane_$st${zn}_FIPS_${z.fips}_Feet"
    }
    val sp = spZones.map { z =>
      val w =
        if (z.kind == 'T')
          tmWkt(fipsName(z), GeogNad83, z.lat0, z.lon0, z.p1,
            z.feM / FtUs, z.fnM / FtUs, "Foot_US", FtUs)
        else
          lccWkt(fipsName(z), GeogNad83, z.lat0, z.lon0, z.p1, z.p2,
            z.feM / FtUs, z.fnM / FtUs, "Foot_US", FtUs)
      s"EPSG:${z.code}" -> w
    }
    val albersCanadaish = Seq(
      "EPSG:3978" -> lccWkt("NAD_1983_Canada_Atlas_Lambert", GeogNad83,
        49.0, -95.0, 49.0, 77.0, 0.0, 0.0, "Meter", 1.0),
      "EPSG:3979" -> lccWkt("NAD_1983_CSRS_Canada_Atlas_Lambert", GeogNad83,
        49.0, -95.0, 49.0, 77.0, 0.0, 0.0, "Meter", 1.0),
      "EPSG:3338" -> projcs("NAD_1983_Alaska_Albers", GeogNad83, "Albers",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0,
          "Central_Meridian" -> -154.0, "Standard_Parallel_1" -> 55.0,
          "Standard_Parallel_2" -> 65.0, "Latitude_Of_Origin" -> 50.0), "Meter", 1.0),
      "EPSG:32661" -> projcs("WGS_1984_UPS_North_N_E", GeogWgs84,
        "Polar_Stereographic_Variant_A",
        Seq("False_Easting" -> 2000000.0, "False_Northing" -> 2000000.0,
          "Central_Meridian" -> 0.0, "Scale_Factor" -> 0.994,
          "Latitude_Of_Origin" -> 90.0), "Meter", 1.0),
      "EPSG:32761" -> projcs("WGS_1984_UPS_South_N_E", GeogWgs84,
        "Polar_Stereographic_Variant_A",
        Seq("False_Easting" -> 2000000.0, "False_Northing" -> 2000000.0,
          "Central_Meridian" -> 0.0, "Scale_Factor" -> 0.994,
          "Latitude_Of_Origin" -> -90.0), "Meter", 1.0),
      "EPSG:4087" -> projcs("WGS_1984_World_Equidistant_Cylindrical", GeogWgs84,
        "Equidistant_Cylindrical",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0,
          "Central_Meridian" -> 0.0, "Standard_Parallel_1" -> 0.0), "Meter", 1.0))
    (sp ++ albersCanadaish).toMap
  }

  /** ESRI WKT1 for a supported CRS (what a .prj sidecar contains).
   *  Parameters restate the same published EPSG definitions the
   *  `registry` builders use; false origins appear in the map unit. */
  def esriWkt(crsIn: String): Option[String] = {
    val crs = crsIn.trim.toUpperCase
    def ftUs(m: Double) = m / FtUs
    if (sweepWktByCode.contains(crs)) return Some(sweepWktByCode(crs))
    val wkt = crs match {
      case "EPSG:4326" | "WGS84" | "CRS84" | "OGC:CRS84" => Some(GeogWgs84)
      case "EPSG:4269" => Some(GeogNad83)
      case "EPSG:3857" | "EPSG:900913" => Some(projcs(
        "WGS_1984_Web_Mercator_Auxiliary_Sphere", GeogWgs84, "Mercator_Auxiliary_Sphere",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> 0.0,
          "Standard_Parallel_1" -> 0.0, "Auxiliary_Sphere_Type" -> 0.0), "Meter", 1.0))
      case "EPSG:2260" => Some(tmWkt("NAD_1983_StatePlane_New_York_East_FIPS_3101_Feet",
        GeogNad83, 38.8333333333333, -74.5, 0.9999, ftUs(150000.0), 0.0, "Foot_US", FtUs))
      case "EPSG:2261" => Some(tmWkt("NAD_1983_StatePlane_New_York_Central_FIPS_3102_Feet",
        GeogNad83, 40.0, -76.5833333333333, 0.9999, ftUs(250000.0), 0.0, "Foot_US", FtUs))
      case "EPSG:2262" => Some(tmWkt("NAD_1983_StatePlane_New_York_West_FIPS_3103_Feet",
        GeogNad83, 40.0, -78.5833333333333, 0.9999, ftUs(350000.0), 0.0, "Foot_US", FtUs))
      case "EPSG:2263" => Some(lccWkt("NAD_1983_StatePlane_New_York_Long_Island_FIPS_3104_Feet",
        GeogNad83, 40.1666666666667, -74.0, 40.6666666666667, 41.0333333333333,
        ftUs(300000.0), 0.0, "Foot_US", FtUs))
      case "EPSG:32118" => Some(lccWkt("NAD_1983_StatePlane_New_York_Long_Island_FIPS_3104",
        GeogNad83, 40.1666666666667, -74.0, 40.6666666666667, 41.0333333333333,
        300000.0, 0.0, "Meter", 1.0))
      case "EPSG:2229" => Some(lccWkt("NAD_1983_StatePlane_California_V_FIPS_0405_Feet",
        GeogNad83, 33.5, -118.0, 34.0333333333333, 35.4666666666667,
        ftUs(2000000.0), ftUs(500000.0), "Foot_US", FtUs))
      case "EPSG:3435" => Some(tmWkt("NAD_1983_StatePlane_Illinois_East_FIPS_1201_Feet",
        GeogNad83, 36.6666666666667, -88.3333333333333, 0.999975, ftUs(300000.0), 0.0,
        "Foot_US", FtUs))
      case "EPSG:2272" => Some(lccWkt("NAD_1983_StatePlane_Pennsylvania_South_FIPS_3702_Feet",
        GeogNad83, 39.3333333333333, -77.75, 39.9333333333333, 40.9666666666667,
        ftUs(600000.0), 0.0, "Foot_US", FtUs))
      case "EPSG:2277" => Some(lccWkt("NAD_1983_StatePlane_Texas_Central_FIPS_4203_Feet",
        GeogNad83, 29.6666666666667, -100.333333333333, 30.1166666666667, 31.8833333333333,
        ftUs(700000.0), ftUs(3000000.0), "Foot_US", FtUs))
      case "EPSG:5070" | "EPSG:6350" => Some(projcs(
        if (crs == "EPSG:5070") "NAD_1983_Contiguous_USA_Albers"
        else "NAD_1983_2011_Contiguous_USA_Albers",
        GeogNad83, "Albers",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> -96.0,
          "Standard_Parallel_1" -> 29.5, "Standard_Parallel_2" -> 45.5,
          "Latitude_Of_Origin" -> 23.0), "Meter", 1.0))
      case "ESRI:102003" => Some(projcs("USA_Contiguous_Albers_Equal_Area_Conic",
        GeogNad83, "Albers",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> -96.0,
          "Standard_Parallel_1" -> 29.5, "Standard_Parallel_2" -> 45.5,
          "Latitude_Of_Origin" -> 37.5), "Meter", 1.0))
      case "EPSG:3035" => Some(projcs("ETRS_1989_LAEA", GeogEtrs89,
        "Lambert_Azimuthal_Equal_Area",
        Seq("False_Easting" -> 4321000.0, "False_Northing" -> 3210000.0,
          "Central_Meridian" -> 10.0, "Latitude_Of_Origin" -> 52.0), "Meter", 1.0))
      case c if c.startsWith("EPSG:32") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 32601 && code <= 32660)
          Some(tmWkt(s"WGS_1984_UTM_Zone_${code - 32600}N", GeogWgs84,
            0.0, (code - 32600) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else if (code >= 32701 && code <= 32760)
          Some(tmWkt(s"WGS_1984_UTM_Zone_${code - 32700}S", GeogWgs84,
            0.0, (code - 32700) * 6 - 183, 0.9996, 500000.0, 10000000.0, "Meter", 1.0))
        else if (code >= 32181 && code <= 32197) {
          // Canadian MTM — this broad UTM arm matches the 321xx codes
          // first, so the MTM WKT lives here (listAll sweep enforces it)
          val zone = code - 32180
          val lon0 = zone match {
            case 1 => -53.0; case 2 => -56.0
            case z if z <= 11 => -49.5 - 3.0 * z
            case z => -81.0 - 3.0 * (z - 12)
          }
          Some(tmWkt(s"NAD_1983_MTM_$zone", GeogNad83,
            0.0, lon0, 0.9999, 304800.0, 0.0, "Meter", 1.0))
        } else None
      case c if c.startsWith("EPSG:269") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 26901 && code <= 26923)
          Some(tmWkt(s"NAD_1983_UTM_Zone_${code - 26900}N", GeogNad83,
            0.0, (code - 26900) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else None
      // ---- round-4 catalog additions ---------------------------------
      case "EPSG:4258" => Some(GeogEtrs89)
      case "EPSG:4171" => Some(GeogRgf93)
      case "EPSG:4283" => Some(GeogGda94)
      case "EPSG:7844" => Some(GeogGda2020)
      case "EPSG:4167" => Some(GeogNzgd2000)
      case "EPSG:4619" => Some(GeogSweref99)
      case "EPSG:6668" => Some(GeogJgd2011)
      case "EPSG:4674" => Some(GeogSirgas2000)
      case "EPSG:4490" => Some(GeogCgcs2000)
      case "EPSG:3395" => Some(projcs("WGS_1984_World_Mercator", GeogWgs84, "Mercator",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> 0.0,
          "Standard_Parallel_1" -> 0.0), "Meter", 1.0))
      case "EPSG:2154" => Some(lccWkt("RGF_1993_Lambert_93", GeogRgf93,
        46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0, "Meter", 1.0))
      case "EPSG:3034" => Some(lccWkt("ETRS_1989_LCC_Europe", GeogEtrs89,
        52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0, "Meter", 1.0))
      case "EPSG:5243" => Some(lccWkt("ETRS_1989_LCC_Germany_N_E", GeogEtrs89,
        51.0, 10.5, 48.6666666666667, 53.6666666666667, 0.0, 0.0, "Meter", 1.0))
      case "EPSG:3006" => Some(tmWkt("SWEREF99_TM", GeogSweref99,
        0.0, 15.0, 0.9996, 500000.0, 0.0, "Meter", 1.0))
      case "EPSG:3067" => Some(tmWkt("ETRS_1989_TM35FIN", GeogEtrs89,
        0.0, 27.0, 0.9996, 500000.0, 0.0, "Meter", 1.0))
      case "EPSG:2180" => Some(tmWkt("ETRS_1989_Poland_CS92", GeogEtrs89,
        0.0, 19.0, 0.9993, 500000.0, -5300000.0, "Meter", 1.0))
      case "EPSG:2193" => Some(tmWkt("NZGD_2000_New_Zealand_Transverse_Mercator", GeogNzgd2000,
        0.0, 173.0, 0.9996, 1600000.0, 10000000.0, "Meter", 1.0))
      case "EPSG:5179" => Some(tmWkt("Korea_2000_Korea_Unified_Coordinate_System", GeogKorea2000,
        38.0, 127.5, 0.9996, 1000000.0, 2000000.0, "Meter", 1.0))
      case "EPSG:3414" => Some(tmWkt("SVY21_Singapore_TM", GeogWgs84,
        1.36666666666667, 103.833333333333, 1.0, 28001.642, 38744.572, "Meter", 1.0))
      case "EPSG:2157" => Some(tmWkt("IRENET95_Irish_Transverse_Mercator", GeogIrenet95,
        53.5, -8.0, 0.99982, 600000.0, 750000.0, "Meter", 1.0))
      case "EPSG:29902" => Some(tmWkt("TM65_Irish_Grid", GeogTm65,
        53.5, -8.0, 1.000035, 200000.0, 250000.0, "Meter", 1.0))
      case "EPSG:29903" => Some(tmWkt("TM75_Irish_Grid", GeogTm75,
        53.5, -8.0, 1.000035, 200000.0, 250000.0, "Meter", 1.0))
      case "EPSG:27700" => Some(tmWkt("British_National_Grid", GeogOsgb36,
        49.0, -2.0, 0.9996012717, 400000.0, -100000.0, "Meter", 1.0))
      case "EPSG:3577" => Some(projcs("GDA_1994_Australia_Albers", GeogGda94, "Albers",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> 132.0,
          "Standard_Parallel_1" -> -18.0, "Standard_Parallel_2" -> -36.0,
          "Latitude_Of_Origin" -> 0.0), "Meter", 1.0))
      case "EPSG:3112" => Some(lccWkt("GDA_1994_Geoscience_Australia_Lambert", GeogGda94,
        0.0, 134.0, -18.0, -36.0, 0.0, 0.0, "Meter", 1.0))
      case "EPSG:3005" => Some(projcs("NAD_1983_BC_Environment_Albers", GeogNad83, "Albers",
        Seq("False_Easting" -> 1000000.0, "False_Northing" -> 0.0, "Central_Meridian" -> -126.0,
          "Standard_Parallel_1" -> 50.0, "Standard_Parallel_2" -> 58.5,
          "Latitude_Of_Origin" -> 45.0), "Meter", 1.0))
      case "ESRI:102008" => Some(projcs("North_America_Albers_Equal_Area_Conic", GeogNad83,
        "Albers",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> -96.0,
          "Standard_Parallel_1" -> 20.0, "Standard_Parallel_2" -> 60.0,
          "Latitude_Of_Origin" -> 40.0), "Meter", 1.0))
      case "EPSG:28992" => Some(projcs("RD_New",
        geogcsOf("GCS_Amersfoort", "D_Amersfoort", "Bessel_1841", 6377397.155, 299.1528128),
        "Double_Stereographic",
        Seq("False_Easting" -> 155000.0, "False_Northing" -> 463000.0,
          "Central_Meridian" -> 5.38763888888889, "Scale_Factor" -> 0.9999079,
          "Latitude_Of_Origin" -> 52.1561605555556), "Meter", 1.0))
      case "EPSG:3031" => Some(projcs("WGS_1984_Antarctic_Polar_Stereographic", GeogWgs84,
        "Stereographic_South_Pole",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> 0.0,
          "Standard_Parallel_1" -> -71.0), "Meter", 1.0))
      case "EPSG:3413" => Some(projcs("WGS_1984_NSIDC_Sea_Ice_Polar_Stereographic_North",
        GeogWgs84, "Stereographic_North_Pole",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> -45.0,
          "Standard_Parallel_1" -> 70.0), "Meter", 1.0))
      case "EPSG:3995" => Some(projcs("WGS_1984_Arctic_Polar_Stereographic", GeogWgs84,
        "Stereographic_North_Pole",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0, "Central_Meridian" -> 0.0,
          "Standard_Parallel_1" -> 71.0), "Meter", 1.0))
      case c if c.startsWith("EPSG:258") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 25828 && code <= 25838)
          Some(tmWkt(s"ETRS_1989_UTM_Zone_${code - 25800}N", GeogEtrs89,
            0.0, (code - 25800) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else None
      case c if c.startsWith("EPSG:283") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 28348 && code <= 28358)
          Some(tmWkt(s"GDA_1994_MGA_Zone_${code - 28300}", GeogGda94,
            0.0, (code - 28300) * 6 - 183, 0.9996, 500000.0, 10000000.0, "Meter", 1.0))
        else None
      case c if c.startsWith("EPSG:78") && c.length == 9 =>
        val code = epsgNum(c)
        if (code >= 7846 && code <= 7859)
          Some(tmWkt(s"GDA2020_MGA_Zone_${code - 7800}", GeogGda2020,
            0.0, (code - 7800) * 6 - 183, 0.9996, 500000.0, 10000000.0, "Meter", 1.0))
        else None
      case c if c.startsWith("EPSG:319") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 31965 && code <= 31976)
          Some(tmWkt(s"SIRGAS_2000_UTM_Zone_${code - 31954}N", GeogSirgas2000,
            0.0, (code - 31954) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else if (code >= 31977 && code <= 31985)
          Some(tmWkt(s"SIRGAS_2000_UTM_Zone_${code - 31960}S", GeogSirgas2000,
            0.0, (code - 31960) * 6 - 183, 0.9996, 500000.0, 10000000.0, "Meter", 1.0))
        else None
      case c if c.startsWith("EPSG:66") && c.length == 9 =>
        val code = epsgNum(c)
        if (code >= 6669 && code <= 6687) {
          val (lat0, lon0) = JapanZones(code - 6669)
          Some(tmWkt(s"JGD_2011_Japan_Zone_${code - 6668}", GeogJgd2011,
            lat0, lon0, 0.9999, 0.0, 0.0, "Meter", 1.0))
        } else None
      case "EPSG:4267" => Some(GeogNad27)
      case c if c.startsWith("EPSG:267") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 26701 && code <= 26722)
          Some(tmWkt(s"NAD_1927_UTM_Zone_${code - 26700}N", GeogNad27,
            0.0, (code - 26700) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else None
      case c if c.startsWith("EPSG:24") && c.length == 9 =>
        val code = epsgNum(c)
        if (code >= 2443 && code <= 2461) {
          val (lat0, lon0) = JapanZones(code - 2443)
          Some(tmWkt(s"JGD_2000_Japan_Zone_${code - 2442}", GeogJgd2000,
            lat0, lon0, 0.9999, 0.0, 0.0, "Meter", 1.0))
        } else None
      // CGCS2000 Gauss-Kruger sweep (ESRI zone/CM naming)
      case c if c.startsWith("EPSG:4") && c.length == 9 && {
          val code = epsgNum(c); code >= 4491 && code <= 4554 } =>
        val code = epsgNum(c)
        val (cm, fe) = cgcsGkParams(code)
        val name =
          if (code <= 4501) s"CGCS2000_GK_Zone_${code - 4478}"
          else if (code <= 4512) s"CGCS2000_GK_CM_${cm.toInt}E"
          else if (code <= 4533) s"CGCS2000_3_Degree_GK_Zone_${code - 4488}"
          else s"CGCS2000_3_Degree_GK_CM_${cm.toInt}E"
        Some(tmWkt(name, GeogCgcs2000, 0.0, cm, 1.0, fe, 0.0, "Meter", 1.0))
      case c if c.startsWith("EPSG:314") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 31466 && code <= 31469) {
          val zone = code - 31464
          Some(tmWkt(s"DHDN_3_Degree_Gauss_Zone_$zone", GeogDhdn,
            0.0, zone * 3, 1.0, zone * 1000000.0 + 500000.0, 0.0, "Meter", 1.0))
        } else None
      case c if c.startsWith("EPSG:230") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 23028 && code <= 23038)
          Some(tmWkt(s"ED_1950_UTM_Zone_${code - 23000}N", GeogEd50,
            0.0, (code - 23000) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else None
      // Swiss Oblique Mercator (ESRI models it as Hotine azimuth-center
      // with Azimuth=90 at the Bern origin; same Bessel 1841 ellipsoid
      // as the registry builders at lines 746-757)
      case "EPSG:2056" => Some(projcs("CH1903+_LV95", GeogCh1903Plus,
        "Hotine_Oblique_Mercator_Azimuth_Center",
        Seq("False_Easting" -> 2600000.0, "False_Northing" -> 1200000.0,
          "Scale_Factor" -> 1.0, "Azimuth" -> 90.0,
          "Longitude_Of_Center" -> 7.43958333333333,
          "Latitude_Of_Center" -> 46.9524055555556), "Meter", 1.0))
      case "EPSG:21781" => Some(projcs("CH1903_LV03", GeogCh1903,
        "Hotine_Oblique_Mercator_Azimuth_Center",
        Seq("False_Easting" -> 600000.0, "False_Northing" -> 200000.0,
          "Scale_Factor" -> 1.0, "Azimuth" -> 90.0,
          "Longitude_Of_Center" -> 7.43958333333333,
          "Latitude_Of_Center" -> 46.9524055555556), "Meter", 1.0))
      // round-13 sweep (ESRI dialect: projection only, no TOWGS84)
      case "EPSG:2039" => Some(tmWkt("Israel_TM_Grid", GeogIsrael,
        31.73439361111111, 35.20451694444445, 1.0000067, 219529.584, 626907.39,
        "Meter", 1.0))
      case "EPSG:2100" => Some(tmWkt("GGRS_1987_Greek_Grid", GeogGgrs87,
        0.0, 24.0, 0.9996, 500000.0, 0.0, "Meter", 1.0))
      case "EPSG:3301" => Some(lccWkt("Estonian_Coordinate_System_of_1997", GeogEst97,
        57.51755393055556, 24.0, 59.33333333333334, 58.0, 500000.0, 6375000.0,
        "Meter", 1.0))
      case "EPSG:2326" => Some(tmWkt("Hong_Kong_1980_Grid", GeogHk1980,
        22.31213333333333, 114.1785555555556, 1.0, 836694.05, 819069.8,
        "Meter", 1.0))
      case "EPSG:2393" => Some(tmWkt("Finland_Zone_3", GeogKkj,
        0.0, 27.0, 1.0, 3500000.0, 0.0, "Meter", 1.0))
      case "EPSG:5514" => Some(projcs("S-JTSK_Krovak_East_North", GeogSJtsk, "Krovak",
        Seq("False_Easting" -> 0.0, "False_Northing" -> 0.0,
          "Pseudo_Standard_Parallel_1" -> 78.5, "Scale_Factor" -> 0.9999,
          "Azimuth" -> 30.28813972222222,
          "Longitude_Of_Center" -> 24.833333333333332,
          "Latitude_Of_Center" -> 49.5, "X_Scale" -> -1.0, "Y_Scale" -> 1.0,
          "XY_Plane_Rotation" -> 90.0), "Meter", 1.0))
      // r11 legacy-European families (ESRI dialect like the rest of
      // this catalog: no TOWGS84 — WKT1 carries the projection, the
      // datum bridge lives in the transform registry)
      case "EPSG:4275" => Some(GeogNtf)
      case "EPSG:4313" => Some(GeogBelge72)
      case "EPSG:4312" => Some(GeogMgi)
      case "EPSG:4284" => Some(GeogPulkovo42)
      case "EPSG:31370" => Some(lccWkt("Belge_1972_Belgian_Lambert_72", GeogBelge72,
        90.0, 4.0 + 22.0 / 60 + 2.952 / 3600,
        51.0 + 10.0 / 60 + 0.00204 / 3600, 49.0 + 50.0 / 60 + 0.00204 / 3600,
        150000.013, 5400088.438, "Meter", 1.0))
      case "EPSG:3812" => Some(lccWkt("ETRS_1989_Belgian_Lambert_2008", GeogEtrs89,
        50.0 + 47.0 / 60 + 52.134 / 3600, 4.0 + 21.0 / 60 + 33.177 / 3600,
        49.0 + 50.0 / 60, 51.0 + 10.0 / 60, 649328.0, 665262.0, "Meter", 1.0))
      case "EPSG:31287" => Some(lccWkt("MGI_Austria_Lambert", GeogMgi,
        47.5, 13.0 + 20.0 / 60, 49.0, 46.0, 400000.0, 400000.0, "Meter", 1.0))
      case c if c.startsWith("EPSG:275") && c.length == 10 =>
        val code = epsgNum(c)
        val zoneIdx = if (code >= 27561 && code <= 27564) code - 27561
          else if (code >= 27571 && code <= 27574) code - 27571 else -1
        if (zoneIdx < 0) None
        else {
          val names = Array("I", "II", "III", "IV")
          val lat0s = Array(49.5, 46.8, 44.1, 42.165)
          val k0s = Array(0.999877341, 0.99987742, 0.999877499, 0.99994471)
          val fes = Array(600000.0, 600000.0, 600000.0, 234.358)
          val fnBase = Array(200000.0, 200000.0, 200000.0, 185861.369)
          val fn = if (code >= 27571) fnBase(zoneIdx) + (zoneIdx + 1) * 1000000.0
            else fnBase(zoneIdx)
          Some(projcs(s"NTF_Paris_Lambert_Zone_${names(zoneIdx)}", GeogNtfParis,
            "Lambert_Conformal_Conic",
            Seq("False_Easting" -> fes(zoneIdx), "False_Northing" -> fn,
              "Central_Meridian" -> 0.0,
              "Standard_Parallel_1" -> lat0s(zoneIdx),
              "Scale_Factor" -> k0s(zoneIdx),
              "Latitude_Of_Origin" -> lat0s(zoneIdx)), "Meter", 1.0))
        }
      case c if c.startsWith("EPSG:312") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 31254 && code <= 31256)
          Some(tmWkt(s"MGI_Austria_GK_${Seq("West", "Central", "East")(code - 31254)}",
            GeogMgi, 0.0, (10.0 + 20.0 / 60) + (code - 31254) * 3.0, 1.0,
            0.0, -5000000.0, "Meter", 1.0))
        else if (code >= 31257 && code <= 31259)
          Some(tmWkt(s"MGI_Austria_GK_M${28 + (code - 31257) * 3}",
            GeogMgi, 0.0, (10.0 + 20.0 / 60) + (code - 31257) * 3.0, 1.0,
            150000.0 + (code - 31257) * 300000.0, -5000000.0, "Meter", 1.0))
        else None
      case c if c.startsWith("EPSG:284") && c.length == 10 =>
        val code = epsgNum(c)
        if (code >= 28402 && code <= 28432) {
          val zone = code - 28400
          Some(tmWkt(s"Pulkovo_1942_GK_Zone_$zone", GeogPulkovo42,
            0.0, zone * 6 - 3, 1.0, zone * 1000000.0 + 500000.0, 0.0, "Meter", 1.0))
        } else None
      // range inside the guard: a bare EPSG:51xx prefix would swallow
      // the Korea 2000 belt literals below
      case c if c.startsWith("EPSG:51") && c.length == 9 && {
          val code = epsgNum(c); code >= 5105 && code <= 5130 } =>
        val code = epsgNum(c)
        Some(tmWkt(s"ETRS_1989_NTM_Zone_${code - 5100}", GeogEtrs89,
          58.0, (code - 5100) + 0.5, 1.0, 100000.0, 1000000.0, "Meter", 1.0))
      case c if c.startsWith("EPSG:39") && c.length == 9 =>
        val code = epsgNum(c)
        if (code >= 3942 && code <= 3950) {
          val lat0 = (code - 3900).toDouble
          Some(lccWkt(s"RGF_1993_CC${code - 3900}", GeogRgf93,
            lat0, 3.0, lat0 - 0.75, lat0 + 0.75,
            1700000.0, 1200000.0 + (code - 3942) * 1000000.0, "Meter", 1.0))
        } else None
      // guard on table membership: a bare EPSG:30xx prefix would
      // swallow the Monte Mario literals below (match arms do not
      // fall through when the body returns None)
      case c if c.startsWith("EPSG:30") && c.length == 9 &&
          SwerefZones.contains(epsgNum(c)) =>
        val lon0 = SwerefZones(epsgNum(c))
        Some(tmWkt(swerefName(lon0).replace(' ', '_'), GeogSweref99,
          0.0, lon0, 1.0, 150000.0, 0.0, "Meter", 1.0))
      case c if c.startsWith("EPSG:38") && c.length == 9 =>
        val code = epsgNum(c)
        if (code >= 3873 && code <= 3885) {
          val lon0 = (code - 3873 + 19).toDouble
          Some(tmWkt(s"ETRS_1989_GK${code - 3873 + 19}FIN", GeogEtrs89,
            0.0, lon0, 1.0, lon0 * 1000000.0 + 500000.0, 0.0, "Meter", 1.0))
        } else None
      case "EPSG:3763" => Some(tmWkt("ETRS_1989_Portugal_TM06", GeogEtrs89,
        39.0 + 40.0 / 60 + 5.73 / 3600, -(8.0 + 7.0 / 60 + 59.19 / 3600),
        1.0, 0.0, 0.0, "Meter", 1.0))
      case "EPSG:4265" => Some(GeogMonteMario)
      case "EPSG:3003" => Some(tmWkt("Monte_Mario_Italy_1", GeogMonteMario,
        0.0, 9.0, 0.9996, 1500000.0, 0.0, "Meter", 1.0))
      case "EPSG:3004" => Some(tmWkt("Monte_Mario_Italy_2", GeogMonteMario,
        0.0, 15.0, 0.9996, 2520000.0, 0.0, "Meter", 1.0))
      case "EPSG:5185" => Some(tmWkt("Korea_2000_West_Belt_2010", GeogKorea2000,
        38.0, 125.0, 1.0, 200000.0, 600000.0, "Meter", 1.0))
      case "EPSG:5186" => Some(tmWkt("Korea_2000_Central_Belt_2010", GeogKorea2000,
        38.0, 127.0, 1.0, 200000.0, 600000.0, "Meter", 1.0))
      case "EPSG:5187" => Some(tmWkt("Korea_2000_East_Belt_2010", GeogKorea2000,
        38.0, 129.0, 1.0, 200000.0, 600000.0, "Meter", 1.0))
      case "EPSG:5188" => Some(tmWkt("Korea_2000_East_Sea_Belt_2010", GeogKorea2000,
        38.0, 131.0, 1.0, 200000.0, 600000.0, "Meter", 1.0))
      case "EPSG:5340" => Some(GeogPosgar2007)
      case "EPSG:4647" => Some(tmWkt("ETRS_1989_UTM_Zone_32N_zE-N", GeogEtrs89,
        0.0, 9.0, 0.9996, 32500000.0, 0.0, "Meter", 1.0))
      case "EPSG:5650" => Some(tmWkt("ETRS_1989_UTM_Zone_33N_zE-N", GeogEtrs89,
        0.0, 15.0, 0.9996, 33500000.0, 0.0, "Meter", 1.0))
      case "EPSG:6372" => Some(lccWkt("Mexico_ITRF2008_LCC", GeogMexItrf08,
        12.0, -102.0, 17.5, 29.5, 2500000.0, 0.0, "Meter", 1.0))
      case c if c.startsWith("EPSG:53") && c.length == 9 =>
        val code = epsgNum(c)
        if (code >= 5344 && code <= 5350) {
          val faja = code - 5343
          Some(tmWkt(s"POSGAR_2007_Argentina_$faja", GeogPosgar2007,
            -90.0, -72.0 + (faja - 1) * 3.0, 1.0,
            faja * 1000000.0 + 500000.0, 0.0, "Meter", 1.0))
        } else None
      case _ => None
    }
    wkt
  }

  /** Krüger-series constants for the SQL-oracle builder (SparkEntry
   *  inlines them as numeric literals so the oracle engine can evaluate
   *  the same forward Transverse Mercator in plain SQL): rectifying
   *  radius AA and the forward series alpha[1..6]. Same published
   *  formulas as [[TransMerc]]. */
  private[graft] def tmSeries(ell: Ellipsoid): (Double, Array[Double]) = {
    val n = ell.f / (2 - ell.f)
    val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    val AA = ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    val alpha = Array(
      0.0,
      n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
      13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
      61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
      49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
      34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
      212378941.0 / 319334400 * n6)
    (AA, alpha)
  }

  /** Meridian-arc northing of the natural origin for the SQL-oracle
   *  builder (same ξ series as [[TransMerc.xiOf]]). */
  private[graft] def tmM0(ell: Ellipsoid, lat0Deg: Double, k0: Double): Double = {
    if (lat0Deg == 0.0) return 0.0
    val (aa, alpha) = tmSeries(ell)
    val lat = math.toRadians(lat0Deg)
    val t = math.sinh(atanh(math.sin(lat)) - ell.e * atanh(ell.e * math.sin(lat)))
    val xiP = math.atan(t)
    var xi = xiP
    var j = 1
    while (j <= 6) { xi += alpha(j) * math.sin(2 * j * xiP); j += 1 }
    k0 * aa * xi
  }

  /** Test seams for the equal-area projections (Snyder's worked
   *  examples use Clarke 1866). */
  private[graft] def tmForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double, k0: Double,
      fe: Double, fn: Double): System = new TransMerc(ell, lat0, lon0, k0, fe, fn)
  private[graft] def obliqueStereoForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double, k0: Double,
      fe: Double, fn: Double): System = new ObliqueStereo(ell, lat0, lon0, k0, fe, fn)
  private[graft] def polarForTest(
      ell: Ellipsoid, latTs: Double, lon0: Double,
      fe: Double, fn: Double): System = new PolarStereo(ell, latTs, lon0, fe, fn)
  private[graft] def albersForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double, sp1: Double, sp2: Double,
      fe: Double, fn: Double): System = new Albers2sp(ell, lat0, lon0, sp1, sp2, fe, fn)
  private[graft] def laeaForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double,
      fe: Double, fn: Double): System = new Laea(ell, lat0, lon0, fe, fn)
  private[graft] def swissForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double,
      fe: Double, fn: Double): System = new SwissOblique(ell, lat0, lon0, fe, fn)
}
