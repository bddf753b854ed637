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
      (math.toDegrees(lon), math.toDegrees(lat))
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
      () => new Laea(GRS80, 52.0, 10.0, 4321000.0, 3210000.0)))

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
    fixed ++ utmWgs ++ utmNad
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, System]()

  def resolve(crsIn: String): System = {
    val crs = crsIn.trim.toUpperCase
    val cached = cache.get(crs)
    if (cached != null) return cached
    val sys = crs match {
      case "WGS84" | "CRS84" | "OGC:CRS84" => Geographic
      case "EPSG:900913" => WebMercator
      case c if byKey.contains(c) => byKey(c).build()
      case c if c.startsWith("EPSG:32") && c.length == 10 => // EPSG:326xx / EPSG:327xx
        val code = c.substring(5).toInt
        if (code >= 32601 && code <= 32660)
          new TransMerc(WGS84, 0, (code - 32600) * 6 - 183, 0.9996, 500000.0, 0.0)
        else if (code >= 32701 && code <= 32760)
          new TransMerc(WGS84, 0, (code - 32700) * 6 - 183, 0.9996, 500000.0, 10000000.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case c if c.startsWith("EPSG:269") && c.length == 10 => // EPSG:269xx NAD83 UTM
        val code = c.substring(5).toInt
        if (code >= 26901 && code <= 26923)
          new TransMerc(GRS80, 0, (code - 26900) * 6 - 183, 0.9996, 500000.0, 0.0)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case _ => throw new IllegalArgumentException(
        s"unsupported CRS: $crsIn (see st_list_proj_crs() for the supported catalog)")
    }
    cache.put(crs, sys)
    sys
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

  /** ESRI WKT1 for a supported CRS (what a .prj sidecar contains).
   *  Parameters restate the same published EPSG definitions the
   *  `registry` builders use; false origins appear in the map unit. */
  def esriWkt(crsIn: String): Option[String] = {
    val crs = crsIn.trim.toUpperCase
    def ftUs(m: Double) = m / FtUs
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
        val code = c.substring(5).toInt
        if (code >= 32601 && code <= 32660)
          Some(tmWkt(s"WGS_1984_UTM_Zone_${code - 32600}N", GeogWgs84,
            0.0, (code - 32600) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else if (code >= 32701 && code <= 32760)
          Some(tmWkt(s"WGS_1984_UTM_Zone_${code - 32700}S", GeogWgs84,
            0.0, (code - 32700) * 6 - 183, 0.9996, 500000.0, 10000000.0, "Meter", 1.0))
        else None
      case c if c.startsWith("EPSG:269") && c.length == 10 =>
        val code = c.substring(5).toInt
        if (code >= 26901 && code <= 26923)
          Some(tmWkt(s"NAD_1983_UTM_Zone_${code - 26900}N", GeogNad83,
            0.0, (code - 26900) * 6 - 183, 0.9996, 500000.0, 0.0, "Meter", 1.0))
        else None
      case _ => None
    }
    wkt
  }

  /** Test seams for the equal-area projections (Snyder's worked
   *  examples use Clarke 1866). */
  private[graft] def albersForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double, sp1: Double, sp2: Double,
      fe: Double, fn: Double): System = new Albers2sp(ell, lat0, lon0, sp1, sp2, fe, fn)
  private[graft] def laeaForTest(
      ell: Ellipsoid, lat0: Double, lon0: Double,
      fe: Double, fn: Double): System = new Laea(ell, lat0, lon0, fe, fn)
}
