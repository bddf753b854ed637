package graft.functions

import org.locationtech.jts.geom.{Coordinate, Geometry}

/**
 * Minimal CRS transform engine for ST_Transform (reference:
 * spatial/src/spatial/proj/functions.cpp — full PROJ). PROJ/proj4j is
 * not available offline, so we implement the published projection math
 * for the CRSs that appear in the reference tests and common workloads:
 *
 *  - EPSG:4326  WGS84 geographic (authority axis order lat/lon)
 *  - EPSG:4269  NAD83 geographic (treated as WGS84-compatible datum)
 *  - EPSG:3857  WGS84 Web Mercator
 *  - EPSG:326xx/327xx  WGS84 UTM zones (Karney/Krüger series, std. published)
 *
 * `always_xy` mirrors PROJ's flag (proj/functions.cpp:64-81): when
 * false, geographic CRSs use authority order (lat,lon); when true,
 * everything is lon/lat ("GIS friendly") — reference test
 * test/sql/proj.test:1-13 documents this behavior.
 */
object Crs {
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563

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

  /** Transverse Mercator via the Krüger n-series (6 terms), the same
   *  published algorithm PROJ's etmerc/UTM uses; accurate to <0.1 mm. */
  private final class Utm(zone: Int, north: Boolean) extends System {
    private val k0 = 0.9996
    private val e2 = F * (2 - F)
    private val n = F / (2 - F)
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    private val AA = A / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val lon0 = math.toRadians(zone * 6 - 183)
    private val falseE = 500000.0
    private val falseN = if (north) 0.0 else 10000000.0
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

    def forward(lonD: Double, latD: Double): (Double, Double) = {
      val lat = math.toRadians(latD)
      val lon = math.toRadians(lonD) - lon0
      val e = math.sqrt(e2)
      val t = math.sinh(atanh(math.sin(lat)) - e * atanh(e * math.sin(lat)))
      val xiP = math.atan2(t, math.cos(lon))
      val etaP = atanh(math.sin(lon) / math.sqrt(1 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 6) {
        xi += alpha(j) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alpha(j) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
        j += 1
      }
      (falseE + k0 * AA * eta, falseN + k0 * AA * xi)
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val xi = (yIn - falseN) / (k0 * AA)
      val eta = (xIn - falseE) / (k0 * AA)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 6) {
        xiP -= beta(j) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
        j += 1
      }
      val e = math.sqrt(e2)
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      // fixed-point iteration conformal → geodetic latitude:
      // lat = asin(tanh(atanh(sin(chi)) + e*atanh(e*sin(lat))))
      var lat = chi
      var k = 0
      var prev = 0.0
      do {
        prev = lat
        lat = math.asin(math.tanh(atanh(math.sin(chi)) + e * atanh(e * math.sin(lat))))
        k += 1
      } while (math.abs(lat - prev) > 1e-14 && k < 25)
      val lon = lon0 + math.atan2(math.sinh(etaP), math.cos(xiP))
      (math.toDegrees(lon), math.toDegrees(lat))
    }

    private def atanh(v: Double): Double = 0.5 * math.log((1 + v) / (1 - v))
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, System]()

  def resolve(crsIn: String): System = {
    val crs = crsIn.trim.toUpperCase
    val cached = cache.get(crs)
    if (cached != null) return cached
    val sys = crs match {
      case "EPSG:4326" | "WGS84" | "EPSG:4269" | "OGC:CRS84" | "CRS84" => Geographic
      case "EPSG:3857" | "EPSG:900913" => WebMercator
      case c if c.startsWith("EPSG:32") && c.length == 10 => // EPSG:326xx / EPSG:327xx
        val code = c.substring(5).toInt
        if (code >= 32601 && code <= 32660) new Utm(code - 32600, north = true)
        else if (code >= 32701 && code <= 32760) new Utm(code - 32700, north = false)
        else throw new IllegalArgumentException(s"unsupported CRS: $crsIn")
      case _ => throw new IllegalArgumentException(
        s"unsupported CRS: $crsIn (supported: EPSG:4326, EPSG:4269, OGC:CRS84, EPSG:3857, EPSG:326xx/327xx UTM)")
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
}
