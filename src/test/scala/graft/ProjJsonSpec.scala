package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Crs

/** PROJJSON emission (st_read_meta.crs.projjson; reference fills it
 *  via GDAL OSR — gdal/functions/st_read_meta.cpp:26-91).
 *
 *  The strong check is INDEPENDENT: a python process json.loads every
 *  emitted document and re-derives the expected parameter set from the
 *  proj4 string with its own tokenizer — nothing from the Scala
 *  emitter is trusted beyond the bytes under test. */
class ProjJsonSpec extends AnyFunSuite {

  private val cases: Seq[String] = Seq(
    "+proj=longlat +datum=WGS84 +no_defs",
    "+proj=longlat +ellps=clrk80ign +pm=paris +no_defs",
    "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy +no_defs",
    "+proj=utm +zone=33 +ellps=GRS80 +no_defs",
    "+proj=utm +zone=19 +south +ellps=WGS84 +no_defs",
    "+proj=lcc +lat_0=40.1666666666667 +lon_0=-74 +lat_1=40.6666666666667 +lat_2=41.0333333333333 +x_0=300000 +y_0=0 +ellps=GRS80 +units=us-ft +no_defs",
    "+proj=lcc +lat_1=52 +lat_0=52 +lon_0=0 +k_0=0.99987742 +x_0=600000 +y_0=2200000 +ellps=clrk80ign +no_defs",
    "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 +x_0=0 +y_0=0 +ellps=GRS80 +no_defs",
    "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80 +no_defs",
    "+proj=webmerc +datum=WGS84 +units=m +no_defs",
    "+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 +y_0=900000 +ellps=bessel +no_defs",
    "+proj=merc +lat_ts=-41 +lon_0=100 +x_0=3 +y_0=5 +ellps=WGS84 +no_defs",
    "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +no_defs",
    "+proj=stere +lat_0=90 +k=0.994 +lon_0=0 +x_0=2000000 +y_0=2000000 +ellps=WGS84 +no_defs",
    "+proj=sterea +lat_0=52.1561605555556 +lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel +no_defs",
    "+proj=somerc +lat_0=46.9524055555556 +lon_0=7.43958333333333 +x_0=2600000 +y_0=1200000 +ellps=bessel +no_defs",
    "+proj=eqc +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs",
    "+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 +alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel +no_defs")

  test("every supported projection family emits PROJJSON that python-validates") {
    val docs = cases.map { p4 =>
      val js = Crs.proj4ToProjJson(p4).getOrElse(fail(s"no projjson for $p4"))
      (p4, js)
    }
    val payload = docs.map { case (p4, js) => s"$p4\t$js" }.mkString("\n")
    val f = java.io.File.createTempFile("projjson", ".tsv")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, payload.getBytes("UTF-8"))
    // python re-derives the parameter expectations from the proj string
    // with its own tokenizer and checks them against the JSON
    val py =
      """
import json, sys, math
PROJ_PARAM = {  # proj token -> candidate PROJJSON parameter names
  'lat_0': ['Latitude of natural origin','Latitude of false origin','Latitude of projection centre'],
  'lon_0': ['Longitude of natural origin','Longitude of false origin','Longitude of origin','Longitude of projection centre'],
  'lat_1': ['Latitude of 1st standard parallel','Latitude of natural origin'],
  'lat_2': ['Latitude of 2nd standard parallel'],
  'lat_ts': ['Latitude of standard parallel','Latitude of 1st standard parallel'],
  'k': ['Scale factor at natural origin','Scale factor at projection centre','Scale factor on pseudo standard parallel'],
  'k_0': ['Scale factor at natural origin','Scale factor at projection centre','Scale factor on pseudo standard parallel'],
  'x_0': ['False easting','Easting at false origin','Easting at projection centre'],
  'y_0': ['False northing','Northing at false origin','Northing at projection centre'],
}
ELLPS_A = {'WGS84':6378137.0,'GRS80':6378137.0,'airy':6377563.396,'bessel':6377397.155,
           'intl':6378388.0,'clrk66':6378206.4,'clrk80ign':6378249.2,'krass':6378245.0}
fails = []
for line in open(sys.argv[1]):
    p4, js = line.rstrip('\n').split('\t')
    doc = json.loads(js)            # hard validation: well-formed JSON
    kv = {}
    for tok in p4.split():
        if tok.startswith('+') and '=' in tok:
            k, v = tok[1:].split('=', 1); kv[k] = v
    proj = kv['proj']
    if proj == 'longlat':
        if doc['type'] != 'GeographicCRS': fails.append((p4, 'type', doc['type']))
        ell = doc['datum']['ellipsoid']
    else:
        if doc['type'] != 'ProjectedCRS': fails.append((p4, 'type', doc['type']))
        ell = doc['base_crs']['datum']['ellipsoid']
        params = {p['name']: p['value'] for p in doc['conversion']['parameters']}
        if proj == 'utm':           # derived, not literal
            z = int(kv['zone'])
            exp = {'Longitude of natural origin': z*6-183,
                   'Scale factor at natural origin': 0.9996,
                   'False easting': 500000.0,
                   'False northing': 10000000.0 if 'south' in p4 else 0.0}
            for n, v in exp.items():
                if abs(params.get(n, 1e99) - v) > 1e-9: fails.append((p4, n, params.get(n)))
        else:
            skip = set()
            if proj == 'stere' and 'lat_ts' in kv:
                skip.add('lat_0')   # variant B: the pole is implied, not a parameter
            for tok, names in PROJ_PARAM.items():
                if tok not in kv or tok in skip: continue
                want = float(kv[tok])
                if not any(abs(params.get(n, 1e99) - want) < 1e-9 for n in names):
                    fails.append((p4, tok, [params.get(n) for n in names]))
    # ellipsoid semi-major must match the +ellps/+datum table
    a = ELLPS_A.get(kv.get('ellps', kv.get('datum', '')), ELLPS_A['WGS84'])
    got_a = ell.get('semi_major_axis', ell.get('radius'))
    if abs(got_a - a) > 1e-6: fails.append((p4, 'a', got_a))
    # ftUS unit must surface on the axis, not be silently dropped
    if kv.get('units') == 'us-ft':
        u = doc['coordinate_system']['axis'][0]['unit']
        if not (isinstance(u, dict) and abs(u['conversion_factor'] - 1200.0/3937.0) < 1e-15):
            fails.append((p4, 'unit', u))
for f in fails: print('PJFAIL', f)
print('PJOK', 0 if fails else 1)
"""
    val pf = java.io.File.createTempFile("projjson_check", ".py")
    pf.deleteOnExit()
    java.nio.file.Files.write(pf.toPath, py.getBytes("UTF-8"))
    val out = scala.sys.process.Process(
      Seq("python3", pf.getAbsolutePath, f.getAbsolutePath)).!!
    assert(out.contains("PJOK 1"), out)
  }

  test("PROJJSON is accepted as CRS input and round-trips onto the same transform") {
    // emit -> parse back through Crs.resolve('{...}') -> forward parity
    // with the original proj-string System on in-domain probe points
    val probes = Map(
      "somerc" -> Seq((7.44, 46.95), (8.54, 47.38)),
      "stere" -> Seq((120.0, -75.0), (10.0, 78.0)),
      "krovak" -> Seq((14.44, 50.08), (17.11, 48.15)),
      "eqc" -> Seq((30.0, -20.0), (100.0, 5.0))).withDefaultValue(
      Seq((5.0, 45.0), (12.0, 52.0), (-3.0, 40.0)))
    cases.foreach { p4 =>
      val js = Crs.proj4ToProjJson(p4).getOrElse(fail(s"no projjson for $p4"))
      val a = Crs.resolve(p4)
      val b = Crs.resolve(js)
      val proj = "\\+proj=(\\w+)".r.findFirstMatchIn(p4).get.group(1)
      val pts =
        if (p4.contains("+south")) Seq((-69.0, -33.0), (-70.5, -20.0))
        else if (p4.contains("lat_0=-90")) Seq((120.0, -75.0), (-45.0, -80.0))
        else if (p4.contains("lon_0=110") || p4.contains("lon_0=100"))
          Seq((105.0, -6.0), (112.0, 2.0))
        else probes(proj)
      pts.foreach { case (lon, lat) =>
        val (ax, ay) = a.forward(lon, lat)
        val (bx, by) = b.forward(lon, lat)
        assert(math.abs(ax - bx) < 1e-6 && math.abs(ay - by) < 1e-6,
          s"$p4 at ($lon,$lat): ($ax,$ay) vs ($bx,$by)")
      }
    }
    // BoundCRS with a 7-param position-vector transformation (ppm form)
    val bound = """{"type":"BoundCRS","source_crs":{"type":"ProjectedCRS","name":"OSGB36 / British National Grid","base_crs":{"type":"GeographicCRS","name":"OSGB36","datum":{"type":"GeodeticReferenceFrame","name":"Ordnance Survey of Great Britain 1936","ellipsoid":{"name":"Airy 1830","semi_major_axis":6377563.396,"inverse_flattening":299.3249646}},"coordinate_system":{"subtype":"ellipsoidal","axis":[]}},"conversion":{"name":"British National Grid","method":{"name":"Transverse Mercator","id":{"authority":"EPSG","code":9807}},"parameters":[{"name":"Latitude of natural origin","value":49,"unit":"degree"},{"name":"Longitude of natural origin","value":-2,"unit":"degree"},{"name":"Scale factor at natural origin","value":0.9996012717,"unit":"unity"},{"name":"False easting","value":400000,"unit":"metre"},{"name":"False northing","value":-100000,"unit":"metre"}]},"coordinate_system":{"subtype":"Cartesian","axis":[{"name":"Easting","abbreviation":"E","direction":"east","unit":"metre"},{"name":"Northing","abbreviation":"N","direction":"north","unit":"metre"}]}},"target_crs":{"type":"GeographicCRS","name":"WGS 84","datum_ensemble":{"name":"World Geodetic System 1984 ensemble","members":[],"ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,"inverse_flattening":298.257223563}},"coordinate_system":{"subtype":"ellipsoidal","axis":[]}},"transformation":{"name":"OSGB36 to WGS 84 (9)","method":{"name":"Position Vector transformation (geog2D domain)","id":{"authority":"EPSG","code":9606}},"parameters":[{"name":"X-axis translation","value":446.448,"unit":"metre"},{"name":"Y-axis translation","value":-125.157,"unit":"metre"},{"name":"Z-axis translation","value":542.06,"unit":"metre"},{"name":"X-axis rotation","value":0.15,"unit":"arc-second"},{"name":"Y-axis rotation","value":0.247,"unit":"arc-second"},{"name":"Z-axis rotation","value":0.842,"unit":"arc-second"},{"name":"Scale difference","value":-20.4894,"unit":"parts per million"}]}}"""
    val twin = Crs.resolve(
      "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
        "+y_0=-100000 +ellps=airy " +
        "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.4894")
    val fromJson = Crs.resolve(bound)
    Seq((-1.5, 52.5), (-3.2, 55.95)).foreach { case (lon, lat) =>
      val (ax, ay) = twin.forward(lon, lat)
      val (bx, by) = fromJson.forward(lon, lat)
      assert(math.abs(ax - bx) < 1e-3 && math.abs(ay - by) < 1e-3,
        s"bound at ($lon,$lat): ($ax,$ay) vs ($bx,$by)")
    }
    // a non-WGS84-hub BoundCRS is refused, like the WKT2 twin
    val badBound = bound.replace("\"name\":\"WGS 84\"", "\"name\":\"ETRS89\"")
      .replace("World Geodetic System 1984 ensemble", "European Terrestrial Reference System 1989")
    val e = intercept[IllegalArgumentException](Crs.resolve(badBound))
    assert(e.getMessage.contains("not WGS84"), e.getMessage)
  }

  test("unsupported projections return None, never malformed JSON") {
    assert(Crs.proj4ToProjJson("+proj=robin +lon_0=0").isEmpty)
    assert(Crs.proj4ToProjJson("not a proj string").isEmpty)
  }

  test("wktToProjJson composes through the proj4 decision point") {
    val wkt = """PROJCS["NAD83 / New York Long Island (ftUS)",GEOGCS["NAD83",DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic_2SP"],PARAMETER["standard_parallel_1",41.03333333333333],PARAMETER["standard_parallel_2",40.66666666666666],PARAMETER["latitude_of_origin",40.16666666666666],PARAMETER["central_meridian",-74],PARAMETER["false_easting",984250.0000000002],PARAMETER["false_northing",0],UNIT["US survey foot",0.3048006096012192]]"""
    val js = Crs.wktToProjJson(wkt).getOrElse(fail("no projjson"))
    assert(js.contains("\"Lambert Conic Conformal (2SP)\""), js.take(200))
    assert(js.contains("\"code\":9802"), js.take(200))
  }
}
