package graft.functions

/**
 * NTv2 grid-shift file (`.gsb`) reader + bilinear shift evaluation.
 *
 * The reference embeds PROJ's full grid catalog and applies NTv2
 * grids inside ST_Transform (reference spatial/src/proj/functions
 * .cpp:488-517, docs/internals.md "Embedded PROJ Database"); this is
 * the Spark-side analog fed by an optional local grid directory
 * (`spark.graft.crs.gridDir`). The binary layout implemented here is
 * the published NRCan "National Transformation v2" developer format:
 *  - 11 overview records of 16 bytes (8-char name + int32/double/
 *    8-char value): NUM_OREC, NUM_SREC, NUM_FILE, GS_TYPE, VERSION,
 *    SYSTEM_F, SYSTEM_T, MAJOR_F, MINOR_F, MAJOR_T, MINOR_T
 *  - per sub-grid, 11 records: SUB_NAME, PARENT, CREATED, UPDATED,
 *    S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC (arc-seconds,
 *    longitude positive WEST), GS_COUNT
 *  - GS_COUNT nodes of 4 float32s: lat shift, lon shift (arc-seconds,
 *    positive west), lat/lon accuracy. Nodes run longitude-fastest
 *    from E_LONG toward W_LONG, rows from S_LAT to N_LAT.
 * Endianness is detected from NUM_OREC (== 11 in exactly one order).
 *
 * Shift semantics (PROJ-compatible): for a point on the SOURCE datum,
 * target_lat = lat + dLat/3600 and, in east-positive longitude,
 * target_lon = lon - dLonWest/3600. The inverse direction is the
 * standard fixed-point iteration (4 rounds, the same budget PROJ
 * uses) re-evaluating the shift at the current source guess.
 *
 * Scale shape: grids load once per JVM (executor-local cache keyed by
 * dir+datum pair) from a node-local path; per-row work is a bounded
 * subgrid scan + one bilinear — no driver participation.
 */
object Ntv2 {

  final case class SubGrid(
      name: String, parent: String,
      sLat: Double, nLat: Double, eLonW: Double, wLonW: Double,
      latInc: Double, lonInc: Double,
      nRows: Int, nCols: Int,
      latShift: Array[Float], lonShift: Array[Float]) {

    def contains(latSec: Double, lonWSec: Double): Boolean =
      latSec >= sLat && latSec <= nLat && lonWSec >= eLonW && lonWSec <= wLonW

    /** Bilinear interpolation of (dLatSec, dLonWestSec) at a point
     *  inside the subgrid. The exact operation order here is
     *  replicated by the python golden (tools/make_gsb_fixture.py) —
     *  keep them in sync bit-for-bit. */
    def interp(latSec: Double, lonWSec: Double): (Double, Double) = {
      var row = ((latSec - sLat) / latInc).toInt
      var col = ((lonWSec - eLonW) / lonInc).toInt
      if (row > nRows - 2) row = nRows - 2
      if (col > nCols - 2) col = nCols - 2
      val fy = (latSec - sLat) / latInc - row
      val fx = (lonWSec - eLonW) / lonInc - col
      def bil(arr: Array[Float]): Double = {
        val a = arr(row * nCols + col).toDouble
        val b = arr(row * nCols + col + 1).toDouble
        val c = arr((row + 1) * nCols + col).toDouble
        val d = arr((row + 1) * nCols + col + 1).toDouble
        a * (1 - fx) * (1 - fy) + b * fx * (1 - fy) +
          c * (1 - fx) * fy + d * fx * fy
      }
      (bil(latShift), bil(lonShift))
    }
  }

  final case class Grid(systemF: String, systemT: String, subs: Seq[SubGrid]) {

    /** Densest subgrid containing the point (ties broken by name so
     *  selection is deterministic across engines). */
    def subFor(latSec: Double, lonWSec: Double): Option[SubGrid] = {
      var best: SubGrid = null
      subs.foreach { sg =>
        if (sg.contains(latSec, lonWSec) &&
            (best == null || sg.latInc < best.latInc ||
              (sg.latInc == best.latInc && sg.name < best.name)))
          best = sg
      }
      Option(best)
    }

    /** source datum -> target datum; None when outside every subgrid
     *  (callers fall back to the parametric Helmert). */
    def forward(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      val latSec = latDeg * 3600.0
      val lonW = -lonDeg * 3600.0
      subFor(latSec, lonW).map { sg =>
        val (dLat, dLonW) = sg.interp(latSec, lonW)
        (lonDeg - dLonW / 3600.0, latDeg + dLat / 3600.0)
      }
    }

    /** target datum -> source datum: fixed-point, 4 rounds. */
    def inverse(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      var lo = lonDeg; var la = latDeg
      var any = false
      var i = 0
      while (i < 4) {
        val latSec = la * 3600.0
        val lonW = -lo * 3600.0
        subFor(latSec, lonW) match {
          case Some(sg) =>
            any = true
            val (dLat, dLonW) = sg.interp(latSec, lonW)
            lo = lonDeg + dLonW / 3600.0
            la = latDeg - dLat / 3600.0
          case None =>
            i = 4 // guess left the grid: keep the last in-grid estimate
        }
        i += 1
      }
      if (any) Some((lo, la)) else None
    }
  }

  // ---- binary parse ------------------------------------------------------

  private final class Rec(buf: java.nio.ByteBuffer) {
    def next(): (String, Long, Double, String) = {
      val nameB = new Array[Byte](8)
      buf.get(nameB)
      val name = new String(nameB, "US-ASCII").trim
      val pos = buf.position()
      val asLong = buf.getInt(pos).toLong
      val asDouble = buf.getDouble(pos)
      val strB = new Array[Byte](8)
      buf.get(strB)
      (name, asLong, asDouble, new String(strB, "US-ASCII").trim)
    }
  }

  def parse(path: String): Grid = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(bytes.length >= 11 * 16, s"$path: truncated NTv2 header")
    val le = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val order =
      if (le.getInt(8) == 11) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val buf = java.nio.ByteBuffer.wrap(bytes).order(order)
    require(buf.getInt(8) == 11, s"$path: not an NTv2 file (NUM_OREC != 11)")
    val rec = new Rec(buf)
    var numFile = 0
    var sysF = ""; var sysT = ""
    (0 until 11).foreach { _ =>
      rec.next() match {
        case ("NUM_FILE", v, _, _) => numFile = v.toInt
        case ("SYSTEM_F", _, _, s) => sysF = s
        case ("SYSTEM_T", _, _, s) => sysT = s
        case _ => ()
      }
    }
    require(numFile >= 1 && numFile <= 4096, s"$path: NUM_FILE $numFile out of range")
    val subs = (0 until numFile).map { _ =>
      var name = ""; var parent = ""
      var sLat = 0.0; var nLat = 0.0; var eLon = 0.0; var wLon = 0.0
      var latInc = 0.0; var lonInc = 0.0; var count = 0
      (0 until 11).foreach { _ =>
        rec.next() match {
          case ("SUB_NAME", _, _, s) => name = s
          case ("PARENT", _, _, s) => parent = s
          case ("S_LAT", _, v, _) => sLat = v
          case ("N_LAT", _, v, _) => nLat = v
          case ("E_LONG", _, v, _) => eLon = v
          case ("W_LONG", _, v, _) => wLon = v
          case ("LAT_INC", _, v, _) => latInc = v
          case ("LONG_INC", _, v, _) => lonInc = v
          case ("GS_COUNT", v, _, _) => count = v.toInt
          case _ => ()
        }
      }
      require(latInc > 0 && lonInc > 0, s"$path/$name: non-positive grid increment")
      val nRows = math.round((nLat - sLat) / latInc).toInt + 1
      val nCols = math.round((wLon - eLon) / lonInc).toInt + 1
      // a 1-row/1-col subgrid parses consistently but bilinear interp
      // would clamp to index -1 at query time — reject at parse instead
      require(nRows >= 2 && nCols >= 2,
        s"$path/$name: degenerate subgrid ($nRows x $nCols) — need >= 2x2 nodes")
      require(count == nRows * nCols,
        s"$path/$name: GS_COUNT $count != $nRows x $nCols")
      require(count.toLong * 16 <= buf.remaining(),
        s"$path/$name: node block overruns the file")
      val latA = new Array[Float](count)
      val lonA = new Array[Float](count)
      var i = 0
      while (i < count) {
        latA(i) = buf.getFloat()
        lonA(i) = buf.getFloat()
        buf.getFloat(); buf.getFloat() // accuracies, unused
        i += 1
      }
      SubGrid(name, parent, sLat, nLat, eLon, wLon, latInc, lonInc, nRows, nCols, latA, lonA)
    }
    Grid(sysF, sysT, subs)
  }

  // ---- per-JVM grid registry --------------------------------------------

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Grid]]()

  private def gridDir: String =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.crs.gridDir", "")
    catch { case _: Exception => "" }

  /** The grid for a datum pair under the session's gridDir, or None
   *  (no dir configured / no matching file) — callers then use the
   *  parametric Helmert. Parsed grids cache per (dir, pair) per JVM. */
  def gridFor(from: String, to: String): Option[Grid] = {
    val dir = gridDir
    if (dir.isEmpty) return None
    cache.computeIfAbsent(s"$dir|$from|$to", _ => {
      try {
        val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
          .filter(_.getName.toLowerCase.endsWith(".gsb")).sortBy(_.getName)
        val parsed = files.map(f => (f.getName.toUpperCase, parse(f.getPath)))
        // primary: the file's own SYSTEM_F/SYSTEM_T header fields;
        // fallback: filename convention (e.g. OSTN15_NTv2_OSGBtoETRS
        // carries neither datum in its header fields consistently) —
        // both datum tokens appearing in the name, source first
        parsed.iterator.map(_._2)
          .find(g => g.systemF.equalsIgnoreCase(from) && g.systemT.equalsIgnoreCase(to))
          .orElse {
            val f = from.toUpperCase; val t = to.toUpperCase
            parsed.iterator.collectFirst {
              case (name, g) if {
                val i = name.indexOf(f.take(4)); val j = name.indexOf(t.take(4))
                i >= 0 && j > i
              } => g
            }
          }
      } catch { case _: Exception => None }
    })
  }
}
