package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The "native type" tier (reference docs/internals.md §"Multi-tiered
 * Geometry Type System", types.cpp:11-62): POINT_2D / BOX_2D /
 * LINESTRING_2D as plain struct/array columns, with operations
 * composed from Spark built-ins — everything stays inside whole-stage
 * codegen and parquet keeps per-column min/max stats on the fields.
 * Use for the hot paths (point-in-box scans, bbox math at 100 TB);
 * convert to WKB GEOMETRY only when full geometry semantics are needed.
 */
object NativeGeo {

  /** POINT_2D constructor: struct(x, y). */
  def point2d(x: Column, y: Column): Column = struct(x.as("x"), y.as("y"))

  /** BOX_2D constructor: struct(min_x, min_y, max_x, max_y). */
  def box2d(minX: Column, minY: Column, maxX: Column, maxY: Column): Column =
    struct(minX.as("min_x"), minY.as("min_y"), maxX.as("max_x"), maxY.as("max_y"))

  /** LINESTRING_2D constructor from parallel x/y arrays. */
  def linestring2d(xs: Column, ys: Column): Column =
    zip_with(xs, ys, (x, y) => struct(x.as("x"), y.as("y")))

  def boxArea(box: Column): Column =
    (box("max_x") - box("min_x")) * (box("max_y") - box("min_y"))

  def boxPerimeter(box: Column): Column =
    lit(2.0) * ((box("max_x") - box("min_x")) + (box("max_y") - box("min_y")))

  def boxCentroid(box: Column): Column = point2d(
    (box("min_x") + box("max_x")) / 2, (box("min_y") + box("max_y")) / 2)

  /** Strict point-in-box (boundary excluded — ST_Within semantics). */
  def boxContainsPoint(box: Column, pt: Column): Column =
    pt("x") > box("min_x") && pt("x") < box("max_x") &&
      pt("y") > box("min_y") && pt("y") < box("max_y")

  /** Box overlap incl. touching boundaries (ST_Intersects semantics). */
  def boxIntersects(a: Column, b: Column): Column =
    a("min_x") <= b("max_x") && a("max_x") >= b("min_x") &&
      a("min_y") <= b("max_y") && a("max_y") >= b("min_y")

  def pointDistance(a: Column, b: Column): Column =
    sqrt((a("x") - b("x")) * (a("x") - b("x")) + (a("y") - b("y")) * (a("y") - b("y")))

  /** Segment-sum length of a LINESTRING_2D. */
  def lineLength(line: Column): Column =
    coalesce(aggregate(
      zip_with(line, slice(line, lit(2), greatest(size(line) - 1, lit(0))),
        (p, q) => sqrt((p("x") - q("x")) * (p("x") - q("x")) + (p("y") - q("y")) * (p("y") - q("y")))),
      lit(0.0d), (acc, d) => acc + coalesce(d, lit(0.0d))), lit(0.0d))

  /** Shoelace area of a closed ring (array<struct<x,y>>). */
  def ringArea(ring: Column): Column =
    abs(aggregate(
      zip_with(ring, slice(ring, lit(2), greatest(size(ring) - 1, lit(0))),
        (p, q) => p("x") * q("y") - q("x") * p("y")),
      lit(0.0d), (acc, v) => acc + coalesce(v, lit(0.0d))) / 2)

  /** POINT_2D → GEOMETRY (WKB) bridge. */
  def toGeometry(pt: Column): Column = graft.GeoFunctions.st_point(pt("x"), pt("y"))

  /** BOX_2D → GEOMETRY (WKB) bridge. */
  def boxToGeometry(box: Column): Column =
    graft.GeoFunctions.st_makeenvelope(box("min_x"), box("min_y"), box("max_x"), box("max_y"))

  /** Native-tier ST_Transform: POINT_2D in, POINT_2D out — no WKB/JTS
   *  in the loop (reference registers the same per-type overload,
   *  proj/functions.cpp:488-517). */
  def transformPoint(pt: Column, src: String, dst: String, alwaysXy: Boolean = true): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(TransformNative(ColumnShim.expr(pt), src, dst, alwaysXy, isBox = false))
  }

  /** Native-tier ST_Transform for BOX_2D (corner transform, mirroring
   *  the reference's BOX_2D path). */
  def transformBox(box: Column, src: String, dst: String, alwaysXy: Boolean = true): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(TransformNative(ColumnShim.expr(box), src, dst, alwaysXy, isBox = true))
  }

  /** Hilbert index of a POINT_2D over given bounds — whole-stage
   *  codegen (static call into the curve encoder). */
  def hilbert(pt: Column, minX: Double, minY: Double, maxX: Double, maxY: Double): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(HilbertEncode(
      ColumnShim.expr(pt("x")), ColumnShim.expr(pt("y")),
      minX, minY, maxX, maxY))
  }
}
