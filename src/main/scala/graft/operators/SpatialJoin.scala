package graft.operators

import graft.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed spatial join.
 *
 * The reference rewrites `a JOIN b ON ST_Intersects(a.g, b.g)` into a
 * single-node IEJoin over bbox ranges (core/optimizer_rules.cpp:33-279
 * + DuckDB physical_iejoin). A range join does not scale on Spark —
 * there is no partitioning that co-locates arbitrary interval overlap.
 * Instead we decompose space into a uniform grid and turn the spatial
 * join into an EQUI-join on cell id (Spark's native strength: shuffle
 * hash / sort-merge, AQE skew handling), followed by the exact JTS
 * predicate:
 *
 *   1. each row explodes to the grid cells its bbox covers
 *      (points/small geoms → exactly 1 cell)
 *   2. equi-join on (cell_x, cell_y) — shuffles both sides by cell
 *   3. de-duplicate multi-cell pairs with the reference-point
 *      technique (a candidate pair is kept only in the cell that
 *      contains the top-left corner of the bbox intersection — no
 *      distinct() shuffle needed)
 *   4. cheap bbox-overlap prefilter, then exact JTS predicate
 *
 * Steps 1-3 are pure Spark built-ins (sequence/explode/floor) → whole
 * stage codegen; only the final predicate is a CodegenFallback
 * expression evaluated on surviving candidate pairs.
 *
 * At 100 TB scale: cell size controls the shuffle key cardinality and
 * skew. Too small → row explosion on large geometries; too big → hot
 * cells. `estimateCellSize` samples bbox extents and picks ~2× the
 * mean bbox diagonal, the standard heuristic for grid spatial joins.
 */
object SpatialJoin {

  /** Predicates whose candidate set is "bboxes overlap" (reference
   *  optimizer_rules.cpp:96-98 — st_disjoint excluded). */
  val supported: Set[String] = Set(
    "st_equals", "st_intersects", "st_touches", "st_crosses", "st_within",
    "st_contains", "st_overlaps", "st_covers", "st_coveredby",
    "st_containsproperly", "st_dwithin")

  /**
   * Grid spatial join. Result columns: left columns then right columns
   * (caller should alias collisions away first, like any Spark join).
   *
   * @param predicate one of [[supported]] (default st_intersects);
   *                  st_dwithin uses `distance`
   * @param cellSize  grid cell edge in coordinate units; <=0 → sample-estimate
   */
  def join(
      left: DataFrame, right: DataFrame,
      leftGeom: Column, rightGeom: Column,
      predicate: String = "st_intersects",
      cellSize: Double = 0.0,
      distance: Double = 0.0,
      broadcastRight: Boolean = false): DataFrame = {
    require(supported.contains(predicate), s"unsupported spatial join predicate: $predicate")

    val pad = if (predicate == "st_dwithin") distance else 0.0

    if (broadcastRight) {
      // small dim side: plain broadcast nested-loop with bbox prefilter
      val l = left.withColumn("__lg", leftGeom).withColumn("__lb", st_extent(col("__lg")))
      val r = right.withColumn("__rg", rightGeom).withColumn("__rb", st_extent(col("__rg")))
      val cond =
        col("__lb.min_x") <= col("__rb.max_x") + pad && col("__lb.max_x") >= col("__rb.min_x") - pad &&
        col("__lb.min_y") <= col("__rb.max_y") + pad && col("__lb.max_y") >= col("__rb.min_y") - pad &&
        exact(predicate, col("__lg"), col("__rg"), distance)
      return l.join(broadcast(r), cond, "inner")
        .drop("__lg", "__lb", "__rg", "__rb")
    }

    val cs = if (cellSize > 0) cellSize else estimateCellSize(left, leftGeom, right, rightGeom)

    def withCells(df: DataFrame, geom: Column, prefix: String, padBy: Double): DataFrame = {
      val g = col(s"${prefix}g")
      df.withColumn(s"${prefix}g", geom)
        .withColumn(s"${prefix}b", st_extent(g))
        .withColumn(s"${prefix}cx",
          explode(sequence(
            floor((col(s"${prefix}b.min_x") - padBy) / cs).cast("long"),
            floor((col(s"${prefix}b.max_x") + padBy) / cs).cast("long"))))
        .withColumn(s"${prefix}cy",
          explode(sequence(
            floor((col(s"${prefix}b.min_y") - padBy) / cs).cast("long"),
            floor((col(s"${prefix}b.max_y") + padBy) / cs).cast("long"))))
    }

    // pad only one side for dwithin (padding both would double-count)
    val l = withCells(left, leftGeom, "__l", pad)
    val r = withCells(right, rightGeom, "__r", 0.0)

    val bboxOverlap =
      col("__lb.min_x") <= col("__rb.max_x") + pad && col("__lb.max_x") >= col("__rb.min_x") - pad &&
      col("__lb.min_y") <= col("__rb.max_y") + pad && col("__lb.max_y") >= col("__rb.min_y") - pad

    // reference-point dedup: keep the pair only in the cell holding the
    // min corner of the (padded) bbox intersection
    val refX = greatest(col("__lb.min_x") - pad, col("__rb.min_x"))
    val refY = greatest(col("__lb.min_y") - pad, col("__rb.min_y"))
    val dedup =
      floor(refX / cs).cast("long") === col("__lcx") &&
      floor(refY / cs).cast("long") === col("__lcy")

    val joined = l.join(r,
      col("__lcx") === col("__rcx") && col("__lcy") === col("__rcy") &&
        bboxOverlap && dedup &&
        exact(predicate, col("__lg"), col("__rg"), distance),
      "inner")

    joined.drop("__lg", "__lb", "__lcx", "__lcy", "__rg", "__rb", "__rcx", "__rcy")
  }

  private def exact(predicate: String, lg: Column, rg: Column, distance: Double): Column =
    predicate match {
      case "st_dwithin" => st_dwithin(lg, rg, lit(distance))
      case p => st(p, lg, rg)
    }

  /** Sample both sides' bboxes and pick a cell edge ≈ 2× the larger
   *  side's mean bbox extent (driver-side action over ≤1k rows/side —
   *  plan-time only, like AQE's stats collection). */
  def estimateCellSize(left: DataFrame, leftGeom: Column, right: DataFrame, rightGeom: Column): Double = {
    def meanExtent(df: DataFrame, g: Column): Double = {
      val row = df.select(st_extent(g).as("b")).limit(1000)
        .select(
          avg(col("b.max_x") - col("b.min_x")).as("w"),
          avg(col("b.max_y") - col("b.min_y")).as("h"),
          min(col("b.min_x")).as("x0"), max(col("b.max_x")).as("x1"),
          min(col("b.min_y")).as("y0"), max(col("b.max_y")).as("y1"))
        .collect()(0)
      val meanWh = math.max(row.getDouble(0), row.getDouble(1))
      val span = math.max(row.getDouble(3) - row.getDouble(2), row.getDouble(5) - row.getDouble(4))
      // geometries with near-zero extent (points): fall back to span/256
      if (meanWh <= 0 || meanWh.isNaN) span / 256.0 else meanWh
    }
    val cell = 2.0 * math.max(meanExtent(left, leftGeom), meanExtent(right, rightGeom))
    if (cell <= 0 || cell.isNaN) 1.0 else cell
  }
}
