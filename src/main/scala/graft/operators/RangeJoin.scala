package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: pair every point with every interval that
 * contains it (start <= p <= end). The reference engine plans this as
 * an IEJoin / nested-loop over the inequality predicate
 * (duckdb `docs/guides/performance` range-join class); Catalyst would
 * fall back to BroadcastNestedLoopJoin, which is quadratic and
 * single-node-shaped — so this operator rewrites containment into an
 * EQUI-join on a bin key:
 *
 *   - each interval replicates to ceil(width/binWidth)+1 bins
 *     (`sequence(start div w, end div w)` exploded — replication
 *     factor is bounded and chosen by the caller via binWidth);
 *   - each point maps to exactly ONE bin (p div w), so a matching
 *     (point, interval) pair meets in exactly one bin and the join
 *     needs NO post-dedup;
 *   - the exact BETWEEN predicate rides the hash join as a residual
 *     filter.
 *
 * Scale shape: shuffle is |points| + |intervals|·(avg_width/w) rows on
 * a well-spread integer key — AQE's skew split applies if one bin is
 * hot (e.g. a burst hour). Pick binWidth near the median interval
 * width: wider bins = fewer interval replicas but more false candidates
 * per bin; narrower = the reverse. Same blocking idea as the grid
 * spatial join (SpatialJoin.scala), one dimension instead of two.
 */
object RangeJoin {

  /**
   * @param points    frame with an integer point column
   * @param intervals frame with integer [startCol, endCol] columns
   *                  (inclusive both ends; rows with end < start match
   *                  nothing)
   * @param point     point column on `points`
   * @param start     interval start column on `intervals`
   * @param end       interval end column on `intervals`
   * @param binWidth  bin width in point units (> 0)
   * @return points × intervals columns for every containment pair
   *         (column names must be disjoint across the two frames)
   */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      point: Column, start: Column, end: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision between sides: $overlap")

    val w = lit(binWidth)
    val iv = intervals
      .filter(start <= end)
      .withColumn("__bin",
        explode(sequence(floorDiv(start, w), floorDiv(end, w))))
    val pt = points.withColumn("__bin", floorDiv(point, w))
    pt.join(iv, pt("__bin") === iv("__bin") && point >= start && point <= end)
      .drop("__bin")
  }

  /** Floor division that is exact for negative values too (SQL `div`
   *  truncates toward zero; bins must tile the line uniformly). The
   *  divide is INTEGRAL: `c - pmod(c, w)` is an exact multiple of w,
   *  so truncating integral division equals floor — whereas a double
   *  `/` loses integers above 2^53 and can bin a point one slot off. */
  private def floorDiv(c: Column, w: Column): Column =
    org.apache.spark.sql.graft.ColumnShim
      .integralDivide(c - pmod(c, w), w).cast("long")
}
