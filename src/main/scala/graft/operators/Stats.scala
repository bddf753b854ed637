package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution statistics over integer-valued columns — the
 * length/score/token-count profiling passes every corpus-curation
 * pipeline runs before choosing filter thresholds (the reference
 * engine's `quantile_disc` / `histogram` aggregate family,
 * duckdb docs/sql/functions/aggregates).
 *
 * Everything here is EXACT integer arithmetic (rank = ceil(q·n) order
 * statistics, floor-division bucketing), so results hash-certify
 * across engines — no interpolated doubles.
 */
object Stats {

  /**
   * Exact per-group quantiles (discrete / order-statistic semantics):
   * for each group and each q (in per-mille), the value at 1-based
   * rank ceil(q·n/1000) of the group's value-sorted multiset — i.e.
   * the smallest value with at least that many elements ≤ it.
   * qPerMille = 500 is the exact median-low, 990 the P99.
   *
   * Scale shape — the histogram formulation, NOT a per-group sort of
   * the data: (group, value) counts first (ONE partial-aggregating
   * exchange of distinct pairs, map-side combined — row count bounded
   * by group-count × value-domain, independent of corpus size), then
   * a running cumsum over each group's DISTINCT values and a
   * rank-containment join against the (groups × qs)-sized rank frame.
   * A naive `row_number` over raw rows would sort whole groups in one
   * partition; here the window only ever sees distinct values, so a
   * 10-billion-row group with a 100k-wide value domain costs a 100k
   * window, not a 10B sort.
   *
   * @param qsPerMille quantiles in per-mille, each in (0, 1000]
   * @return (grp, qpm, value) — one row per group per q
   */
  def groupQuantilesExact(
      df: DataFrame, group: Column, value: Column,
      qsPerMille: Seq[Int]): DataFrame = {
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q > 0 && q <= 1000),
      "qsPerMille must be in (0, 1000]")
    val counts = df.select(group.as("grp"), value.cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("hi", sum("c").over(w))
    val ranks = counts.groupBy("grp").agg(sum("c").as("n"))
      .select(col("grp"), col("n"),
        explode(lit(qsPerMille.toArray)).as("qpm"))
      // ceil(q*n/1000) in pure integers; q > 0 makes the rank >= 1
      .withColumn("r", org.apache.spark.sql.graft.ColumnShim
        .integralDivide(col("qpm") * col("n") + lit(999L), lit(1000L)))
    // the quantile value's distinct-value row is the one whose
    // cumulative range [hi-c+1, hi] contains the rank
    ranks.join(cum, Seq("grp"))
      .filter(col("hi") >= col("r") && col("hi") - col("c") < col("r"))
      .select(col("grp"), col("qpm"), col("v").as("value"))
  }

  /**
   * Exact equi-width histogram per group: bucket = floor(value /
   * width), emitting (grp, bucket, bucket_start, n, sum_v). Empty
   * buckets are omitted (join against [[EventOps.resample]]-style
   * grids if a dense axis is needed). ONE partial-aggregating
   * exchange; bucketing is exact integral floor division (uniform
   * tiling across negative values, no double detour).
   */
  def groupHistogram(
      df: DataFrame, group: Column, value: Column, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val v = value.cast("long")
    val bucket = org.apache.spark.sql.graft.ColumnShim
      .integralDivide(v - pmod(v, lit(width)), lit(width))
    df.select(group.as("grp"), v.as("v"), bucket.as("bucket"))
      .groupBy("grp", "bucket")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .withColumn("bucket_start", col("bucket") * width)
  }
}
