package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import graft.functions.{CountMinAgg, CountMinEstimate}

/**
 * Mergeable sketch family for corpus-scale accounting. First member:
 * the count-min sketch — point-frequency estimation with fixed-size
 * state (see [[graft.functions.CountMinAgg]] for the scale contract).
 *
 * Reference frame: duckdb/duckdb_spatial's host engine ships no sketch
 * surface; this is training-pipeline functionality (heavy-hitter word/
 * domain accounting without a distinct-key shuffle) built Spark-first.
 */
object Sketches {

  val DefaultDepth: Int = 4
  val DefaultWidth: Int = 1024

  /** Build a count-min sketch over every row of `item` (one narrow
   *  pass; the returned matrix is depth·width·8 bytes — MODEL-sized by
   *  construction, safe to hold on the driver and broadcast). */
  def countMin(df: DataFrame, item: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): Array[Byte] = {
    val agg = ColumnShim.column(
      CountMinAgg(ColumnShim.expr(item), depth, width).toAggregateExpression())
    df.select(agg.as("__cms")).head().getAs[Array[Byte]](0)
  }

  /** Point-frequency estimate column against a built sketch. */
  def cmsEstimate(sketch: Array[Byte], item: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): Column =
    ColumnShim.column(CountMinEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        sketch, org.apache.spark.sql.types.BinaryType),
      ColumnShim.expr(item), depth, width))

  /**
   * Exact-vs-estimate accounting for every distinct item: one sketch
   * pass over all occurrences plus one exact group-by (the
   * certification harness; production heavy-hitter flows keep only the
   * sketch pass and probe a candidate set). Returns
   * (item, n_exact, n_est) with n_est >= n_exact always.
   */
  def cmsAccounting(df: DataFrame, item: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame = {
    val sk = countMin(df, item, depth, width)
    df.select(item.as("item")).groupBy("item")
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("n_est", cmsEstimate(sk, col("item"), depth, width))
  }
}
