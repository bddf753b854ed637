package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import graft.functions.{CountMinAgg, CountMinEstimate, KmvAgg}

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

  /** Rational HLL bias constant alpha_m as (num, den): the published
   *  exact constants for m=16/32/64 and the 0.7213/(1+1.079/m) closed
   *  form beyond — kept as integer rationals so the estimator is
   *  engine-exact (no float in the pipeline). */
  private[graft] def hllAlpha(m: Int): (Long, Long) = m match {
    case 16 => (673L, 1000L)
    case 32 => (697L, 1000L)
    case 64 => (709L, 1000L)
    case _  => (7213L * 1000L * m, 10000L * (1000L * m + 1079L))
  }

  /**
   * HyperLogLog register table (Flajolet et al. 2007): 2^b registers,
   * register = low b bits of the first md5 word, rank = trailing-zero
   * count of the second md5 word + 1 (capped 33; the engine-portable
   * salted-md5 discipline again). Returns ALL m rows (empty registers
   * at 0) — the mergeable state: max per register commutes with any
   * partitioning, and the shuffle is <= m rows per task regardless of
   * input size.
   */
  def hllRegisters(df: DataFrame, item: Column, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16, s"b in [4,16], got $b")
    val m = 1 << b
    val h1 = conv(substring(md5(item), 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(md5(item), 9, 8), 16, 10).cast("long")
    val rank = when(h2 === 0, lit(33))
      .otherwise(bit_count(h2.bitwiseAND(-h2) - 1) + 1)
    val r = df.select((h1 % m).as("register"), rank.cast("int").as("__rank"))
      .groupBy("register").agg(max("__rank").as("max_rank"))
    df.sparkSession.range(m).select(col("id").as("register"))
      .join(r, Seq("register"), "left")
      .select(col("register"), coalesce(col("max_rank"), lit(0)).as("max_rank"))
  }

  /**
   * HLL cardinality accounting: the m register rows plus the RAW
   * integer-exact estimator in 1e-6 units — est = alpha_m * m^2 *
   * 2^33 * 1e6 / (alphaDen * sum_j 2^(33 - M_j)), every factor an
   * integer (DECIMAL(38,0) intermediate), truncating division on both
   * engines. The small-range linear-counting correction needs ln()
   * (float), so it is NOT applied; n_empty is emitted so callers can.
   * n_exact (a full count-distinct) is certification ballast only.
   */
  def hllAccounting(df: DataFrame, item: Column, b: Int = 6): DataFrame = {
    val m = 1 << b
    val (an, ad) = hllAlpha(m)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val n = sum(expr("shiftleft(1L, 33 - max_rank)")).over(w)
    val nEmpty = sum(when(col("max_rank") === 0, 1L).otherwise(0L)).over(w)
    val est = expr(
      s"CAST(CAST($an AS DECIMAL(38,0)) * ${m.toLong * m} * ${1L << 33} * 1000000" +
      s" DIV ($ad * __n) AS BIGINT)")
    hllRegisters(df, item, b)
      .withColumn("__n", n).withColumn("n_empty", nEmpty)
      .withColumn("est_micro", est)
      .crossJoin(broadcast(df.agg(countDistinct(item).as("n_exact"))))
      .select("register", "max_rank", "n_empty", "est_micro", "n_exact")
  }

  /** KMV hash range: 60 bits (15 md5 hex chars) — positive in BIGINT
   *  on both engines, uniform over [0, 2^60). */
  val KmvRange: Long = 1L << 60

  /** Engine-portable KMV hash: the first 15 hex chars of md5(item) as
   *  a 60-bit non-negative long (the oracle recomputes
   *  `('0x' || substring(md5(w), 1, 15))::BIGINT` identically). */
  def kmvHash(item: Column): Column =
    conv(substring(md5(item), 1, 15), 16, 10).cast("long")

  /**
   * KMV (bottom-k theta sketch) distinct-count accounting: one bounded
   * [[graft.functions.KmvAgg]] pass keeps the k smallest distinct
   * 60-bit hashes; est = (k-1) · 2^60 / h_(k) (the unbiased KMV
   * estimator, Beyer et al. 2007), kept fully integer-exact in 1e-6
   * units — DECIMAL(38,0) product, truncating division, identical on
   * both engines. When fewer than k distinct values exist the sample
   * IS the distinct set and est = n_kept exactly.
   *
   * Returns one row per kept hash: (rank, h, n_kept, est_micro,
   * n_exact) — n_exact (a full count-distinct) is certification
   * ballast only; production flows keep only the sketch pass.
   *
   * Scale shape: narrow map (md5 in codegen) + one bounded aggregate
   * shipping ≤ k longs per task; no distinct-key shuffle. The kept
   * hash sample additionally supports set-operation estimates
   * (union/intersection over merged bottom-k sets) downstream.
   */
  def kmvAccounting(df: DataFrame, item: Column, k: Int = 256): DataFrame = {
    val agg = ColumnShim.column(
      KmvAgg(ColumnShim.expr(kmvHash(item)), k).toAggregateExpression())
    val est = expr(
      s"CAST(CASE WHEN size(__ks) < $k THEN size(__ks) * 1000000L" +
      s" ELSE CAST(CAST(${k - 1} AS DECIMAL(38,0)) * $KmvRange * 1000000" +
      s" DIV element_at(__ks, -1) AS BIGINT) END AS BIGINT)")
    df.select(agg.as("__ks"))
      .select(col("__ks"), est.as("est_micro"),
        size(col("__ks")).cast("long").as("n_kept"))
      .select(posexplode(col("__ks")).as(Seq("__p", "h")),
        col("n_kept"), col("est_micro"))
      .select((col("__p") + 1).cast("long").as("rank"), col("h"),
        col("n_kept"), col("est_micro"))
      .crossJoin(broadcast(df.agg(countDistinct(item).as("n_exact"))))
  }
}
