package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for every left row, attach the single right
 * row with the same key and the greatest right timestamp <= (or < in
 * strict mode) the left timestamp. This is the time-series join the
 * reference engine exposes as `ASOF JOIN` (duckdb docs
 * `sql/query_syntax/from` — the trades⋈quotes example) and pandas as
 * `merge_asof`; the result is a LEFT join: unmatched left rows keep
 * null right columns.
 *
 * Spark-first shape: instead of a range join (which explodes into an
 * inequality join Catalyst can only nested-loop) the two sides are
 * tagged and UNIONed, hash-partitioned by key ONCE, sorted in-partition
 * by (ts, side), and the right payload is carried forward with
 * last_value(ignoreNulls) over an unbounded-preceding running frame —
 * the sort-merge formulation of as-of. Cost: one exchange of
 * |L| + |R| rows + an in-partition sort; no row amplification at any
 * point, so it survives 100 TB as long as a single key's rows fit a
 * partition (hot keys: pre-aggregate the right side per (key, ts) —
 * as-of only ever uses the last row per timestamp — and salt the left
 * by time-range if one key dominates).
 *
 * Determinism contract: callers must make (key, rightTs) unique on the
 * right side (aggregate first), otherwise "the" matched row is
 * tie-ambiguous in every engine.
 */
object AsofJoin {

  /**
   * @param left     left (probe/event) frame
   * @param right    right (state/quote) frame; (key, rightTs) must be unique
   * @param key      equi-join key column present on both sides
   * @param leftTs   left ordering column name (any orderable numeric/timestamp)
   * @param rightTs  right ordering column name (same type as leftTs)
   * @param strict   false = match rightTs <= leftTs (ASOF >=);
   *                 true  = match rightTs <  leftTs (ASOF >)
   * @return left columns + rightTs (as `asof_<rightTs>`, null when no
   *         match) + the remaining right payload columns (null when no
   *         match)
   */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = right.columns.toSeq.filterNot(c => c == key || c == rightTs)
    require(!leftCols.contains(s"asof_$rightTs") && payload.forall(!leftCols.contains(_)),
      "right payload column names collide with left columns")
    val reserved = Set("__k", "__t", "__side", "__lrow", "__rrow", "__m")
    require((leftCols ++ right.columns).forall(!reserved.contains(_)),
      s"column names ${reserved.mkString("/")} are reserved by asofJoin")

    // one struct per side so the union stays two columns wide no matter
    // how many payload columns ride along
    import org.apache.spark.sql.types.StructType
    val lStructType = StructType(left.drop(key).schema.fields.map(_.copy(nullable = true)))
    val rStructCols = struct((col(rightTs).as(rightTs) +: payload.map(col)): _*)
    val r2 = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(lStructType).as("__lrow"),
      rStructCols.as("__rrow"))
    val l2 = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.drop(key).columns.map(col): _*).as("__lrow"),
      lit(null).cast(r2.schema("__rrow").dataType).as("__rrow"))

    // sort order decides tie semantics at equal timestamps:
    //   non-strict (>=): right rows sort BEFORE left rows -> visible
    //   strict     (>) : right rows sort AFTER  left rows -> invisible
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy("__k").orderBy(col("__t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l2.unionByName(r2)
      .withColumn("__m", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outLeft = col("__k").as(key) +:
      left.drop(key).columns.toSeq.map(c => col(s"__lrow.`$c`").as(c))
    val outRight = col(s"__m.`$rightTs`").as(s"asof_$rightTs") +:
      payload.map(c => col(s"__m.`$c`").as(c))
    merged.select((outLeft ++ outRight): _*)
  }

  /**
   * Skew-resistant two-level as-of join: identical semantics to
   * [[asofJoin]], but the window partition is (key, timeBucket)
   * instead of key alone — a key owning 30% of all probes spreads
   * across (time range / bucketWidth) partitions instead of one
   * giant in-partition sort (measured 3.2× degradation for the flat
   * operator on a 30%-hot-key 10M-row corpus; PLANS.md).
   *
   * Mechanics: right rows land in their own bucket; each bucket also
   * receives ONE synthetic "carry-in" row — the latest right row from
   * any EARLIER bucket, computed from per-bucket maxima with a
   * running last over the (key × bucket) frame (keys·buckets rows —
   * tiny, bounded by wall-clock range / bucketWidth). The carry keeps
   * its original timestamp, so strict-mode semantics survive
   * unchanged (an earlier-bucket timestamp is strictly below every
   * timestamp in this bucket). Then the flat asof runs per
   * (key, bucket).
   *
   * Same determinism contract as [[asofJoin]]; `leftTs`/`rightTs`
   * must be integral (bucketing is exact integer floor division).
   */
  def asofJoinBucketed(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, bucketWidth: Long,
      strict: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val payload = right.columns.toSeq.filterNot(c => c == key || c == rightTs)
    def bucketOf(c: Column): Column = ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")

    val lb = left.withColumn("__b", bucketOf(col(leftTs)))
    val rb = right.withColumn("__b", bucketOf(col(rightTs)))
    // latest right row per (key, bucket), carried as one struct
    val rStruct = struct((col(rightTs).as(rightTs) +: payload.map(col)): _*)
    val perBucketLast = rb.groupBy(key, "__b")
      .agg(max_by(rStruct, col(rightTs)).as("__last"))
    // bucket universe = every (key, bucket) either side touches, so the
    // carry propagates through right-only buckets into left-only ones
    val univ = lb.select(key, "__b").distinct()
      .unionByName(rb.select(key, "__b").distinct()).distinct()
    val wCarry = Window.partitionBy(key).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryRows = univ.join(perBucketLast, Seq(key, "__b"), "left")
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .filter(col("__carry").isNotNull)
      .select(col(key) +: col("__b") +:
        (col(s"__carry.`$rightTs`").as(rightTs) +:
          payload.map(c => col(s"__carry.`$c`").as(c))): _*)
    val rightAug = rb.select((col(key) +: col("__b") +: col(rightTs).as(rightTs) +:
        payload.map(col)): _*)
      .unionByName(carryRows)
    // flat asof per (key, bucket) via a composite struct key
    val l2 = lb.withColumn("__bk", struct(col(key), col("__b"))).drop(key, "__b")
    val r2 = rightAug.withColumn("__bk", struct(col(key), col("__b"))).drop(key, "__b")
    asofJoin(l2, r2, "__bk", leftTs, rightTs, strict)
      .withColumn(key, col(s"__bk.`$key`"))
      .drop("__bk")
  }
}
