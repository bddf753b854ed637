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
   * Skew-aware entry point: runs [[asofSkewWidth]] (a 1%-sampled
   * counting pass) and dispatches to [[asofJoinBucketed]] when a
   * single key dominates the corpus — the flat formulation's only
   * scale hazard is one dominating key becoming one giant
   * in-partition sort, which AQE cannot split (it's a window, not a
   * join). Uniform keys take the flat path untouched. The 100 TB
   * safety shouldn't depend on the caller knowing the trade; callers
   * that have already measured can call [[asofJoinFlat]] /
   * [[asofJoinBucketed]] directly and skip the sampling pass.
   *
   * Dispatch only applies when both ts columns are integral (bucketing
   * is exact integer floor division); other orderable types always
   * take the flat path.
   */
  def asofJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, strict: Boolean = false): DataFrame =
    // Streaming frames cannot be probed eagerly (.head() on an unstarted
    // stream throws) — and the bucketed rewrite is batch-only anyway.
    if (left.isStreaming || right.isStreaming)
      asofJoinFlat(left, right, key, leftTs, rightTs, strict)
    else asofSkewWidth(left, right, key, leftTs, rightTs) match {
      case Some(width) => asofJoinBucketed(left, right, key, leftTs, rightTs, width, strict)
      case None        => asofJoinFlat(left, right, key, leftTs, rightTs, strict)
    }

  /** Dominant-key fraction above which [[asofJoin]] switches to the
   *  bucketed formulation. */
  val SkewDominance = 0.2
  /** Below this combined row count the flat sort is trivially fine and
   *  the dispatch never fires. */
  val SkewMinRows = 10000L
  /** Target spread for the hottest key: derived width ≈ ts-range /
   *  this, so one dominating key lands in ~this many window
   *  partitions instead of one. */
  val SkewTargetBuckets = 1024L
  /** Fraction of the corpus the default skew probe reads. A 20%
   *  dominance threshold is decided with wide margin by a 1% sample
   *  (at even 1k sampled rows the binomial noise on a 20% share is
   *  ~±1.3 points), and both dispatch outcomes are CORRECT — only
   *  cost differs near the boundary — so sampling error is benign.
   *  Fixed seed keeps the decision reproducible run-to-run. */
  val SkewSampleFraction = 0.01

  /**
   * The skew decision behind [[asofJoin]]: Some(bucketWidth) when one
   * key holds more than [[SkewDominance]] of the combined rows (and
   * the corpus is big enough to matter), None for the flat path.
   * Cost: one key-histogram aggregate over a [[SkewSampleFraction]]
   * sample of both sides, collapsing to a single driver row — at
   * 100 TB the probe touches ~1% of the bytes instead of re-scanning
   * the corpus (an exact full pass cost ~3× wall on the 10M bench;
   * pass `sampleFraction = 1.0` for the exact decision in specs).
   * Exposed so specs and planners can assert the dispatch without
   * re-deriving it.
   */
  def asofSkewWidth(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): Option[Long] =
    asofSkewWidth(left, right, key, leftTs, rightTs, SkewSampleFraction)

  /** [[asofSkewWidth]] with an explicit probe fraction (1.0 = exact). */
  def asofSkewWidth(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, sampleFraction: Double): Option[Long] = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    if (!integral.contains(left.schema(leftTs).dataType) ||
        !integral.contains(right.schema(rightTs).dataType)) return None
    val unioned = left.select(col(key).as("__k"), col(leftTs).cast("long").as("__t"))
      .unionAll(right.select(col(key).as("__k"), col(rightTs).cast("long").as("__t")))
    val probed =
      if (sampleFraction >= 1.0) unioned
      else unioned.sample(withReplacement = false, sampleFraction, seed = 421L)
    val perKey = probed
      .groupBy("__k")
      .agg(count(lit(1)).as("n"), min("__t").as("t0"), max("__t").as("t1"))
    val r = perKey
      .agg(sum("n").as("tot"), max("n").as("maxn"),
        min("t0").as("t0"), max("t1").as("t1"))
      .head()
    if (r.isNullAt(0)) return None // both sides empty (or sampled to empty)
    // all-null ts columns: min/max are null while counts are not — the
    // flat path's null-ordering semantics are the well-defined ones, so
    // never dispatch to bucketing without a usable ts range
    if (r.isNullAt(2) || r.isNullAt(3)) return None
    val (tot, maxn) = (r.getLong(0), r.getLong(1))
    // scale the size gate back to corpus terms; the dominance ratio is
    // scale-invariant so the sampled maxn/tot stands in directly
    val estTot = (tot / sampleFraction).toLong
    if (estTot < SkewMinRows || maxn.toDouble / tot <= SkewDominance) None
    else {
      // sampled min/max can only shrink the range -> smaller width ->
      // MORE buckets than the exact decision: the safe direction
      val range = math.max(1L, r.getLong(3) - r.getLong(2) + 1L)
      Some(math.max(1L, range / SkewTargetBuckets))
    }
  }

  /**
   * The flat (single-exchange) formulation — optimal whenever no one
   * key dominates.
   *
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
  def asofJoinFlat(
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
    // integral floor division: c - pmod(c, w) is an exact multiple of
    // w, so `div` equals floor; a double `/` would misbucket beyond 2^53
    def bucketOf(c: Column): Column = org.apache.spark.sql.graft.ColumnShim
      .integralDivide(c - pmod(c, lit(bucketWidth)), lit(bucketWidth)).cast("long")

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
    asofJoinFlat(l2, r2, "__bk", leftTs, rightTs, strict)
      .withColumn(key, col(s"__bk.`$key`"))
      .drop("__bk")
  }
}
