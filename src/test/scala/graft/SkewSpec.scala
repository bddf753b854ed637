package graft

import graft.operators.{Dedup, SpatialJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.functions._

/**
 * The 100x-scale skew story, demonstrated: a hot grid cell / hot LSH
 * band must not stall the shuffle. Two mechanisms carry it:
 *  - AQE's OptimizeSkewedJoin splits the oversized partition across
 *    tasks (thresholds here are scaled down from the cluster defaults
 *    of factor 5 / 256 MB so the same code path trips at test size);
 *  - the LSH bucket cap bounds the quadratic bucket blowup that
 *    partition splitting alone cannot fix (b rows in one bucket emit
 *    b²/2 pairs regardless of how tasks are cut).
 */
class SkewSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // QueryStageExec is a leaf — descend into its materialized plan
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case q: QueryStageExec => collectAll(q.plan)
      case _ => p.children.flatMap(collectAll)
    }
    p +: below
  }

  /** Sum of numSkewedPartitions over an EXECUTED df's adaptive plan. */
  private def skewedPartitions(df: DataFrame): Long = {
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    collectAll(finalPlan).collect { case r: AQEShuffleReadExec => r }
      .flatMap(_.metrics.get("numSkewedPartitions").map(_.value)).sum
  }

  private val skewConf = Seq(
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join path

  test("grid spatial join: a 30% hot cell is AQE-split and counts stay exact") {
    val n = 1000000L
    def points(hot: Boolean) = spark.range(n).select(col("id"),
      GeoFunctions.st_point(
        when(lit(hot) && col("id") % 10 < 3, lit(10.5))
          .otherwise(pmod(hash(col("id") * 2), lit(1000000)).cast("double") / 10000.0),
        when(lit(hot) && col("id") % 10 < 3, lit(10.5))
          .otherwise(pmod(hash(col("id") * 2 + 1), lit(1000000)).cast("double") / 10000.0)).as("pt"))
    // NB: Column `/` is double division — id DIV 5 for the row index
    val zones = spark.range(25).select(col("id").as("zid"),
      GeoFunctions.st_makeenvelope(
        expr("CAST(id % 5 * 20 AS DOUBLE)"), expr("CAST(id DIV 5 * 20 AS DOUBLE)"),
        expr("CAST(id % 5 * 20 + 20 AS DOUBLE)"), expr("CAST(id DIV 5 * 20 + 20 AS DOUBLE)")).as("zone"))
    withConf(skewConf: _*) {
      def run(hot: Boolean): (Map[Long, Long], Long, Double) = {
        val agg = SpatialJoin.join(points(hot), zones, col("pt"), col("zone"),
            "st_within", cellSize = 20.0)
          .groupBy("zid").agg(count("*").as("n"))
        val t0 = System.nanoTime()
        val rows = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        (rows, skewedPartitions(agg), (System.nanoTime() - t0) / 1e9)
      }
      // uniform first: it warms the join's codegen/broadcast path so
      // the hot measurement isn't billed the session's one-time costs
      // (under full-suite parallelism that cold-start noise pushed the
      // hot side over the soft bound — r16 flake)
      val (uniCounts, _, uniT) = run(hot = false)
      val (hotCounts, hotSkew, hotT) = run(hot = true)
      // ground truth by direct arithmetic; open intervals = st_within
      // boundary semantics (the generator can emit exact multiples of 20)
      def direct(hot: Boolean): Map[Long, Long] = points(hot)
        .select(GeoFunctions.st_x(col("pt")).as("x"), GeoFunctions.st_y(col("pt")).as("y"))
        .filter(col("x") % 20.0 =!= 0.0 && col("y") % 20.0 =!= 0.0)
        .groupBy((floor(col("y") / 20) * 5 + floor(col("x") / 20)).as("zid"))
        .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hotCounts == direct(hot = true), "hot-cell join result drifted from ground truth")
      assert(uniCounts == direct(hot = false), "uniform join result drifted from ground truth")
      assert(hotSkew > 0, "AQE did not split the hot-cell partition")
      // soft wall-clock sanity: the split hot case must not stall into a
      // single-straggler profile, which at this shape reads 10-30x the
      // uniform run — the bound is generous because suites share the
      // box (the r16 full-suite run saw a 5x reading from contention
      // alone; the functional signal is the exact counts + hotSkew > 0)
      assert(hotT < uniT * 6.0 + 10.0, f"hot $hotT%.1fs vs uniform $uniT%.1fs")
    }
  }

  test("LSH banding: bucket cap bounds the quadratic hot-band blowup AQE cannot see") {
    // A hot LSH band is a fundamentally different skew than a hot grid
    // cell: the bucket's INPUT rows are few and balanced across
    // partitions (3000 ids in one bucket is ~100 KB), so input-byte-
    // based skew detection (OptimizeSkewedJoin reads map-output sizes)
    // correctly sees nothing — the blowup is the join OUTPUT, b²/2
    // pairs from a b-row bucket, invisible until the task is already
    // running. Partition splitting can't fix quadratic output; dropping
    // the over-full bucket BEFORE the join can, and a true near-dup
    // pair still collides in the other bands-1 bands w.h.p.
    //
    // Synthetic signatures, 8 hashes in 4 bands of 2: 30% of docs share
    // band 0's values but are mutually dissimilar elsewhere; docs
    // 9000/9001 are planted near-dups colliding in EVERY band.
    val n = 10000
    val hot = 3000L
    val sigs = spark.range(n).select(col("id").as("__id"),
      expr(s"""transform(sequence(0, 7), h ->
        CASE WHEN id IN (9000, 9001) THEN CAST(h * 11 AS INT)
             WHEN id < $hot AND h < 2 THEN 7
             ELSE hash(id * 8 + h) END)""").as("__sig"))
    // uncapped: the hot bucket emits hot*(hot-1)/2 ≈ 4.5M pairs — the
    // join completes at test scale but the output is quadratic in the
    // bucket size (at 100 TB a boilerplate-page band would be 10^12+
    // pairs; no partitioning strategy survives that)
    val uncapped = Dedup.minhashCandidatesFromSigs(sigs, numHashes = 8, bands = 4)
    val uncappedN = uncapped.agg(count("*").as("n")).collect()(0).getLong(0)
    assert(uncappedN >= hot * (hot - 1) / 2, s"hot bucket pairs missing: $uncappedN")

    // capped: the over-full bucket is dropped BEFORE the join — the
    // quadratic output never reaches the shuffle; the planted pair
    // survives via its other three bands
    val capped = Dedup.minhashCandidatesFromSigs(sigs, numHashes = 8, bands = 4,
      maxBucketSize = 100)
    val cappedRows = capped.collect()
    assert(cappedRows.length < 3000, s"cap did not bound the blowup: ${cappedRows.length}")
    assert(cappedRows.length.toLong < uncappedN / 1000)
    val planted = cappedRows.find(r => r.getLong(0) == 9000L && r.getLong(1) == 9001L)
    assert(planted.isDefined, "bucket cap lost the planted near-dup pair")
    assert(planted.get.getDouble(2) == 1.0) // identical signatures
  }
}
