package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over (user, timestamp, type) streams —
 * the conversion-funnel / agent-telemetry counterpart of the document
 * pipeline. Deterministic by construction: step times are integer-ms
 * minima, step populations are counts, so results hash-certify across
 * engines.
 */
object EventOps {

  /**
   * Ordered sequence funnel (first-touch): a user completes step k if
   * an event of `steps(k)` occurs STRICTLY after their step-(k-1) time
   * and within `withinMs` of it; the step time is the earliest such
   * event. Returns (step_idx, step, n_users), one row per step.
   *
   * Scale shape: one narrow event scan feeds k step frames, each a
   * user-keyed equi-join (range predicate rides the join) + min
   * aggregate — users-cardinality frames after the first aggregate,
   * never events-cardinality; the final counts are k tiny aggregates
   * unioned into one plan. No windows, no state store, no driver
   * loop over data — the k-step chain is plan composition only.
   */
  def sequenceFunnel(
      events: DataFrame, user: Column, ts: Column, typ: Column,
      steps: Seq[String], withinMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(withinMs > 0, "withinMs must be positive")
    val e = events.select(user.cast("long").as("u"),
      (ts.cast("long") * 1000).as("t"), typ.as("ty"))
    var cur = e.filter(col("ty") === steps.head)
      .groupBy("u").agg(min("t").as("t"))
    var frames = List(steps.head -> cur)
    steps.tail.foreach { s =>
      val prev = cur.select(col("u").as("pu"), col("t").as("pt"))
      cur = e.filter(col("ty") === s)
        .join(prev, col("u") === col("pu")
          && col("t") > col("pt") && col("t") <= col("pt") + withinMs)
        .groupBy("u").agg(min("t").as("t"))
      frames ::= (s -> cur)
    }
    frames.reverse.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(name).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
  }

  /**
   * Cohort retention: users are cohorted by the period of their first
   * event (absolute period index = event-ms / `periodMs`, so no global
   * scalar is needed); retention(c, k) = how many cohort-c users have
   * ANY event in period c+k, for k in [0, maxPeriods]. Returns
   * (cohort_period, period_offset, n_users); k=0 is the cohort size.
   *
   * Scale shape: one distinct over (user, period) — the only
   * events-cardinality shuffle, with partial aggregation — then
   * user-keyed min + self-join on the users-cardinality frame. All
   * integer arithmetic: hash-certifiable.
   */
  /**
   * Dense time-series resample (gap fill): bucket events into
   * `periodMs` periods per group, then left-join the per-group counts
   * onto the FULL (group × period) grid spanning [min period, max
   * period] so silent periods surface as explicit zero rows — the
   * shape every downstream rolling/anomaly pass needs.
   *
   * Scale shape: one events-cardinality partial-agg groupBy; the grid
   * is (time span / period) × |groups| rows — a function of wall-clock
   * coverage, NOT of data volume — built from a 1-row min/max aggregate
   * with sequence+explode (no driver collect, no literal baked at plan
   * time) and broadcast onto the counts. At 100 TB the grid for a year
   * of hourly periods × 1k groups is still only ~9M rows.
   *
   * @return (group, period_start, n_events, sum_micro) — period_start
   *         in ms, zero-filled gaps, micro-unit sums (hash-exact)
   */
  def resample(
      events: DataFrame, group: Column, ts: Column, valueMicro: Column,
      periodMs: Long): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val e = events.select(group.as("g"),
        (ts.cast("long") * 1000).as("__tms"), valueMicro.cast("long").as("v"))
      .select(col("g"), floorDivMs(col("__tms"), periodMs).as("p"), col("v"))
    val counts = e.groupBy("g", "p")
      .agg(count(lit(1)).as("n_events"), sum("v").as("sum_micro"))
    // the global bounds attach as a ONE-row broadcast (the optimizer
    // folds any constant join key away, so this is necessarily a
    // broadcast nested loop — over exactly one build row, the same
    // intended-broadcast class as ngramLogProb's scalar attach); the
    // per-group grid then comes from a NARROW sequence+explode, so the
    // only row amplification is the explode itself
    val bounds = e.agg(min("p").as("p0"), max("p").as("p1")).withColumn("__k", lit(0))
    val groups = e.select("g").distinct().withColumn("__k", lit(0))
    groups.join(broadcast(bounds), "__k")
      .select(col("g"), explode(sequence(col("p0"), col("p1"))).as("p"))
      .join(counts, Seq("g", "p"), "left")
      .select(col("g").as("group"), (col("p") * periodMs).as("period_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_micro"), lit(0L)).as("sum_micro"))
  }

  /** Exact FLOOR period bucketing: SQL DIV truncates toward zero, so
   *  the period straddling epoch 0 would span two widths for pre-1970
   *  timestamps; pmod + integral div tiles the line uniformly (and
   *  stays integral — no double detour losing ms above 2^53). */
  private def floorDivMs(tms: Column, periodMs: Long): Column =
    org.apache.spark.sql.graft.ColumnShim
      .integralDivide(tms - pmod(tms, lit(periodMs)), lit(periodMs)).cast("long")

  def retentionCohorts(
      events: DataFrame, user: Column, ts: Column,
      periodMs: Long, maxPeriods: Int): DataFrame = {
    require(periodMs > 0 && maxPeriods >= 0, "bad retention params")
    val up = events.select(user.cast("long").as("u"),
        (ts.cast("long") * 1000).as("__tms"))
      .select(col("u"), floorDivMs(col("__tms"), periodMs).as("p"))
      .distinct()
    val firsts = up.groupBy("u").agg(min("p").as("c"))
    up.join(firsts, "u")
      .select(col("c").as("cohort_period"), (col("p") - col("c")).as("period_offset"))
      .filter(col("period_offset") <= maxPeriods)
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
