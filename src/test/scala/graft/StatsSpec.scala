package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  // fixture with ties, negatives, skewed group sizes, singleton group
  private lazy val data = (
    (1 to 100).map(i => ("a", (i % 10).toLong)) ++      // heavy ties
    (1 to 7).map(i => ("b", (i * 3 - 12).toLong)) ++    // negatives, n=7
    Seq(("c", 42L))                                     // singleton
  ).toDF("g", "v")

  private def bruteQuantile(vs: Seq[Long], qpm: Int): Long = {
    val sorted = vs.sorted
    val rank = (qpm.toLong * vs.length + 999) / 1000 // ceil(q*n/1000)
    sorted((rank - 1).toInt)
  }

  test("groupQuantilesExact == brute-force rank-ceil order statistic") {
    val qs = Seq(1, 10, 250, 500, 750, 900, 990, 1000)
    val got = Stats.groupQuantilesExact(data, col("g"), col("v"), qs)
      .as[(String, Int, Long)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    val byGroup = data.as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    for ((g, vs) <- byGroup; q <- qs) {
      assert(got((g, q)) == bruteQuantile(vs, q), s"group=$g qpm=$q")
    }
    assert(got.size == byGroup.size * qs.size, "exactly one row per (group, q)")
  }

  test("quantile operator windows DISTINCT values, not raw rows") {
    // 100 rows in group a but only 10 distinct values: the window
    // input (the (grp, v) aggregate) must be value-distinct — the
    // whole point of the histogram formulation at scale
    val plan = Stats.groupQuantilesExact(data, col("g"), col("v"), Seq(500))
      .queryExecution.optimizedPlan.toString
    // the cumsum window must sit ABOVE an aggregate on (grp, v)
    assert(plan.contains("Window"), plan)
    val winIdx = plan.indexOf("Window")
    assert(plan.indexOf("Aggregate", winIdx) >= 0,
      s"expected the window to read an aggregated (grp, v) frame:\n$plan")
  }

  test("groupHistogram tiles uniformly across negative values") {
    val out = Stats.groupHistogram(data.filter(col("g") === "b"), col("g"), col("v"), width = 5L)
      .select("bucket_start", "n", "sum_v")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // b values: -9,-6,-3,0,3,6,9 -> floor buckets: -10,-10,-5,0,0,5,5
    assert(out.toSeq == Seq((-10L, 2L, -15L), (-5L, 1L, -3L), (0L, 2L, 3L), (5L, 2L, 15L)),
      out.mkString(", "))
  }

  test("histogram counts and sums reconcile with the raw frame") {
    val h = Stats.groupHistogram(data, col("g"), col("v"), width = 3L)
    val (n, s) = h.agg(sum("n"), sum("sum_v")).as[(Long, Long)].head()
    val (n0, s0) = data.agg(count(lit(1)), sum("v")).as[(Long, Long)].head()
    assert(n == n0 && s == s0)
  }
}
