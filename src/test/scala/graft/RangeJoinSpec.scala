package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned containment join == brute force (negative points, bin-boundary ends)") {
    // points straddle zero and bin boundaries; intervals of width 0..40
    val pts = (-50 until 150).map(i => (i.toLong * 3 - 7, i.toLong)).toDF("p", "pid")
    val ivs = (0 until 40).map(j =>
      (j.toLong, j.toLong * 11 - 60, j.toLong * 11 - 60 + (j % 5) * 10)).toDF("iid", "s", "e")

    for (w <- Seq(1L, 7L, 16L, 100L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, $"p", $"s", $"e", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val brute = pts.crossJoin(ivs).filter($"p" >= $"s" && $"p" <= $"e")
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(brute.nonEmpty)
      assert(got == brute, s"binWidth=$w mismatch")
    }
  }

  test("inverted intervals (end < start) match nothing; inclusive endpoints match") {
    val pts = Seq((10L, 1L)).toDF("p", "pid")
    val ivs = Seq((1L, 10L, 10L), (2L, 11L, 5L), (3L, 5L, 10L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, $"p", $"s", $"e", binWidth = 4L)
      .select("iid").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("plan shape: hash equi-join on the bin key, no nested-loop join") {
    val pts = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("p", "pid")
    val ivs = (0 until 100).map(j => (j.toLong, j.toLong, j.toLong + 5)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(
        pts.repartition(4), ivs.repartition(4), $"p", $"s", $"e", binWidth = 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not nested-loop:\n$plan")
    assert(plan.contains("Join") && plan.contains("__bin"), plan)
  }
}
