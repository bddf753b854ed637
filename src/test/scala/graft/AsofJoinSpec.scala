package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: 3 keys, interleaved times
  private lazy val left = (0 until 60)
    .map(i => (i.toLong % 3, (i * 37 + 11) % 100L, i.toLong))
    .toDF("k", "t", "lid")
  private lazy val right = (0 until 25)
    .map(j => (j.toLong % 3, (j * 13 + 4) % 90L, j * 100L, s"p$j"))
    .toDF("k", "rt", "amount", "tag")
    .groupBy("k", "rt").agg(max("amount").as("amount"), max("tag").as("tag"))

  private def brute(strict: Boolean): Set[(Long, Long, Long, Option[Long], Option[Long], Option[String])] = {
    val r = right.as[(Long, Long, Long, String)].collect()
    left.as[(Long, Long, Long)].collect().map { case (k, t, lid) =>
      val cands = r.filter(x => x._1 == k && (if (strict) x._2 < t else x._2 <= t))
      if (cands.isEmpty) (k, t, lid, None, None, None)
      else {
        val m = cands.maxBy(_._2)
        (k, t, lid, Some(m._2), Some(m._3), Some(m._4))
      }
    }.toSet
  }

  private def run(strict: Boolean) =
    AsofJoin.asofJoin(left, right, "k", "t", "rt", strict = strict)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[String])]
      .collect().toSet

  test("asof join == brute force (non-strict, multi-payload, left-join nulls)") {
    val got = brute(strict = false)
    assert(got.exists(_._4.isEmpty), "fixture should have unmatched left rows")
    assert(run(strict = false) == got)
  }

  test("asof join == brute force (strict <)") {
    assert(run(strict = true) == brute(strict = true))
  }

  test("equal-timestamp tie: non-strict matches the same-ts right row, strict skips it") {
    val l = Seq((1L, 10L, 0L)).toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 77L)).toDF("k", "rt", "amount")
    val ns = AsofJoin.asofJoin(l, r, "k", "t", "rt").select("asof_rt", "amount")
      .as[(Option[Long], Option[Long])].head()
    val st = AsofJoin.asofJoin(l, r, "k", "t", "rt", strict = true).select("asof_rt", "amount")
      .as[(Option[Long], Option[Long])].head()
    assert(ns == ((Some(10L), Some(77L))))
    assert(st == ((None, None)))
  }

  test("bucketed asof == flat asof across bucket widths and strict modes") {
    for (w <- Seq(1L, 7L, 64L, 1000000L); strict <- Seq(false, true)) {
      val flat = AsofJoin.asofJoin(left, right, "k", "t", "rt", strict)
        .select("k", "t", "lid", "asof_rt", "amount", "tag")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[String])]
        .collect().toSet
      val bucketed = AsofJoin.asofJoinBucketed(left, right, "k", "t", "rt", w, strict)
        .select("k", "t", "lid", "asof_rt", "amount", "tag")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[String])]
        .collect().toSet
      assert(bucketed == flat, s"bucketWidth=$w strict=$strict: " +
        s"missing=${flat -- bucketed} extra=${bucketed -- flat}")
    }
  }

  test("bucketed asof: carry-in crosses multiple empty buckets") {
    // right state at t=5 only; probes far in later buckets (width 10)
    val l = Seq((1L, 95L, 0L), (1L, 4L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 5L, 42L)).toDF("k", "rt", "amount")
    val out = AsofJoin.asofJoinBucketed(l, r, "k", "t", "rt", bucketWidth = 10L)
      .select("lid", "asof_rt", "amount")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(out(0L) == ((Some(5L), Some(42L))), out.toString) // 9 buckets downstream
    assert(out(1L) == ((None, None)))                        // probe before the state
  }

  test("skew dispatch: fires on a 30%-hot corpus, stays flat on uniform keys") {
    // uniform: 100 keys over 30k combined rows -> no key dominates
    val uniL = spark.range(20000).selectExpr("id % 100 AS k", "id AS t", "id AS lid")
    val uniR = spark.range(10000)
      .selectExpr("id % 100 AS k", "id * 7 % 20000 AS rt", "id AS amount")
      .groupBy("k", "rt").agg(max("amount").as("amount"))
    assert(AsofJoin.asofSkewWidth(uniL, uniR, "k", "t", "rt").isEmpty,
      "uniform keys must not trigger the bucketed dispatch")
    assert(AsofJoin.asofSkewWidth(uniL, uniR, "k", "t", "rt", 1.0).isEmpty,
      "exact probe must agree on the uniform corpus")

    // hot: key 0 owns half the left side (~33% of the combined corpus
    // — decisively above the 20% threshold, so the 1%-sampled probe
    // decides with >5 sigma of margin) -> dispatch fires with a width
    // derived from the ts range
    val hotL = spark.range(20000)
      .selectExpr("CASE WHEN id % 10 < 5 THEN 0L ELSE id % 97 END AS k",
        "id AS t", "id AS lid")
    val w = AsofJoin.asofSkewWidth(hotL, uniR, "k", "t", "rt")
    assert(w.isDefined, "hot key must trigger the bucketed dispatch")
    assert(w.get >= 1L && w.get < 20000L, s"derived width ${w.get} should spread the range")
    assert(AsofJoin.asofSkewWidth(hotL, uniR, "k", "t", "rt", 1.0).isDefined,
      "exact probe must agree on the hot corpus")

    // the auto entry point stays semantics-identical on the hot corpus
    val auto = AsofJoin.asofJoin(hotL, uniR, "k", "t", "rt")
      .selectExpr("sum(hash(k, t, lid, asof_rt, amount))").as[Long].head()
    val flat = AsofJoin.asofJoinFlat(hotL, uniR, "k", "t", "rt")
      .selectExpr("sum(hash(k, t, lid, asof_rt, amount))").as[Long].head()
    assert(auto == flat, "auto-dispatched bucketed result must equal flat")
  }

  test("skew dispatch: non-integral ts always takes the flat path") {
    val l = spark.range(20000).selectExpr("0L AS k", "CAST(id AS DOUBLE) AS t", "id AS lid")
    val r = spark.range(100).selectExpr("0L AS k", "CAST(id AS DOUBLE) AS rt", "id AS amount")
    assert(AsofJoin.asofSkewWidth(l, r, "k", "t", "rt").isEmpty)
  }

  test("plan shape: one exchange over the union, no join node") {
    val df = AsofJoin.asofJoin(left, right.repartition(4), "k", "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    // the union side is partitioned once by key; windows reuse that exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected at most input-repartition + one asof exchange:\n$plan")
  }
}
