package graft

import graft.operators._
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, String)*) = rows.toDF("id", "text")

  test("boilerplate lines removed, unique lines kept in order") {
    val df = mk(
      1L -> "unique alpha one\nSHARED BANNER LINE\nunique alpha two",
      2L -> "unique beta one\nSHARED BANNER LINE\nunique beta two",
      3L -> "unique gamma only")
    val out = Dedup.dedupLines(df, $"id", $"text")
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "unique alpha one\nunique alpha two", 3L, 2L)))
    assert(out(1) == ((2L, "unique beta one\nunique beta two", 3L, 2L)))
    assert(out(2) == ((3L, "unique gamma only", 1L, 1L)))
  }

  test("minDocs: repeats inside ONE doc are not boilerplate") {
    val df = mk(
      1L -> "same line here\nsame line here\nsame line here",
      2L -> "different content")
    val out = Dedup.dedupLines(df, $"id", $"text")
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out(0)._2 == "same line here\nsame line here\nsame line here")
    assert(out(0)._4 == 3L)
  }

  test("minChars guard: short structural lines survive corpus-wide repetition") {
    val df = mk(
      1L -> "doc one body\n---\nmore one",
      2L -> "doc two body\n---\nmore two")
    val out = Dedup.dedupLines(df, $"id", $"text", minChars = 5)
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out(0)._2 == "doc one body\n---\nmore one")
    assert(out(1)._2 == "doc two body\n---\nmore two")
  }

  test("trim-keyed matching: indented copies of a line still count together") {
    val df = mk(
      1L -> "keep me A\n   shared footer text",
      2L -> "keep me B\nshared footer text   ")
    val out = Dedup.dedupLines(df, $"id", $"text")
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out(0)._2 == "keep me A")
    assert(out(1)._2 == "keep me B")
  }

  test("fully-boilerplate document returns empty text, not a dropped row") {
    val df = mk(
      1L -> "shared only line",
      2L -> "shared only line",
      3L -> "an original document")
    val out = Dedup.dedupLines(df, $"id", $"text")
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    assert(out.length == 3)
    assert(out(0) == ((1L, "", 1L, 0L)))
    assert(out(1) == ((2L, "", 1L, 0L)))
    assert(out(2)._2 == "an original document")
  }

  test("broadcastDups plan is exchange-free on the removal join") {
    val df = mk(1L -> "a\nb", 2L -> "c\nb")
    val bcast = Dedup.dedupLines(df, $"id", $"text", minChars = 1, broadcastDups = true)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast anti-join in:\n$plan")
    // and results match the default shuffled shape
    val a = bcast.orderBy("id").collect().toSeq
    val b = Dedup.dedupLines(df, $"id", $"text", minChars = 1)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("closed-form bigram LM scores on a 3-doc corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x y")).toDF("id", "text")
    // minCount=2 prunes everything but "a b" (cnt 3): total=3,
    // seen gram lp=ln(3/3)=0, OOV floor lp=ln(1/3)
    val counts = TextOps.ngramCounts(docs, $"text", n = 2, minCount = 2)
    assert(counts.as[(String, Long)].collect().toSet == Set(("a b", 3L)))
    val got = TextOps.ngramLogProb(docs, $"id", $"text", counts, n = 2)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val floorMicro = math.round(math.log(1.0 / 3.0) * 1e6) // -1098612
    assert(got == Seq(
      (1L, 3L, floorMicro),       // [a b, b a, a b] -> 0 + floor + 0
      (2L, 2L, floorMicro),       // [a b, b c]      -> 0 + floor
      (3L, 1L, floorMicro)))      // [x y]           -> floor
  }

  test("micro-unit sum is aggregation-order-free") {
    val docs = (0L until 400L).map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 5} filler"))
      .toDF("id", "text")
    val counts = TextOps.ngramCounts(docs, $"text", n = 2)
    val a = TextOps.ngramLogProb(docs, $"id", $"text", counts, n = 2)
      .orderBy("id").collect().toSeq
    val b = TextOps.ngramLogProb(docs.repartition(17), $"id", $"text", counts, n = 2)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("short document yields its whole token run as one gram") {
    val docs = Seq((1L, "solo")).toDF("id", "text")
    val grams = docs.select(TextOps.wordNgrams($"text", 2)).as[Seq[String]].collect().head
    assert(grams == Seq("solo"))
  }

  test("broadcastCounts plan has no shuffle on the scoring join") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("id", "text")
    val counts = TextOps.ngramCounts(docs, $"text", n = 2, minCount = 1)
    val plan = TextOps.ngramLogProb(docs, $"id", $"text", counts, n = 2,
      broadcastCounts = true).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}

class DomainOpsSpec extends SparkSpec {
  import spark.implicits._

  test("extractDomain normalizes case, www. and port") {
    val df = Seq(
      "http://WWW.Example.COM/path",
      "https://blog.example.org:8443/x?q=1",
      "http://www.sub.www-site.net",
      "no url here").toDF("u")
    val got = df.select(TextOps.extractDomain($"u")).as[String].collect().toSeq
    assert(got == Seq("example.com", "blog.example.org", "sub.www-site.net", ""))
  }

  test("urlDomains finds every URL, duplicates kept") {
    val got = Seq("see http://a.example.com/1 and https://a.example.com/2 plus http://b.org")
      .toDF("t").select(TextOps.urlDomains($"t")).as[Seq[String]].collect().head
    assert(got == Seq("a.example.com", "a.example.com", "b.org"))
  }

  test("hasBlockedDomain gates on the normalized form") {
    val df = Seq(
      (1L, "go http://WWW.Ads.example.io/x"),
      (2L, "go http://fine.example.net/y"),
      (3L, "plain text")).toDF("id", "t")
    val kept = df.filter(!TextOps.hasBlockedDomain($"t", Seq("ads.example.io")))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }
}
