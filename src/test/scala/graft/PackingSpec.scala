package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (1 to n)
    .map(i => (i.toLong, 1 + (i * 37) % 100)) // token counts 1..100
    .toDF("id", "tok")

  /** Single-threaded reference: sort by (md5("7:"+id), id), cumsum, cut. */
  private def bruteForce(n: Int, budget: Long): Map[Long, (Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def m(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = (1 to n).map(i => (i.toLong, (1 + (i * 37) % 100).toLong))
      .sortBy { case (id, _) => (m(s"7:$id"), id.toString) }
    var acc = 0L
    rows.map { case (id, tok) =>
      val start = acc; acc += tok
      id -> (start / budget, start % budget)
    }.toMap
  }

  test("packSequences equals the global concatenate-and-cut cumsum") {
    val got = Packing.packSequences(docs(500), col("id"), col("tok"), budget = 256L, seed = 7L)
      .select("id", "seq_id", "seq_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == bruteForce(500, 256L))
  }

  test("assignment is content-stable across input partitioning") {
    def run(parts: Int) =
      Packing.packSequences(docs(300).repartition(parts), col("id"), col("tok"),
          budget = 128L, seed = 7L)
        .select("id", "seq_id", "seq_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(13))
  }

  test("offsets stay inside the budget; sequences are dense") {
    val out = Packing.packSequences(docs(400), col("id"), col("tok"), budget = 512L, seed = 7L)
    assert(out.filter(col("seq_offset") < 0 || col("seq_offset") >= 512).count() == 0)
    val seqs = out.select("seq_id").distinct().as[Long].collect().sorted
    assert(seqs.head == 0L && seqs.last == seqs.length - 1) // no gaps
    val total = docs(400).agg(sum(col("tok").cast("long"))).as[Long].collect()(0)
    assert(seqs.length == (total / 512 + (if (total % 512 == 0) 0 else 1)))
  }

  test("no single-partition global window in the plan") {
    val out = Packing.packSequences(docs(200).repartition(8), col("id"), col("tok"),
      budget = 64L, seed = 7L)
    val plan = out.queryExecution.executedPlan.toString
    // the window must be partitioned by __pid, never a global
    // Window with an empty partition spec (single-partition funnel)
    assert(!plan.contains("SinglePartition"))
  }

  test("shuffled is a deterministic total order") {
    val a = Packing.shuffled(docs(100), col("id"), seed = 3L).select("id")
      .as[Long].collect().toSeq
    val b = Packing.shuffled(docs(100).repartition(5), col("id"), seed = 3L)
      .select("id").as[Long].collect().toSeq
    assert(a == b)
    assert(a != (1L to 100L)) // actually shuffled
    assert(a.sorted == (1L to 100L))
  }
}
