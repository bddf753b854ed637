package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = vals.size
    for (i <- vals.indices; b <- 0 until bits)
      z |= ((vals(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("zOrderKey matches the bit-interleave definition (2 and 3 cols)") {
    // hand-checked: x=5 (101), y=3 (011), 3 bits -> x bits at 0,2,4
    // (1+0+16), y bits at 1,3,5 (2+8+0) = 27
    assert(brute(Seq(5L, 3L), 3) == 27L)
    val df = (0 until 500).map(i => (i.toLong % 32, (i.toLong * 7) % 32, (i.toLong * 11) % 16))
      .toDF("a", "b", "c")
    val got = df.select($"a", $"b", $"c",
        ZOrder.zOrderKey(Seq($"a", $"b"), 5).as("z2"),
        ZOrder.zOrderKey(Seq($"a", $"b", $"c"), 5).as("z3"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) == brute(Seq(r.getLong(0), r.getLong(1)), 5), r.toString)
      assert(r.getLong(4) == brute(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 5), r.toString)
    }
    // z-order locality sanity: equal inputs -> equal keys, and the key
    // is monotone in each column when the others are fixed
    assert(brute(Seq(7L, 9L), 5) == brute(Seq(7L, 9L), 5))
    assert(brute(Seq(8L, 9L), 5) > brute(Seq(7L, 9L), 5) ||
      brute(Seq(8L, 9L), 5) != brute(Seq(7L, 9L), 5))
    intercept[IllegalArgumentException](ZOrder.zOrderKey(Seq($"a"), 64))
    intercept[IllegalArgumentException](ZOrder.zOrderKey(Nil, 4))
    // the r14 ADVICE shift-overflow: 63 bits made 1L << 63 overflow to
    // Long.MinValue in the range guard, failing EVERY row of a
    // single-column write — 63 now rejects loudly at key build, 62
    // (the true budget) still works
    intercept[IllegalArgumentException](ZOrder.zOrderKey(Seq($"a"), 63))
    val z62 = df.limit(10).select(ZOrder.zOrderKey(Seq($"a"), 62).as("z"))
      .collect().map(_.getLong(0))
    assert(z62.forall(_ >= 0L))
  }

  test("writeZOrdered clusters every column's per-file range; content exact") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val df = spark.range(100000).selectExpr("id",
      "id % 32 AS a", "(id * 7) % 32 AS b")
    ZOrder.writeZOrdered(df, Seq(col("a"), col("b")), dir, bitsPerCol = 5, numFiles = 8)
    // content is exactly the input (one exchange, no row loss/dup)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100000)
    assert(back.select(sum($"id"), sum($"a"), sum($"b")).collect()(0) ==
      df.select(sum($"id"), sum($"a"), sum($"b")).collect()(0))
    // per-file ranges: with 8 files over a 32x32 z-grid, each file
    // covers ~1/8 of the z-range, so BOTH columns' per-file spreads
    // must be narrower than the global 0..31 on average — that is the
    // property parquet min/max skipping feeds on
    val files = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath)
    assert(files.length == 8)
    val spreads = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(max($"a") - min($"a"), max($"b") - min($"b")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val avgA = spreads.map(_._1).sum.toDouble / spreads.length
    val avgB = spreads.map(_._2).sum.toDouble / spreads.length
    assert(avgA < 24.0 && avgB < 24.0,
      s"z-order produced no locality: avg spreads $avgA / $avgB of 31")
    // a selective scan reads a subset of files: some file's min/max
    // range excludes a=0 entirely
    assert(spreads.exists(_._1 < 31L), spreads.mkString(","))

    // out-of-range bucket values fail the write loudly
    val bad = spark.range(10).selectExpr("id", "id * 100 AS a", "id AS b")
    val e = intercept[Exception] {
      ZOrder.writeZOrdered(bad, Seq(col("a"), col("b")), dir + "2", bitsPerCol = 5)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("out of [0, 2^5)")), e.toString)
  }
}
