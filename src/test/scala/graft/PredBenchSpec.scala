package graft

import org.apache.spark.sql.functions._
import graft.GeoFunctions._

class PredBenchSpec extends SparkSpec {
  import spark.implicits._
  test("probe: anchored contains/covers vs within/intersects timing") {
    val n = 300000
    // dense polygon so per-row re-parse/re-prepare would be expensive
    val ring = (0 until 360).map(d => s"${50 + 40*math.cos(d*math.Pi/180)} ${50 + 40*math.sin(d*math.Pi/180)}").mkString(", ")
    val poly = s"POLYGON (($ring, ${50 + 40} 50.0))"
    val pts = spark.range(n).select(st_point(rand(7)*100, rand(11)*100).as("pt")).cache()
    pts.count()
    def time(c: org.apache.spark.sql.Column): (Long, Double) = {
      val t0 = System.nanoTime; val cnt = pts.filter(c).count(); (cnt, (System.nanoTime-t0)/1e9)
    }
    val polyLit = st_geomfromtext(lit(poly))
    for (_ <- 1 to 2) { // warmup + measure
      val (c1, t1) = time(st_within($"pt", polyLit))          // ANCHOR_R (old fast path)
      val (c2, t2) = time(st_contains(polyLit, $"pt"))        // ANCHOR_L (new)
      val (c3, t3) = time(st_covers(polyLit, $"pt"))          // ANCHOR_L (new)
      val (c4, t4) = time(st_intersects($"pt", polyLit))      // ANCHOR_R
      assert(c1 == c2 && c2 == c3 && c3 == c4, s"counts differ: $c1 $c2 $c3 $c4")
      info(f"within=$t1%.2fs contains=$t2%.2fs covers=$t3%.2fs intersects=$t4%.2fs (n=$n, count=$c1)")
      println(f"PROBE within=$t1%.2fs contains=$t2%.2fs covers=$t3%.2fs intersects=$t4%.2fs count=$c1")
    }
  }
}
