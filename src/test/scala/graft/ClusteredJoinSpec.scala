package graft

import graft.GeoFunctions._
import graft.operators.SpatialJoin
import graft.sources.GeoTable
import org.apache.spark.sql.functions._

/**
 * Clustered-layout-aware spatial join (the distributed analog of the
 * reference's index-nested-loop join, rtree_index_plan_scan.cpp:33-246):
 * per-file bbox stats prune each side's file list before the grid
 * shuffle. Asserts the PLAN-SHAPE facts (pruned file counts, scan
 * reading only kept files) and exact result equality with the plain
 * grid join on the same data.
 */
class ClusteredJoinSpec extends SparkSpec {
  import spark.implicits._

  private def writePts(dir: String, ids: Range, xMod: Int, yMod: Int,
      extent: (Double, Double, Double, Double), files: Int): Unit = {
    val df = ids.map(i => (i.toLong, (i % xMod).toDouble, ((i * 7) % yMod).toDouble))
      .toDF("id", "x", "y").withColumn("geom", st_point($"x", $"y")).select("id", "geom")
    GeoTable.writeClustered(df, "geom", dir, extent, numFiles = files)
  }

  test("pruneFileLists: grid-bucketed overlap, blind files disable pruning safely") {
    def b(x0: Double, y0: Double, x1: Double, y1: Double) = Some((x0, y0, x1, y1))
    val left = Seq("l0" -> b(0, 0, 10, 10), "l1" -> b(40, 40, 50, 50))
    val right = Seq("r0" -> b(5, 5, 8, 8), "r1" -> b(100, 100, 110, 110),
      "r2" -> b(45, 45, 46, 46))
    val (kl, kr) = SpatialJoin.pruneFileLists(left, right, pad = 0.0)
    assert(kl == Seq("l0", "l1"))
    assert(kr == Seq("r0", "r2"), s"r1 is disjoint from every left extent: $kr")
    // pad pulls a nearby file back in (the dwithin case)
    val (_, krPad) = SpatialJoin.pruneFileLists(
      Seq("l0" -> b(0, 0, 10, 10)), Seq("r" -> b(12, 0, 14, 10)), pad = 3.0)
    assert(krPad == Seq("r"))
    // a stats-less file is kept itself AND disables pruning of the
    // other side (unknown extent overlaps everything)
    val (kl2, kr2) = SpatialJoin.pruneFileLists(
      left, Seq("r0" -> b(5, 5, 8, 8), "rBlind" -> None), pad = 0.0)
    assert(kr2.contains("rBlind") && kl2 == left.map(_._1))
    // disjoint everything -> one side empties
    val (kl3, _) = SpatialJoin.pruneFileLists(
      Seq("l" -> b(0, 0, 1, 1)), Seq("r" -> b(500, 500, 501, 501)), pad = 0.0)
    assert(kl3.isEmpty)
  }

  test("joinClustered prunes right files to the overlap region and matches the plain join") {
    val tmp = java.nio.file.Files.createTempDirectory("cljoin").toString
    val lDir = s"$tmp/zones"
    val rDir = s"$tmp/points"
    // left: a SMALL region [0,12]x[0,12]; right: points over [0,100]^2.
    // Hilbert clustering gives the right table tight per-file extents,
    // so most right files cannot intersect the left region.
    writePts(lDir, 0 until 2000, 12, 13, (0.0, 0.0, 12.0, 12.0), 2)
    writePts(rDir, 0 until 40000, 100, 101, (0.0, 0.0, 100.0, 100.0), 16)

    // plan-shape fact 1: the footer stats prune right files hard
    val lStats = graft.sources.GeoParquetMeta.tableStats(lDir, "geom")
      .map { case (n, _, _, _, b) => n -> b }
    val rStats = graft.sources.GeoParquetMeta.tableStats(rDir, "geom")
      .map { case (n, _, _, _, b) => n -> b }
    assert(rStats.size == 16 && rStats.forall(_._2.isDefined))
    val (keptL, keptR) = SpatialJoin.pruneFileLists(lStats, rStats, pad = 2.0)
    assert(keptL.size == 2)
    assert(keptR.size < 16 && keptR.nonEmpty,
      s"expected real right-side pruning, kept ${keptR.size}/16")

    // the clustered join and the plain grid join agree exactly
    val clustered = SpatialJoin.joinClustered(spark, lDir, rDir,
      leftSelect = Seq("id AS zid", "geom AS zgeom"),
      rightSelect = Seq("id AS pid", "geom AS pgeom"),
      leftGeomCol = "geom", rightGeomCol = "geom",
      predicate = "st_dwithin", distance = 2.0, cellSize = 5.0)
    val plain = SpatialJoin.join(
      spark.read.parquet(lDir).select($"id".as("zid"), $"geom".as("zgeom")),
      spark.read.parquet(rDir).select($"id".as("pid"), $"geom".as("pgeom")),
      col("zgeom"), col("pgeom"), "st_dwithin", distance = 2.0, cellSize = 5.0)
    val cRows = clustered.select("zid", "pid").as[(Long, Long)].collect().toSet
    val pRows = plain.select("zid", "pid").as[(Long, Long)].collect().toSet
    assert(cRows == pRows && cRows.nonEmpty,
      s"clustered=${cRows.size} plain=${pRows.size} diff=${(cRows diff pRows).take(3)}")

    // plan-shape fact 2: the clustered scan reads ONLY kept files
    val scanned = SpatialJoin.joinClustered(spark, lDir, rDir,
      leftSelect = Seq("id AS zid", "geom AS zgeom"),
      rightSelect = Seq("id AS pid", "geom AS pgeom"),
      predicate = "st_dwithin", distance = 2.0, cellSize = 5.0)
      .queryExecution.sparkPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    val prunedOut = rStats.map(_._1).filterNot(keptR.contains)
    assert(prunedOut.nonEmpty && prunedOut.forall(n => !scanned.contains(n)),
      "a pruned right file leaked into the physical scan")

    // provably-disjoint extents short-circuit to an empty (but
    // correctly-shaped) result with no shuffle at all
    val far = s"$tmp/far"
    writePts(far, 0 until 1000, 10, 11, (500.0, 500.0, 512.0, 512.0), 2)
    // translate the points into the far extent so footers carry it
    val farDf = spark.read.parquet(rDir).limit(1000)
      .select($"id", st_point(st_x($"geom") + 500.0, st_y($"geom") + 500.0).as("geom"))
    GeoTable.writeClustered(farDf, "geom", far, (500.0, 500.0, 600.0, 600.0), numFiles = 2)
    val empty = SpatialJoin.joinClustered(spark, lDir, far,
      leftSelect = Seq("id AS zid", "geom AS zgeom"),
      rightSelect = Seq("id AS pid", "geom AS pgeom"))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("zid", "zgeom", "pid", "pgeom"))
  }
}
