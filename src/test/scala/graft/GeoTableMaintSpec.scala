package graft

import graft.GeoFunctions._
import graft.sources.{GeoParquetMeta, GeoTable}
import org.apache.spark.sql.functions._

/** Clustered-table maintenance: delta appends keep results exact and
 *  pruning live; recluster compacts back to one optimal generation. */
class GeoTableMaintSpec extends SparkSpec {
  import spark.implicits._

  private def pts(ids: Range) = ids.map(i =>
    (i.toLong, (i % 141).toDouble * 0.71, (i % 89).toDouble * 1.12))
    .toDF("id", "x", "y").withColumn("geom", st_point($"x", $"y")).select("id", "geom")

  private def parquetFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("appendClustered adds delta files; recluster compacts; results stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("geomaint").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 10000), "geom", dir, extent, numFiles = 4)
    val gen0 = parquetFiles(dir)
    assert(gen0 == 4)

    GeoTable.appendClustered(pts(10000 until 12000), "geom", dir, extent, numFiles = 2)
    assert(parquetFiles(dir) == gen0 + 2, "append must create delta files, not rewrite")

    val env = st_makeenvelope(lit(5.0), lit(5.0), lit(20.0), lit(20.0))
    val brute = pts(0 until 12000).filter(st_within($"geom", env)).count()
    val tbl = spark.read.parquet(dir)
    assert(tbl.count() == 12000)
    assert(tbl.filter(st_within($"geom", env)).count() == brute)
    // deltas carry geo footer metadata too
    assert(GeoParquetMeta.readGeoMetadata(dir).isDefined)

    GeoTable.recluster(spark, "geom", dir, extent, numFiles = 4)
    assert(parquetFiles(dir) == 4, "recluster must compact to one generation")
    val after = spark.read.parquet(dir)
    assert(after.count() == 12000)
    assert(after.filter(st_within($"geom", env)).count() == brute)
    assert(GeoParquetMeta.readGeoMetadata(dir).isDefined)
  }
}
