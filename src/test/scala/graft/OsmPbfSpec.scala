package graft

import graft.sources.OsmPbf
import org.apache.spark.sql.functions._

/** Verifies the decode of the hand-rolled-encoder fixture (see
 *  OsmFixture — the encoder is independent of the reader's parser). */
class OsmPbfSpec extends SparkSpec {
  import spark.implicits._

  test("osm pbf roundtrip: dense nodes, way, relation") {
    val path = java.nio.file.Files.createTempDirectory("osm").resolve("mini.osm.pbf").toString
    OsmFixture.write(path)
    val df = OsmPbf.read(spark, path)
    assert(df.schema == OsmPbf.schema)
    val byKind = df.groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(byKind == Map("node" -> 3, "way" -> 1, "relation" -> 1), byKind.toString)

    val n102 = df.filter($"id" === 102 && $"kind" === "node").collect()(0)
    assert(math.abs(n102.getDouble(4) - 52.2) < 1e-9, n102.toString) // lat
    assert(math.abs(n102.getDouble(5) - 4.2) < 1e-9)                 // lon
    assert(n102.getMap[String, String](2).get("highway").contains("residential"))

    val way = df.filter($"kind" === "way").collect()(0)
    assert(way.getLong(1) == 7)
    assert(way.getSeq[Long](3) == Seq(101L, 102L, 103L))
    assert(way.getMap[String, String](2).get("name").contains("Main St"))

    val rel = df.filter($"kind" === "relation").collect()(0)
    assert(rel.getLong(1) == 9)
    assert(rel.getSeq[Long](3) == Seq(7L, 101L))
    assert(rel.getSeq[String](6) == Seq("outer", ""))
    assert(rel.getSeq[String](7) == Seq("way", "node"))
  }
}
