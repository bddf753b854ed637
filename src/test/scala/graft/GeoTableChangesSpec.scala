package graft

import graft.GeoFunctions._
import graft.sources.{GeoTable, GeoTableChanges, GeoTableLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch change-data feed over the commit log: every commit op's
 *  row-level changes reconstructed exactly, version ranges sliced,
 *  rebase detected. */
class GeoTableChangesSpec extends SparkSpec {
  import spark.implicits._

  private val ext = (0.0, 0.0, 100.0, 100.0)

  private def rows(ids: Seq[Long]): DataFrame =
    ids.toDF("id").withColumn("grp", col("id") % 10)
      .withColumn("geom", st_point((col("id") % 97).cast("double"),
        ((col("id") * 7) % 89).cast("double")))

  private def mkTable(dir: String, n: Int = 60): DataFrame = {
    val df = rows(0L until n.toLong)
    GeoTable.writeClustered(df, "geom", dir, ext, numFiles = 3)
    GeoTableLog.enable(spark, dir)
    df
  }

  private def changes(dir: String, from: Int, to: Int = -1): Seq[(String, Int, Long, Long)] =
    GeoTableChanges.readChanges(spark, dir, from, to)
      .select(col(GeoTableChanges.ChangeTypeCol), col(GeoTableChanges.CommitVersionCol),
        col("id"), col("grp"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

  test("full history: init inserts, append inserts, delete/update diffs, compact silent") {
    val dir = "/tmp/graft-changes-full"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    mkTable(dir)                                                       // v0 init: 60 inserts
    GeoTable.appendClustered(rows(100L until 110L), "geom", dir, ext,
      numFiles = 1)                                                    // v1 append: 10 inserts
    GeoTable.appendClustered(rows(110L until 120L), "geom", dir, ext,
      numFiles = 1)                                                    // v2 append: 10 inserts
    // compact needs >=2 live deltas to do anything — the two appends
    // above are exactly that (a rewrite would fold them away)
    assert(GeoTable.compactDeltas(spark, "geom", dir, ext, numFiles = 2) == 2) // v3: silent
    GeoTable.deleteWhere(spark, "geom", dir, col("id") % 7 === 2)      // v4 delete
    GeoTable.updateWhere(spark, "geom", dir, col("id") % 5 === 1,
      Map("grp" -> (col("grp") + lit(100))))                           // v5 update

    val got = changes(dir, 0)
    val inserts0 = got.filter(c => c._1 == "insert" && c._2 == 0).map(_._3).sorted
    assert(inserts0 == (0L until 60L), s"v0 inserts wrong: $inserts0")
    val inserts1 = got.filter(c => c._1 == "insert" && c._2 == 1).map(_._3).sorted
    assert(inserts1 == (100L until 110L))
    val inserts2 = got.filter(c => c._1 == "insert" && c._2 == 2).map(_._3).sorted
    assert(inserts2 == (110L until 120L))
    assert(!got.exists(_._2 == 3), "compact must emit no change rows")
    val allIds = (0L until 60L) ++ (100L until 120L)
    val expectedDeleted = allIds.filter(_ % 7 == 2).sorted
    val deleted = got.filter(c => c._1 == "delete" && c._2 == 4).map(_._3).sorted
    assert(deleted == expectedDeleted, s"v4 deletes wrong: $deleted vs $expectedDeleted")
    val survivors = allIds.filterNot(_ % 7 == 2)
    val expectedUpdated = survivors.filter(_ % 5 == 1).sorted
    val pre = got.filter(c => c._1 == "update_preimage" && c._2 == 5)
    val post = got.filter(c => c._1 == "update_postimage" && c._2 == 5)
    assert(pre.map(_._3).sorted == expectedUpdated)
    assert(post.map(_._3).sorted == expectedUpdated)
    pre.foreach { case (_, _, id, grp) => assert(grp == id % 10, s"preimage grp of $id") }
    post.foreach { case (_, _, id, grp) => assert(grp == id % 10 + 100, s"postimage grp of $id") }
    // and the feed replayed onto v0 reproduces the live table
    val replayedLive = survivors.map(i => (i, if (i % 5 == 1) i % 10 + 100 else i % 10))
    val live = spark.read.parquet(dir).select("id", "grp").as[(Long, Long)]
      .collect().toSeq.sorted
    assert(live == replayedLive.sorted)
  }

  test("version-range slices and latest default") {
    val dir = "/tmp/graft-changes-full" // history from the previous test
    val only4 = changes(dir, 4, 4)
    assert(only4.nonEmpty && only4.forall(c => c._1 == "delete" && c._2 == 4))
    val tail5 = changes(dir, 5) // to = latest (5)
    assert(tail5.forall(c => c._2 == 5) &&
      tail5.map(_._1).toSet == Set("update_preimage", "update_postimage"))
    // empty-change range (the compact commit) keeps the CDC shape
    val none = GeoTableChanges.readChanges(spark, dir, 3, 3)
    assert(none.count() == 0)
    assert(none.columns.contains(GeoTableChanges.ChangeTypeCol) &&
      none.columns.contains(GeoTableChanges.CommitVersionCol))
  }

  test("st_table_changes SQL table function matches the Scala API") {
    val dir = "/tmp/graft-changes-full" // history from the first test
    Graft.install(spark)
    val viaSql = spark.sql(
      s"SELECT _change_type, _commit_version, id, grp FROM st_table_changes('$dir', 0)")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(viaSql == changes(dir, 0).sorted && viaSql.nonEmpty)
    val sliced = spark.sql(
      s"SELECT _commit_version FROM st_table_changes('$dir', 4, 4)")
      .collect().map(_.getInt(0)).toSeq
    assert(sliced.nonEmpty && sliced.forall(_ == 4))
  }

  test("st_table_changes timestamp forms: since-rule for from, as-of rule for to") {
    val dir = "/tmp/graft-changes-full" // v0..v5 from the first test
    Graft.install(spark)
    val times = GeoTableLog.entryTimes(spark, dir)
    assert(times.size == 6)
    // from = v4's exact commit instant (>= rule picks v4), to = v5's
    // instant (<= rule picks v5): the delete + update tail
    val fromIso = java.time.Instant.ofEpochMilli(times(4)._2).toString
    val toIso = java.time.Instant.ofEpochMilli(times(5)._2).toString
    val viaTs = spark.sql(
      s"SELECT _change_type, _commit_version, id, grp FROM st_table_changes('$dir', '$fromIso', '$toIso')")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    val viaV = (changes(dir, 4, 4) ++ changes(dir, 5, 5)).sorted
    assert(viaTs == viaV && viaTs.nonEmpty)
    // a from-instant AFTER every commit resolves past the log end and
    // the range check fails loudly (nothing has changed since)
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM st_table_changes('$dir', '${times.last._2 + 60000}')").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("bad change range"))), ex.toString)
  }

  test("a 50-commit history reads as one insert scan, not fifty") {
    val dir = "/tmp/graft-changes-many"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    mkTable(dir, n = 4)                                          // v0
    (1 to 49).foreach { v =>
      GeoTable.appendClustered(rows(Seq(100L + v * 2, 101L + v * 2)),
        "geom", dir, ext, numFiles = 1)
    }
    val feed = GeoTableChanges.readChanges(spark, dir, 0)
    // correctness across the whole history
    val got = feed.select(col("id"), col(GeoTableChanges.CommitVersionCol))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.length == 4 + 98)
    assert(got.filter(_._2 == 0).map(_._1).sorted.toSeq == (0L until 4L))
    (1 to 49).foreach { v =>
      assert(got.filter(_._2 == v).map(_._1).sorted.toSeq ==
        Seq(100L + v * 2, 101L + v * 2), s"version $v rows wrong")
    }
    // plan shape: all 50 insert commits ride ONE parquet scan (plus
    // the broadcast basename->version lookup) — not a 50-branch union
    // sparkPlan, not executedPlan: AQE wraps the latter before
    // execution and collect() would see zero scan nodes
    val scans = feed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1, s"expected 1 parquet scan, got ${scans.length}")
  }

  test("bad ranges and rebased history fail loudly") {
    val dir = "/tmp/graft-changes-rebase"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    mkTable(dir, n = 30)
    GeoTable.deleteWhere(spark, "geom", dir, col("id") === 3)
    GeoTable.deleteWhere(spark, "geom", dir, col("id") === 4)
    intercept[IllegalArgumentException] {
      GeoTableChanges.readChanges(spark, dir, 1, 9) // v9 not committed
    }
    intercept[IllegalArgumentException] {
      GeoTableChanges.readChanges(spark, dir, 2, 1) // inverted
    }
    GeoTableLog.vacuum(spark, dir, keepFrom = 2) // rebases v2 -> fresh v0
    // old version numbers now refer to renumbered history; the feed
    // yields the REBASED log's contents, and asking past its end fails
    assert(GeoTableLog.latestVersion(spark, dir) == 0)
    intercept[IllegalArgumentException] {
      GeoTableChanges.readChanges(spark, dir, 1, 2)
    }
    val rebased = changes(dir, 0)
    assert(rebased.forall(c => c._1 == "insert" && c._2 == 0))
    assert(rebased.map(_._3).sorted == (0L until 30L).filterNot(i => i == 3 || i == 4))
  }
}
