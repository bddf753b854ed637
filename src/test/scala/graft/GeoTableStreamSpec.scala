package graft

import graft.GeoFunctions._
import graft.sources.{GeoTable, GeoTableLog}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import scala.collection.mutable

/** The `geotable` streaming source: commit-log versions as exactly-once
 *  micro-batches — appends tail in, compact is silent, rewrites fail
 *  fast (or skip when opted in), checkpoint restart resumes at the
 *  version offset. Restart tests sink via foreachBatch (the memory
 *  sink refuses checkpoint recovery in append mode). */
class GeoTableStreamSpec extends SparkSpec {
  import spark.implicits._

  private val ext = (0.0, 0.0, 100.0, 100.0)

  private def rows(ids: Seq[Long]): DataFrame =
    ids.toDF("id").withColumn("grp", col("id") % 10)
      .withColumn("geom", st_point((col("id") % 97).cast("double"),
        ((col("id") * 7) % 89).cast("double")))

  private def mkTable(dir: String, n: Int): Unit = {
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    GeoTable.writeClustered(rows(0L until n.toLong), "geom", dir, ext, numFiles = 2)
    GeoTableLog.enable(spark, dir)
  }

  /** (id, grp, _commit_version) rows land in `buf`; exactly-once across
   *  restarts is visible as no duplicates in a fresh buffer. */
  private def startBufQuery(dir: String, buf: mutable.Buffer[(Long, Long, Int)],
      checkpoint: String, opts: Map[String, String] = Map.empty) = {
    val reader = spark.readStream.format("geotable").option("path", dir)
      .option("includeCommitVersion", "true")
    opts.foreach { case (k, v) => reader.option(k, v) }
    reader.load()
      .select("id", "grp", "_commit_version")
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val got = batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        buf.synchronized { buf ++= got }
        ()
      }.start()
  }

  test("appends tail in exactly once, with commit versions; compact emits nothing") {
    val dir = "/tmp/graft-stream-table"
    val ckpt = "/tmp/graft-stream-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 40)
    val buf = mutable.Buffer.empty[(Long, Long, Int)]
    val q = startBufQuery(dir, buf, ckpt)
    try {
      q.processAllAvailable()
      val snap = buf.synchronized(buf.toSeq)
      assert(snap.map(_._1).sorted == (0L until 40L), s"init snapshot wrong: $snap")
      assert(snap.forall(_._3 == 0))

      GeoTable.appendClustered(rows(100L until 120L), "geom", dir, ext, numFiles = 1)
      GeoTable.appendClustered(rows(200L until 210L), "geom", dir, ext, numFiles = 1)
      q.processAllAvailable()
      val after = buf.synchronized(buf.toSeq)
      assert(after.size == 70, s"expected 70 rows exactly once, got ${after.size}")
      assert(after.filter(_._3 == 1).map(_._1).sorted == (100L until 120L))
      assert(after.filter(_._3 == 2).map(_._1).sorted == (200L until 210L))

      GeoTable.compactDeltas(spark, "geom", dir, ext, numFiles = 2)
      q.processAllAvailable()
      assert(buf.synchronized(buf.size) == 70, "compact must emit no rows")
    } finally q.stop()
  }

  test("checkpoint restart resumes at the committed version offset") {
    val dir = "/tmp/graft-stream-table" // v0..v3 from the previous test
    val ckpt = "/tmp/graft-stream-ckpt" // consumed through v3 already
    GeoTable.appendClustered(rows(300L until 305L), "geom", dir, ext, numFiles = 1) // v4
    val buf = mutable.Buffer.empty[(Long, Long, Int)]
    val q = startBufQuery(dir, buf, ckpt)
    try {
      q.processAllAvailable()
      // a fresh buffer + the old checkpoint: only versions AFTER the
      // checkpointed offset arrive
      val got = buf.synchronized(buf.toSeq)
      assert(got.map(_._1).sorted == (300L until 305L), s"resume read $got")
      assert(got.forall(_._3 == 4))
    } finally q.stop()
  }

  test("startingVersion latest sees only post-start appends") {
    val dir = "/tmp/graft-stream-latest"
    val ckpt = "/tmp/graft-stream-latest-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 25)
    GeoTable.appendClustered(rows(50L until 60L), "geom", dir, ext, numFiles = 1)
    val reader = spark.readStream.format("geotable").option("path", dir)
      .option("includeCommitVersion", "true").option("startingVersion", "latest")
    val q = reader.load()
      .select("id", "grp", "_commit_version")
      .writeStream.outputMode("append").format("memory").queryName("gt_latest")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gt_latest").count() == 0, "nothing before the stream started")
      GeoTable.appendClustered(rows(70L until 76L), "geom", dir, ext, numFiles = 1)
      q.processAllAvailable()
      val got = spark.table("gt_latest").as[(Long, Long, Int)].collect().toSeq
      assert(got.map(_._1).sorted == (70L until 76L))
    } finally q.stop()
  }

  test("startingTimestamp streams from the first commit at or after the instant") {
    val dir = "/tmp/graft-stream-sts"
    val ckpt = "/tmp/graft-stream-sts-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 10)                                                          // v0
    GeoTable.appendClustered(rows(20L until 25L), "geom", dir, ext, numFiles = 1) // v1
    Thread.sleep(50) // separate v1/v2 commit instants (ms granularity)
    GeoTable.appendClustered(rows(30L until 35L), "geom", dir, ext, numFiles = 1) // v2
    val times = GeoTableLog.entryTimes(spark, dir)
    val iso = java.time.Instant.ofEpochMilli(times(2)._2).toString
    val buf = mutable.Buffer.empty[(Long, Long, Int)]
    val q = startBufQuery(dir, buf, ckpt, Map("startingTimestamp" -> iso))
    try q.processAllAvailable() finally q.stop()
    val got = buf.synchronized(buf.toSeq)
    assert(got.map(_._1).sorted == (30L until 35L), s"since-rule start wrong: $got")
    assert(got.forall(_._3 == 2))
    intercept[IllegalArgumentException] {
      spark.readStream.format("geotable").option("path", dir)
        .option("startingVersion", "1").option("startingTimestamp", iso).load()
    }
  }

  test("delete/update rewrites fail the stream unless skipChangeCommits") {
    val dir = "/tmp/graft-stream-rewrite"
    val ckpt = "/tmp/graft-stream-rw-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 30)
    val buf = mutable.Buffer.empty[(Long, Long, Int)]
    val q = startBufQuery(dir, buf, ckpt)
    try {
      q.processAllAvailable()
      GeoTable.deleteWhere(spark, "geom", dir, col("id") < 5)
      val err = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(err.getMessage.contains("skipChangeCommits") ||
        Option(err.getCause).exists(_.getMessage.contains("skipChangeCommits")),
        s"unexpected failure: ${err.getMessage}")
    } finally q.stop()
    // restart over the SAME checkpoint with the opt-in: the rewrite is
    // skipped and a later append still arrives
    val buf2 = mutable.Buffer.empty[(Long, Long, Int)]
    val q2 = startBufQuery(dir, buf2, ckpt, Map("skipChangeCommits" -> "true"))
    try {
      q2.processAllAvailable()
      GeoTable.appendClustered(rows(500L until 504L), "geom", dir, ext, numFiles = 1)
      q2.processAllAvailable()
      val got = buf2.synchronized(buf2.toSeq)
      assert(got.map(_._1).sorted == (500L until 504L), s"post-skip append lost: $got")
    } finally q2.stop()
  }

  test("readChangeFeed streams change rows: inserts, delete diffs, update images") {
    val dir = "/tmp/graft-stream-cdf"
    val ckpt = "/tmp/graft-stream-cdf-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 30)
    intercept[IllegalArgumentException] {
      spark.readStream.format("geotable").option("path", dir)
        .option("readChangeFeed", "true").option("skipChangeCommits", "true").load()
    }
    val buf = mutable.Buffer.empty[(Long, Long, String, Int)]
    val reader = spark.readStream.format("geotable").option("path", dir)
      .option("readChangeFeed", "true")
    val q = reader.load()
      .select(col("id"), col("grp"), col("_change_type"), col("_commit_version"))
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val got = batch.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
        buf.synchronized { buf ++= got }
        ()
      }.start()
    try {
      q.processAllAvailable()
      val init = buf.synchronized(buf.toSeq)
      assert(init.map(_._1).sorted == (0L until 30L))
      assert(init.forall(c => c._3 == "insert" && c._4 == 0))

      GeoTable.appendClustered(rows(100L until 110L), "geom", dir, ext, numFiles = 1) // v1
      GeoTable.deleteWhere(spark, "geom", dir, col("id") % 7 === 2)                   // v2
      GeoTable.updateWhere(spark, "geom", dir, col("id") % 5 === 1,
        Map("grp" -> (col("grp") + lit(100))))                                        // v3
      q.processAllAvailable()
      val all = buf.synchronized(buf.toSeq)
      assert(all.filter(c => c._3 == "insert" && c._4 == 1).map(_._1).sorted ==
        (100L until 110L))
      val allIds = (0L until 30L) ++ (100L until 110L)
      assert(all.filter(_._3 == "delete").map(_._1).sorted ==
        allIds.filter(_ % 7 == 2).sorted)
      assert(all.filter(_._3 == "delete").forall(_._4 == 2))
      val survivors = allIds.filterNot(_ % 7 == 2)
      val pre = all.filter(_._3 == "update_preimage")
      val post = all.filter(_._3 == "update_postimage")
      assert(pre.map(_._1).sorted == survivors.filter(_ % 5 == 1).sorted)
      assert(post.map(_._1).sorted == survivors.filter(_ % 5 == 1).sorted)
      pre.foreach { case (id, grp, _, v) => assert(grp == id % 10 && v == 3) }
      post.foreach { case (id, grp, _, v) => assert(grp == id % 10 + 100 && v == 3) }
    } finally q.stop()
  }

  test("maxVersionsPerTrigger bounds each micro-batch to one version") {
    val dir = "/tmp/graft-stream-ratelim"
    val ckpt = "/tmp/graft-stream-ratelim-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 10)                                                          // v0
    GeoTable.appendClustered(rows(20L until 25L), "geom", dir, ext, numFiles = 1) // v1
    GeoTable.appendClustered(rows(30L until 35L), "geom", dir, ext, numFiles = 1) // v2
    GeoTable.appendClustered(rows(40L until 45L), "geom", dir, ext, numFiles = 1) // v3
    // per-batch version sets: with the cap, each batch holds ONE version
    val batches = mutable.Buffer.empty[Set[Int]]
    val reader = spark.readStream.format("geotable").option("path", dir)
      .option("includeCommitVersion", "true").option("maxVersionsPerTrigger", "1")
    val q = reader.load()
      .select(col("id"), col("_commit_version"))
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val vs = batch.collect().map(_.getInt(1)).toSet
        batches.synchronized { if (vs.nonEmpty) batches += vs }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.synchronized(batches.toList)
    assert(got == List(Set(0), Set(1), Set(2), Set(3)),
      s"expected one version per micro-batch, got $got")
    intercept[IllegalArgumentException] {
      spark.readStream.format("geotable").option("path", dir)
        .option("maxVersionsPerTrigger", "0").load()
    }
  }

  test("restart under a version cap resumes cleanly past the checkpoint") {
    val dir = "/tmp/graft-stream-ratelim"   // v0..v3 consumed by the previous test
    val ckpt = "/tmp/graft-stream-ratelim-ckpt"
    GeoTable.appendClustered(rows(50L until 55L), "geom", dir, ext, numFiles = 1) // v4
    GeoTable.appendClustered(rows(60L until 65L), "geom", dir, ext, numFiles = 1) // v5
    // fresh source, cold cap base, committed checkpoint at v3: the
    // first capped getOffset may answer BEHIND the checkpoint — that
    // must resolve as an empty batch + resumed capping, not a bogus
    // "history rebased" failure
    val batches = mutable.Buffer.empty[Set[Int]]
    val reader = spark.readStream.format("geotable").option("path", dir)
      .option("includeCommitVersion", "true").option("maxVersionsPerTrigger", "1")
    val q = reader.load()
      .select(col("id"), col("_commit_version"))
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val vs = batch.collect().map(_.getInt(1)).toSet
        batches.synchronized { if (vs.nonEmpty) batches += vs }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.synchronized(batches.toList)
    assert(got == List(Set(4), Set(5)),
      s"expected v4 then v5 one per batch after restart, got $got")
  }

  test("Trigger.AvailableNow catches up in capped batches then stops") {
    val dir = "/tmp/graft-stream-avnow"
    val ckpt = "/tmp/graft-stream-avnow-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 10)                                                          // v0
    GeoTable.appendClustered(rows(20L until 24L), "geom", dir, ext, numFiles = 1) // v1
    GeoTable.appendClustered(rows(30L until 34L), "geom", dir, ext, numFiles = 1) // v2
    GeoTable.appendClustered(rows(40L until 44L), "geom", dir, ext, numFiles = 1) // v3
    // the scheduled-ingest production shape: run until caught up, stop
    val batches = mutable.Buffer.empty[Set[Int]]
    val q = spark.readStream.format("geotable").option("path", dir)
      .option("includeCommitVersion", "true").option("maxVersionsPerTrigger", "2")
      .load()
      .select(col("id"), col("_commit_version"))
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val vs = batch.collect().map(_.getInt(1)).toSet
        batches.synchronized { if (vs.nonEmpty) batches += vs }
        ()
      }.start()
    assert(q.awaitTermination(120000), "AvailableNow query did not stop")
    val got = batches.synchronized(batches.toList)
    assert(got.flatten.toSet == Set(0, 1, 2, 3), s"missed versions: $got")
    assert(got.forall(_.size <= 2), s"cap violated: $got")
    assert(got.size >= 2, s"expected capped multi-batch catch-up, got $got")
  }

  test("a stream started after compact reads retired delta files") {
    val dir = "/tmp/graft-stream-retired"
    val ckpt = "/tmp/graft-stream-retired-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 10)                                                          // v0
    GeoTable.appendClustered(rows(20L until 25L), "geom", dir, ext, numFiles = 1) // v1
    GeoTable.appendClustered(rows(30L until 35L), "geom", dir, ext, numFiles = 1) // v2
    // compact retires v1/v2's delta files to _graft_log/retained/ —
    // a stream replaying from version 0 must resolve them there
    GeoTable.compactDeltas(spark, "geom", dir, ext, numFiles = 1)             // v3
    val buf = mutable.Buffer.empty[(Long, Long, Int)]
    val q = startBufQuery(dir, buf, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = buf.synchronized(buf.toSeq)
    assert(got.map(_._1).sorted == ((0L until 10L) ++ (20L until 25L) ++ (30L until 35L)),
      s"retired-delta replay wrong: $got")
    assert(got.filter(_._3 == 1).map(_._1).sorted == (20L until 25L))
    assert(got.filter(_._3 == 2).map(_._1).sorted == (30L until 35L))
  }

  test("layout-agnostic: a z-ordered non-spatial table tails and diffs identically") {
    val dir = "/tmp/graft-stream-zorder"
    val ckpt = "/tmp/graft-stream-zorder-ckpt"
    Seq(dir, ckpt).foreach(d =>
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(d)))
    def zrows(ids: Seq[Long]) = ids.toDF("id")
      .withColumn("a", (col("id") % 500).cast("long"))
      .withColumn("b", ((col("id") * 7) % 500).cast("long"))
    graft.operators.ZOrder.writeZOrdered(zrows(0L until 30L),
      Seq(col("a"), col("b")), dir, bitsPerCol = 10, numFiles = 2)
    GeoTableLog.enable(spark, dir)                                        // v0
    val buf = mutable.Buffer.empty[(Long, Long, Int)]
    val reader = spark.readStream.format("geotable").option("path", dir)
      .option("includeCommitVersion", "true")
    val q = reader.load()
      .select(col("id"), col("a"), col("_commit_version"))
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val got = batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        buf.synchronized { buf ++= got }
        ()
      }.start()
    try {
      q.processAllAvailable()
      graft.operators.ZOrder.appendZOrdered(zrows(100L until 110L),
        Seq(col("a"), col("b")), dir, bitsPerCol = 10, numFiles = 1)      // v1
      sources.GeoTable.append(zrows(200L until 205L), dir, numFiles = 1)  // v2 plain
      q.processAllAvailable()
    } finally q.stop()
    val got = buf.synchronized(buf.toSeq)
    assert(got.map(_._1).sorted ==
      ((0L until 30L) ++ (100L until 110L) ++ (200L until 205L)))
    assert(got.filter(_._3 == 1).map(_._1).sorted == (100L until 110L))
    assert(got.filter(_._3 == 2).map(_._1).sorted == (200L until 205L))
    // and the batch change feed reads the same non-spatial history
    val feed = graft.sources.GeoTableChanges.readChanges(spark, dir, 1)
      .select(col("id"), col("_commit_version")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(feed.map(_._1).sorted.toSeq == ((100L until 110L) ++ (200L until 205L)))
    // non-spatial row CRUD: the geom-free deleteWhere/updateWhere
    // overloads commit v3/v4, and the CDF feed diffs them exactly
    val ndel = GeoTable.deleteWhere(spark, dir, col("id") % 10 === 1)      // v3
    assert(ndel == 5, s"deleted $ndel") // 1,11,21,101,201
    val nupd = GeoTable.updateWhere(spark, dir, col("id") === 200L,
      Map("a" -> (col("a") + lit(1000L))))                                 // v4
    assert(nupd == 1)
    val crud = graft.sources.GeoTableChanges.readChanges(spark, dir, 3)
      .select(col("_change_type"), col("id"), col("a")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(crud.filter(_._1 == "delete").map(_._2).sorted.toSeq ==
      Seq(1L, 11L, 21L, 101L, 201L))
    assert(crud.filter(_._1 == "update_preimage").toSeq == Seq(("update_preimage", 200L, 200L)))
    assert(crud.filter(_._1 == "update_postimage").toSeq == Seq(("update_postimage", 200L, 1200L)))
    // live table reflects both
    val live = spark.read.parquet(dir).select("id", "a").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!live.contains(1L) && live(200L) == 1200L)
  }

  test("EntryCache reads incrementally and invalidates across a rebase") {
    val dir = "/tmp/graft-stream-ecache"
    mkTable(dir, 10)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cache = new GeoTableLog.EntryCache
    assert(cache.read(fs, dir) == GeoTableLog.entries(fs, dir))
    GeoTable.appendClustered(rows(20L until 25L), "geom", dir, ext, numFiles = 1)
    GeoTable.appendClustered(rows(30L until 35L), "geom", dir, ext, numFiles = 1)
    // incremental read over the two new commits must equal a cold read
    assert(cache.read(fs, dir) == GeoTableLog.entries(fs, dir))
    assert(cache.read(fs, dir).map(_._1) == Seq(0, 1, 2))
    GeoTable.deleteWhere(spark, "geom", dir, col("id") === 3)
    assert(cache.read(fs, dir) == GeoTableLog.entries(fs, dir))
    // vacuum rebases history: slot 0000000000.json is RECREATED with
    // different content — the warm cache must notice (len/mtime key)
    // and serve the rebased log, not the stale one
    GeoTableLog.vacuum(spark, dir, keepFrom = 3)
    assert(cache.read(fs, dir) == GeoTableLog.entries(fs, dir))
    assert(cache.read(fs, dir).map(_._1) == Seq(0))
    assert(cache.read(fs, dir).head._2 == "init")
  }

  test("vacuum rebase under a live checkpoint fails with a re-sync message") {
    val dir = "/tmp/graft-stream-vacuum"
    val ckpt = "/tmp/graft-stream-vac-ckpt"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(ckpt))
    mkTable(dir, 20)
    GeoTable.appendClustered(rows(30L until 35L), "geom", dir, ext, numFiles = 1) // v1
    GeoTable.appendClustered(rows(40L until 45L), "geom", dir, ext, numFiles = 1) // v2
    val buf = mutable.Buffer.empty[(Long, Long, Int)]
    val q = startBufQuery(dir, buf, ckpt)
    try {
      q.processAllAvailable()
      assert(buf.synchronized(buf.size) == 30)
    } finally q.stop()
    GeoTableLog.vacuum(spark, dir, keepFrom = 2) // history rebased: v2 -> v0
    GeoTable.appendClustered(rows(60L until 62L), "geom", dir, ext, numFiles = 1) // new v1
    val buf2 = mutable.Buffer.empty[(Long, Long, Int)]
    val q2 = startBufQuery(dir, buf2, ckpt)
    try {
      val err = intercept[StreamingQueryException] { q2.processAllAvailable() }
      val msgs = Seq(Option(err.getMessage), Option(err.getCause).map(_.getMessage))
        .flatten.mkString(" | ")
      assert(msgs.contains("rebased") || msgs.contains("fresh checkpoint"), msgs)
    } finally q2.stop()
  }
}
