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

  test("deleteWhere rewrites ONLY the files holding matches; others keep identical bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-del").toString + "/t"
    GeoTable.writeClustered(pts(0 until 8000), "geom", dir, (0.0, 0.0, 100.0, 100.0),
      numFiles = 6)
    def fileSig(d: String): Map[String, (Long, Long)] =
      Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val before = fileSig(dir)
    // a spatially tight predicate: matches land in few Hilbert files
    val pred = st_xmin($"geom") < 3.0 && $"id" % 2 === 0L
    val expectDel = spark.read.parquet(dir).filter(pred).count()
    val n = GeoTable.deleteWhere(spark, "geom", dir, pred)
    assert(n == expectDel && n > 0, s"deleted $n expected $expectDel")
    val afterSig = fileSig(dir)
    // untouched files: same name, same bytes, same mtime
    val untouched = before.keySet.intersect(afterSig.keySet)
    assert(untouched.nonEmpty, "a tight delete must leave some files untouched")
    untouched.foreach(k => assert(before(k) == afterSig(k), s"$k was rewritten"))
    assert(before.keySet != afterSig.keySet, "hit files must be replaced")
    // surviving rows are exactly the complement
    val back = spark.read.parquet(dir)
    assert(back.count() == 8000 - n)
    assert(back.filter(pred).count() == 0)
    // NULL-predicate rows are KEPT (SQL DELETE semantics)
    val nullPred = when($"id" < 4000L, lit(null).cast("boolean")).otherwise($"id" % 3 === 0L)
    val n2 = GeoTable.deleteWhere(spark, "geom", dir, nullPred)
    val back2 = spark.read.parquet(dir)
    assert(back2.filter($"id" < 4000L).count() > 0, "NULL-predicate rows must survive")
    assert(back2.count() == 8000 - n - n2)
    // geo footer metadata still present on the rewritten generation
    assert(GeoParquetMeta.readGeoMetadata(dir).isDefined)

    // UPDATE through the same surgical core: move matching points and
    // keep the skipping sidecar consistent
    val updPred = $"id" % 1000L === 7L
    val updExpect = back2.filter(updPred).count()
    val cntBefore = back2.count() // materialize BEFORE the file swap
    val n3 = GeoTable.updateWhere(spark, "geom", dir, updPred,
      Map("geom" -> st_point(lit(99.0), lit(99.0))))
    assert(n3 == updExpect && n3 > 0, s"updated $n3 expected $updExpect")
    val back3 = spark.read.parquet(dir)
    assert(back3.count() == cntBefore, "update must not change cardinality")
    val moved = back3.filter(updPred)
      .select(st_x($"geom"), st_y($"geom"), $"geom_bbox.xmin", $"geom_bbox.ymax")
      .collect()
    assert(moved.length == n3)
    moved.foreach { r =>
      assert(r.getDouble(0) == 99.0 && r.getDouble(1) == 99.0, r.toString)
      assert(r.getDouble(2) == 99.0 && r.getDouble(3) == 99.0, "bbox sidecar must follow the geometry")
    }
    assert(back3.filter(!updPred && st_x($"geom") === 99.0 && st_y($"geom") === 99.0).count() == 0)
    // pruning still works after surgical rewrites (fresh read — the
    // pre-update frames point at swapped-out files)
    val env = st_makeenvelope(lit(50.0), lit(50.0), lit(70.0), lit(70.0))
    val rows3 = back3.collect()
    assert(rows3.length == 8000 - n - n2)
    assert(back3.filter(st_within($"geom", env)).count() ==
      rows3.count { r =>
        val g = graft.functions.Jts.read(r.getAs[Array[Byte]]("geom"))
        val c = g.getCoordinate
        c.x > 50 && c.x < 70 && c.y > 50 && c.y < 70
      })

    // SQL UPDATE semantics regression: the WHERE and every SET value
    // read the PRE-update row. A geometry-moving SET whose predicate
    // depends on the geometry must still apply the OTHER set columns
    // and the bbox sidecar (a naive per-column when(pred, v) flips the
    // predicate false after the geom column is rewritten).
    val selfPred = st_x($"geom") === 99.0 && st_y($"geom") === 99.0
    val expectSelf = spark.read.parquet(dir).filter(selfPred).count()
    assert(expectSelf > 0, "precondition: some rows sit at (99,99)")
    val n4 = GeoTable.updateWhere(spark, "geom", dir, selfPred,
      Map("geom" -> st_point(st_x($"geom") + lit(100.0), st_y($"geom")),
          "id" -> ($"id" + lit(1000000L))))
    assert(n4 == expectSelf, s"updated $n4 expected $expectSelf")
    val back4 = spark.read.parquet(dir)
    val movedSelf = back4.filter($"id" >= 1000000L)
      .select(st_x($"geom"), $"geom_bbox.xmin").collect()
    assert(movedSelf.length == n4,
      "every matched row must get BOTH set columns (pre-update WHERE)")
    movedSelf.foreach { r =>
      assert(r.getDouble(0) == 199.0, s"geom must move: $r")
      assert(r.getDouble(1) == 199.0, s"bbox sidecar must follow: $r")
    }
    assert(back4.filter(selfPred).count() == 0, "no row left at (99,99)")
  }

  test("commit log: snapshot reads survive delete/update/append; recluster checkpoints") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 6000), "geom", dir, extent, numFiles = 4)
    GeoTableLog.enable(spark, dir)
    assert(GeoTableLog.latestVersion(spark, dir) == 0)
    val v0Rows = spark.read.parquet(dir).select("id").as[Long].collect().toSet

    // v1: delete — v0 stays readable, current read shrinks
    val ndel = GeoTable.deleteWhere(spark, "geom", dir, $"id" % 10 === 3L)
    assert(ndel == 600)
    assert(GeoTableLog.latestVersion(spark, dir) == 1)
    assert(GeoTableLog.readVersion(spark, dir, 0)
      .select("id").as[Long].collect().toSet == v0Rows, "v0 snapshot drifted")
    val v1Rows = GeoTableLog.readVersion(spark, dir, 1).select("id").as[Long].collect().toSet
    assert(v1Rows == v0Rows.filterNot(_ % 10 == 3))
    assert(spark.read.parquet(dir).count() == 5400)

    // v2: update — both prior versions still byte-stable
    val nupd = GeoTable.updateWhere(spark, "geom", dir,
      $"id" < 100L, Map("id" -> ($"id" + 1000000L)))
    assert(GeoTableLog.latestVersion(spark, dir) == 2)
    assert(GeoTableLog.readVersion(spark, dir, 0)
      .select("id").as[Long].collect().toSet == v0Rows)
    assert(GeoTableLog.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().toSet == v1Rows)
    val v2Rows = GeoTableLog.readVersion(spark, dir, 2).select("id").as[Long].collect().toSet
    assert(v2Rows == v1Rows.map(i => if (i < 100) i + 1000000L else i))
    assert(v2Rows == spark.read.parquet(dir).select("id").as[Long].collect().toSet,
      "latest snapshot must equal the live table")
    assert(nupd == v1Rows.count(_ < 100))

    // v3: append — adds only, removes nothing
    GeoTable.appendClustered(pts(90000 until 90500), "geom", dir, extent, numFiles = 1)
    assert(GeoTableLog.latestVersion(spark, dir) == 3)
    assert(GeoTableLog.readVersion(spark, dir, 3).count() == v2Rows.size + 500L)
    assert(GeoTableLog.readVersion(spark, dir, 2)
      .select("id").as[Long].collect().toSet == v2Rows)
    val ops = GeoTableLog.entries(spark, dir).map(_._2)
    assert(ops == Seq("init", "delete", "update", "append"), ops.toString)

    // delta consolidation: two more appends, then compactDeltas must
    // rewrite ONLY the delta tail (base files byte-identical), commit
    // op="compact", and keep every snapshot readable
    GeoTable.appendClustered(pts(91000 until 91300), "geom", dir, extent, numFiles = 1)
    val sigBefore = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val deltaCountBefore = GeoTableLog.entries(spark, dir)
      .filter(_._2 == "append").flatMap(_._3).size
    val preCompact = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    val vPre = GeoTableLog.latestVersion(spark, dir)
    val nCompacted = GeoTable.compactDeltas(spark, "geom", dir, extent, numFiles = 1)
    assert(nCompacted == deltaCountBefore && nCompacted >= 2, s"compacted $nCompacted")
    // live content unchanged; snapshot of the pre-compact version equal
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == preCompact)
    assert(GeoTableLog.readVersion(spark, dir, vPre)
      .select("id").as[Long].collect().toSet == preCompact)
    // non-delta files untouched byte-for-byte
    val sigAfter = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val survivors = sigBefore.keySet.intersect(sigAfter.keySet)
    survivors.foreach(k => assert(sigBefore(k) == sigAfter(k), s"$k rewritten"))
    assert(GeoTableLog.entries(spark, dir).last._2 == "compact")
    // second compact is a no-op (one consolidated delta remains)
    assert(GeoTable.compactDeltas(spark, "geom", dir, extent) == 0)
    // append/compact CYCLE: the previous compact's output re-enters the
    // next consolidation (otherwise every cycle strands one more file)
    GeoTable.appendClustered(pts(92000 until 92100), "geom", dir, extent, numFiles = 1)
    assert(GeoTable.compactDeltas(spark, "geom", dir, extent, numFiles = 1) == 2,
      "prior compact output + new delta must consolidate together")

    // vacuum keepFrom=2: v0/v1 history drops (their exclusive retained
    // files deleted), v2/v3 renumber to v0/v1 and stay byte-identical
    val keepV2 = GeoTableLog.readVersion(spark, dir, 2).select("id").as[Long].collect().toSet
    val keepV3 = GeoTableLog.readVersion(spark, dir, 3).select("id").as[Long].collect().toSet
    val dropped = GeoTableLog.vacuum(spark, dir, keepFrom = 2)
    assert(dropped > 0, "v0/v1-only retained files must be deleted")
    // log rebases: v2 becomes the init; the maintenance tail renumbers
    // onto it unchanged
    assert(GeoTableLog.latestVersion(spark, dir) == 5, "rebased to v0..v5")
    assert(GeoTableLog.readVersion(spark, dir, 0)
      .select("id").as[Long].collect().toSet == keepV2)
    assert(GeoTableLog.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().toSet == keepV3)
    val opsAfter = GeoTableLog.entries(spark, dir).map(_._2)
    assert(opsAfter ==
      Seq("init", "append", "append", "compact", "append", "compact"), opsAfter.toString)
    // vacuum leaves no staged rebase behind
    assert(!new java.io.File(dir, "_graft_log/rebase.tmp").exists())
    // crash recovery: simulate a vacuum that died after dropping the
    // old entries (staging COMPLETE, drop done, DROPPED not yet
    // written) — the next read must self-heal from the staged set
    val logDirF = new java.io.File(dir, "_graft_log")
    val tmpF = new java.io.File(logDirF, "rebase.tmp"); tmpF.mkdirs()
    val jsons = logDirF.listFiles().filter(_.getName.endsWith(".json"))
    jsons.foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(tmpF, f.getName).toPath)
    }
    new java.io.File(tmpF, "COMPLETE").createNewFile()
    jsons.foreach(_.delete())
    assert(GeoTableLog.entries(spark, dir).map(_._2) == opsAfter, "self-heal failed")
    assert(!tmpF.exists(), "staged rebase must be consumed")
    assert(GeoTableLog.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().toSet == keepV3)

    // SQL surface: st_read_version / st_table_versions mirror the API
    Graft.install(spark)
    val sqlV0 = spark.sql(s"SELECT id FROM st_read_version('$dir', 0)")
      .as[Long].collect().toSet
    assert(sqlV0 == GeoTableLog.readVersion(spark, dir, 0)
      .select("id").as[Long].collect().toSet)
    val hist = spark.sql(s"SELECT version, op FROM st_table_versions('$dir') ORDER BY version")
      .as[(Int, String)].collect()
    assert(hist.map(_._2).toSeq ==
      GeoTableLog.entries(spark, dir).map(_._2), hist.mkString(","))

    // recluster = checkpoint: history compacts, current content survives
    val live = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    GeoTable.recluster(spark, "geom", dir, extent, numFiles = 2)
    assert(GeoTableLog.latestVersion(spark, dir) == 0, "recluster must re-init the log")
    assert(GeoTableLog.readVersion(spark, dir, 0)
      .select("id").as[Long].collect().toSet == live)
    intercept[IllegalArgumentException] {
      GeoTableLog.readVersion(spark, dir, 3) // compacted away
    }
  }

  test("vacuum crash phases: partial drop heals, pre-COMPLETE stage rolls back") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog-crash").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 3000), "geom", dir, extent, numFiles = 2)
    GeoTableLog.enable(spark, dir)
    GeoTable.deleteWhere(spark, "geom", dir, $"id" % 10 === 3L) // v1
    GeoTable.deleteWhere(spark, "geom", dir, $"id" % 10 === 4L) // v2
    val ops = GeoTableLog.entries(spark, dir).map(_._2)
    assert(ops == Seq("init", "delete", "delete"))
    val v2Rows = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    val logDirF = new java.io.File(dir, "_graft_log")
    def jsonFiles() = logDirF.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)

    // phase A — no COMPLETE marker (a vacuum died mid-staging OR is
    // staging right now): readers must IGNORE the stage — never delete
    // it (deleting would gut a LIVE vacuum's stage) — and keep reading
    // the intact old log; the next vacuum clears an abandoned stage
    val tmpA = new java.io.File(logDirF, "rebase.tmp"); tmpA.mkdirs()
    java.nio.file.Files.write(new java.io.File(tmpA, "0000000000.json").toPath,
      """{"version":0,"op":"init","add":["bogus.parquet"],"remove":[]}""".getBytes)
    assert(GeoTableLog.entries(spark, dir).map(_._2) == ops, "old log must survive")
    assert(tmpA.exists(), "a reader must not touch a pre-COMPLETE stage")
    assert(new java.io.File(tmpA, "0000000000.json").exists())
    // clear the abandoned stage the way vacuum's preamble does
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(tmpA.getPath), true)

    // phase B — the r13 ADVICE bug: died PARTWAY through the old-entry
    // drop (COMPLETE written, SOME old entries already deleted, some
    // left). The old recovery promoted only at zero remaining JSONs, so
    // this state silently lost the log's leading versions. Now the
    // staged set is authoritative: recovery finishes the drop and
    // promotes a complete rebased log.
    val keepV1 = GeoTableLog.readVersion(spark, dir, 1).select("id").as[Long].collect().toSet
    // stage the rebase vacuum(keepFrom=1) would write: init at v1's
    // file set, then the v2 delete renumbered to v1 (read the log
    // BEFORE creating the stage dir — entries() rolls back a stage
    // without COMPLETE, which is exactly what phase A just verified)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val baseSet = GeoTableLog.fileSetAt(fs, dir, 1)
    val tail = GeoTableLog.entries(spark, dir).filter(_._1 > 1)
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val tmpB = new java.io.File(logDirF, "rebase.tmp"); tmpB.mkdirs()
    java.nio.file.Files.write(new java.io.File(tmpB, "0000000000.json").toPath,
      s"""{"version":0,"op":"init","add":${arr(baseSet)},"remove":[]}""".getBytes)
    tail.zipWithIndex.foreach { case ((_, op, add, remove), i) =>
      java.nio.file.Files.write(new java.io.File(tmpB, f"${i + 1}%010d.json").toPath,
        s"""{"version":${i + 1},"op":"$op","add":${arr(add)},"remove":${arr(remove)}}""".getBytes)
    }
    new java.io.File(tmpB, "COMPLETE").createNewFile()
    val olds = jsonFiles()
    assert(olds.length == 3)
    olds.head.delete() // the partial drop: 1 of 3 old entries gone
    val healed = GeoTableLog.entries(spark, dir)
    assert(healed.map(_._1) == Seq(0, 1), healed.toString)
    assert(healed.map(_._2) == Seq("init", "delete"), healed.toString)
    assert(!tmpB.exists())
    assert(GeoTableLog.readVersion(spark, dir, 0)
      .select("id").as[Long].collect().toSet == keepV1, "rebased init drifted")
    assert(GeoTableLog.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().toSet == v2Rows, "rebased tail drifted")

    // phase C — died MID-PROMOTE (both markers, one staged entry
    // already moved in): recovery keeps the promoted entry and moves
    // the rest
    val tmpC = new java.io.File(logDirF, "rebase.tmp"); tmpC.mkdirs()
    val cur = jsonFiles()
    cur.foreach { f =>
      java.nio.file.Files.copy(f.toPath, new java.io.File(tmpC, f.getName).toPath)
    }
    new java.io.File(tmpC, "COMPLETE").createNewFile()
    cur.foreach(_.delete())
    new java.io.File(tmpC, "DROPPED").createNewFile()
    // simulate one entry already promoted
    java.nio.file.Files.move(new java.io.File(tmpC, "0000000000.json").toPath,
      new java.io.File(logDirF, "0000000000.json").toPath)
    val healedC = GeoTableLog.entries(spark, dir)
    assert(healedC.map(_._2) == Seq("init", "delete"), healedC.toString)
    assert(!tmpC.exists())
    assert(GeoTableLog.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().toSet == v2Rows)
  }

  test("multi-writer commit log: version CAS serializes, conflicts fail loudly") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog-mw").toString + "/t"
    GeoTable.writeClustered(pts(0 until 500), "geom", dir, (0.0, 0.0, 100.0, 100.0),
      numFiles = 1)
    GeoTableLog.enable(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // 4 interleaved committers x 25 appends each: every commit must win
    // a distinct version and no entry may be lost (the CAS is the only
    // coordination — no locks)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futs = (0 until 4).map { w =>
      pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
        def call(): Seq[Int] = (0 until 25).map { i =>
          GeoTableLog.appendEntry(fs, dir, "append",
            add = Seq(f"part-w$w-$i%03d.parquet"), remove = Nil)
        }
      })
    }
    val versions = futs.flatMap(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(versions.size == 100 && versions.toSet.size == 100,
      s"duplicate versions won: ${versions.groupBy(identity).filter(_._2.size > 1).keys}")
    val es = GeoTableLog.entries(spark, dir)
    assert(es.map(_._1) == (0 to 100), "log must be contiguous 0..100")
    val live = GeoTableLog.fileSetAt(fs, dir, 100).toSet
    for (w <- 0 until 4; i <- 0 until 25)
      assert(live.contains(f"part-w$w-$i%03d.parquet"), s"lost commit w$w-$i")

    // optimistic conflict: two committers racing to remove the SAME
    // file — the loser must fail with ConcurrentModificationException,
    // not silently double-remove
    GeoTableLog.appendEntry(fs, dir, "delete", add = Nil,
      remove = Seq("part-w0-000.parquet"))
    intercept[java.util.ConcurrentModificationException] {
      GeoTableLog.appendEntry(fs, dir, "delete", add = Nil,
        remove = Seq("part-w0-000.parquet"))
    }
  }

  test("interrupted-swap repair: committed-unretired files retire, strays drop") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog-repair").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 2000), "geom", dir, extent, numFiles = 2)
    GeoTableLog.enable(spark, dir)
    GeoTable.appendClustered(pts(2000 until 2400), "geom", dir, extent, numFiles = 1)
    GeoTable.appendClustered(pts(2400 until 2800), "geom", dir, extent, numFiles = 1)
    assert(GeoTable.compactDeltas(spark, "geom", dir, extent, numFiles = 1) == 2)
    val want = (0 until 2800).map(_.toLong).toSet
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == want)

    // crash shape 1 — after the compact commit, before the retire pass:
    // a superseded delta is still in the root (plain reads double-count)
    val retainedF = new java.io.File(dir, "_graft_log/retained")
    val aDelta = retainedF.listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(aDelta.toPath, new java.io.File(dir, aDelta.getName).toPath)
    spark.catalog.refreshByPath(dir)
    assert(spark.read.parquet(dir).count() > 2800, "precondition: duplicates visible")
    GeoTable.repair(spark, dir)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == want)
    assert(new java.io.File(retainedF, aDelta.getName).exists(), "must re-retire, not delete")

    // crash shape 2 — after a staging move-in, before its commit: a
    // part file the log has never seen must be dropped (its rows still
    // live in the committed files)
    val stray = new java.io.File(dir, "part-00000-stray-fake.c000.snappy.parquet")
    val donor = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(donor.toPath, stray.toPath)
    spark.catalog.refreshByPath(dir)
    assert(spark.read.parquet(dir).count() > 2800, "precondition: stray rows visible")
    GeoTable.repair(spark, dir)
    assert(!stray.exists(), "uncommitted stray must be deleted")
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == want)

    // the next maintenance op runs the same repair as its preamble —
    // compactDeltas no longer fails on 'live delta missing' states
    java.nio.file.Files.copy(donor.toPath, stray.toPath)
    assert(GeoTable.compactDeltas(spark, "geom", dir, extent) == 0)
    assert(!stray.exists(), "maintenance preamble must repair first")
  }

  test("AS OF timestamp: versionAsOf and the st_read_version string form") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog-asof").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 1000), "geom", dir, extent, numFiles = 2)
    GeoTableLog.enable(spark, dir)
    GeoTable.deleteWhere(spark, "geom", dir, $"id" % 5 === 0L) // v1
    GeoTable.deleteWhere(spark, "geom", dir, $"id" % 5 === 1L) // v2
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val times = GeoTableLog.entryTimes(fs, dir)
    assert(times.map(_._1) == Seq(0, 1, 2))
    assert(times.map(_._2) == times.map(_._2).sorted, "commit times must be non-decreasing")
    // exact boundaries: at each commit instant, that version is current
    times.foreach { case (v, ts) =>
      assert(GeoTableLog.versionAsOf(spark, dir, ts) == v, s"as-of at v$v's own ts")
    }
    assert(GeoTableLog.versionAsOf(spark, dir, times.last._2 + 60000) == 2)
    intercept[IllegalArgumentException] {
      GeoTableLog.versionAsOf(spark, dir, times.head._2 - 60000)
    }
    // SQL surface: a timestamp string after the last commit reads the
    // latest snapshot; a version number still works
    Graft.install(spark)
    val iso = java.time.Instant.ofEpochMilli(times.last._2 + 60000).toString
    val viaTs = spark.sql(s"SELECT id FROM st_read_version('$dir', '$iso')")
      .as[Long].collect().toSet
    assert(viaTs == GeoTableLog.readVersion(spark, dir, 2)
      .select("id").as[Long].collect().toSet)
    val v1viaTs = spark.sql(
      s"SELECT id FROM st_read_version('$dir', '${java.time.Instant.ofEpochMilli(times(1)._2).toString}')")
      .as[Long].collect().toSet
    assert(v1viaTs == GeoTableLog.readVersion(spark, dir, 1)
      .select("id").as[Long].collect().toSet)
    // type-based dispatch (r14 ADVICE): a STRING second arg is always
    // the AS OF form — an epoch-millis string must resolve as a
    // timestamp, never .toInt-saturate into a bogus version lookup
    val viaEpochStr = spark.sql(
      s"SELECT id FROM st_read_version('$dir', '${times.last._2 + 60000}')")
      .as[Long].collect().toSet
    assert(viaEpochStr == viaTs, "epoch-millis string must be AS OF, not a version")
    // a NUMERIC second arg is still a version number
    assert(spark.sql(s"SELECT id FROM st_read_version('$dir', 1)")
      .as[Long].collect().toSet == v1viaTs)
    // parse forms: ISO instant, space-separated UTC, bare date,
    // epoch-millis digits
    assert(GeoTableLog.parseTsMillis("2026-08-16T00:00:00Z") ==
      GeoTableLog.parseTsMillis("2026-08-16 00:00:00"))
    assert(GeoTableLog.parseTsMillis("1755316800000") == 1755316800000L)
    assert(GeoTableLog.parseTsMillis("2026-08-16") ==
      GeoTableLog.parseTsMillis("2026-08-16T00:00:00Z"))
    assert(GeoTableLog.parseTsMillis("2026-08-16 04:30") ==
      GeoTableLog.parseTsMillis("2026-08-16T04:30:00Z"))
    // vacuum PRESERVES commit instants: the rebased v0/v1 carry the
    // original v1/v2 times, so AS OF reads see unrewritten history
    GeoTableLog.vacuum(spark, dir, keepFrom = 1)
    val after = GeoTableLog.entryTimes(fs, dir)
    assert(after.map(_._1) == Seq(0, 1))
    assert(after.map(_._2) == Seq(times(1)._2, times(2)._2),
      s"vacuum rewrote history: $after vs $times")
    assert(GeoTableLog.versionAsOf(spark, dir, times(2)._2) == 1)
  }

  test("live vacuum swap: readers serve the stage; only a stale owner is taken over") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog-live").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 2000), "geom", dir, extent, numFiles = 2)
    GeoTableLog.enable(spark, dir)
    GeoTable.deleteWhere(spark, "geom", dir, $"id" % 10 === 3L) // v1
    GeoTable.deleteWhere(spark, "geom", dir, $"id" % 10 === 4L) // v2
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val logDirF = new java.io.File(dir, "_graft_log")
    def jsonFiles() = logDirF.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)

    // hand-stage the rebase vacuum(keepFrom=1) would write, with a
    // FRESH RECOVERING claim — the state a reader sees while a live
    // vacuum is mid-drop
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val baseSet = GeoTableLog.fileSetAt(fs, dir, 1)
    val tail = GeoTableLog.entries(spark, dir).filter(_._1 > 1)
    val tmp = new java.io.File(logDirF, "rebase.tmp"); tmp.mkdirs()
    java.nio.file.Files.write(new java.io.File(tmp, "RECOVERING").toPath,
      System.currentTimeMillis().toString.getBytes)
    java.nio.file.Files.write(new java.io.File(tmp, "0000000000.json").toPath,
      s"""{"version":0,"op":"init","add":${arr(baseSet)},"remove":[]}""".getBytes)
    tail.zipWithIndex.foreach { case ((_, op, add, remove), i) =>
      java.nio.file.Files.write(new java.io.File(tmp, f"${i + 1}%010d.json").toPath,
        s"""{"version":${i + 1},"op":"$op","add":${arr(add)},"remove":${arr(remove)}}""".getBytes)
    }
    new java.io.File(tmp, "COMPLETE").createNewFile()

    // a reader must read the STAGE (the committed state the swap will
    // publish) and must NOT delete the old entries or the stage — the
    // r14 ADVICE race was exactly a reader's drop loop firing while a
    // live owner raced it to promotion
    val viaReader = GeoTableLog.entries(spark, dir)
    assert(viaReader.map(_._1) == Seq(0, 1), viaReader.toString)
    assert(viaReader.map(_._2) == Seq("init", "delete"), viaReader.toString)
    assert(jsonFiles().length == 3, "reader must not drop old entries under a live owner")
    assert(tmp.exists() && new java.io.File(tmp, "0000000000.json").exists(),
      "reader must not consume a live owner's stage")
    // entryTimes resolves the same source: version numbers match entries()
    assert(GeoTableLog.entryTimes(fs, dir).map(_._1) == Seq(0, 1))

    // owner goes silent past the staleness bound -> the next reader
    // takes over: finishes the drop, promotes, heals the log
    java.nio.file.Files.write(new java.io.File(tmp, "RECOVERING").toPath,
      (System.currentTimeMillis() - GeoTableLog.staleClaimMs - 1000).toString.getBytes)
    val healed = GeoTableLog.entries(spark, dir)
    assert(healed.map(_._1) == Seq(0, 1), healed.toString)
    assert(!tmp.exists(), "stale-owner takeover must complete the swap")
    assert(jsonFiles().length == 2)
  }

  test("in-flight append markers shield move-ins from repairRoot; stale ones reap") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog-inflight").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 1000), "geom", dir, extent, numFiles = 1)
    GeoTableLog.enable(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val want = (0 until 1000).map(_.toLong).toSet

    // simulate an in-flight append: part file moved into the root,
    // marker registered, commit NOT yet written (the r14 ADVICE
    // scenario — a concurrent maintenance op's repairRoot preamble
    // used to reap exactly this file, and the append's later commit
    // would then reference a file that no longer exists)
    val donor = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val moving = new java.io.File(dir, "part-00000-inflight-test.c000.snappy.parquet")
    java.nio.file.Files.copy(donor.toPath, moving.toPath)
    GeoTableLog.writeInflightMarker(fs, dir, "test-append", Seq(moving.getName))
    GeoTable.repair(spark, dir)
    assert(moving.exists(), "repair must not reap a live in-flight append's file")

    // the append commits; its marker is now cleanup debt — the next
    // repair removes the marker and leaves the (now live) file alone
    GeoTableLog.appendEntry(fs, dir, "append", add = Seq(moving.getName), remove = Nil)
    GeoTable.repair(spark, dir)
    assert(moving.exists())
    val marker = new java.io.File(dir, "_graft_log/inflight/test-append")
    assert(!marker.exists(), "committed append's marker must be cleaned up")

    // a STALE marker means the append died mid-flight: its uncommitted
    // file and the marker are both reaped
    val dead = new java.io.File(dir, "part-00000-dead-append.c000.snappy.parquet")
    java.nio.file.Files.copy(donor.toPath, dead.toPath)
    val deadMarker = new java.io.File(dir, "_graft_log/inflight/dead-append")
    GeoTableLog.writeInflightMarker(fs, dir, "dead-append", Seq(dead.getName))
    assert(deadMarker.setLastModified(
      System.currentTimeMillis() - GeoTableLog.staleClaimMs - 1000))
    GeoTable.repair(spark, dir)
    assert(!dead.exists(), "a dead append's uncommitted file must be reaped")
    assert(!deadMarker.exists())
    spark.catalog.refreshByPath(dir)
    // the committed donor copy duplicates rows but not ids — the id SET
    // is unchanged and the dead append's rows are gone
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet == want)
  }

  test("concurrent appends: exact disjoint add sets, no lost or double-attributed files") {
    import graft.sources.GeoTableLog
    val dir = java.nio.file.Files.createTempDirectory("geolog-capp").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0 until 1000), "geom", dir, extent, numFiles = 1)
    GeoTableLog.enable(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // 3 concurrent appends of disjoint row ranges — the r14 ADVICE
    // finding: the old listing-diff add set could attribute one
    // writer's files to another's commit when their windows overlap;
    // the staged-exact capture cannot
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val futs = (0 until 3).map { w =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = GeoTable.appendClustered(
          pts(1000 + w * 500 until 1000 + (w + 1) * 500), "geom", dir, extent, numFiles = 2)
      })
    }
    futs.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val es = GeoTableLog.entries(fs, dir)
    val appendAdds = es.filter(_._2 == "append").map(_._3)
    assert(appendAdds.size == 3)
    val all = appendAdds.flatten
    assert(all.size == all.toSet.size, s"a file was attributed to two commits: $all")
    assert(appendAdds.forall(_.size == 2), appendAdds.toString)
    // the committed file set equals the physical root exactly
    val live = GeoTableLog.fileSetAt(fs, dir, es.last._1).toSet
    val rootFiles = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet
    assert(live == rootFiles, s"live=$live root=$rootFiles")
    // no leftover markers or staging dirs
    val infl = new java.io.File(dir, "_graft_log/inflight")
    assert(!infl.exists() || infl.listFiles().isEmpty)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSet ==
      (0 until 2500).map(_.toLong).toSet)
  }
}
