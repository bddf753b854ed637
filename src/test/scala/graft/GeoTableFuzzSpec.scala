package graft

import graft.GeoFunctions._
import graft.sources.{GeoTable, GeoTableLog}
import org.apache.spark.sql.functions._

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/**
 * Randomized mixed-operation concurrency fuzz for the commit log — the
 * combinatorial closure over the targeted race specs in
 * GeoTableMaintSpec (CAS hammer, staged reads, takeover, inflight
 * reaping). Parity bar: the reference R-tree's WAL tests
 * (`test/sql/index/rtree_persistence_wal.test`, `rtree_crud.test`)
 * assert transactional CRUD with consistent snapshot readers; here the
 * same contract is driven by concurrent workers with scheduler-chosen
 * interleavings:
 *
 *   - 2× appendClustered workers (disjoint id ranges)
 *   - 1× row-CRUD maintenance worker alternating deleteWhere /
 *     compactDeltas (the blessed concurrent-with-append class)
 *   - 1× repairRoot worker (the TOCTOU surface an r15 audit flagged:
 *     its root listing races append move-ins)
 *   - 2× snapshot readers (entries + readVersion of random versions)
 *   - a writer-quiesced vacuum window mid-run with readers still
 *     hammering (vacuum renumbers history; it is documented
 *     mutually-exclusive against WRITERS only — reads stay safe)
 *
 * Invariants asserted: no worker dies on anything but the documented
 * loud-by-design races; after the dust settles every committed version
 * is exactly reconstructible (file sets resolve, reads succeed); the
 * final live row-id set equals initial ∪ appended − deleted exactly;
 * the physical root equals the latest committed file set; no orphan
 * markers or staging dirs survive a final repair.
 */
class GeoTableFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def pts(ids: Seq[Long]) = ids.map(i =>
    (i, (i % 141).toDouble * 0.71, (i % 89).toDouble * 1.12))
    .toDF("id", "x", "y").withColumn("geom", st_point($"x", $"y")).select("id", "geom")

  /** Documented loud-by-design SNAPSHOT-READ races (never row loss): a
   *  version vacuumed between sampling and reading, a file mid-retire
   *  (readVersion's resolve raced a delete's move — the next loop
   *  iteration re-resolves and succeeds), an empty-log instant. These
   *  are allowed ONLY for the reader workers; a writer hitting any of
   *  them is a failure. */
  private def allowedReadRace(t: Throwable): Boolean = {
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    chain(t).exists { c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
      c.isInstanceOf[java.nio.file.NoSuchFileException] ||
      Option(c.getMessage).exists(m =>
        m.contains("FileNotFoundException") || m.contains("not in log") ||
        m.contains("references vacuumed") || m.contains("no commit log") ||
        m.contains("has no data files") || m.contains("Path does not exist") ||
        m.contains("File does not exist"))
    }
  }

  test("fuzz: concurrent append/delete/compact/repair/read + vacuum window stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("geofuzz").toString + "/t"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0L until 1000L), "geom", dir, extent, numFiles = 2)
    GeoTableLog.enable(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)

    val nextId = new AtomicLong(1000L)
    val appended = new ConcurrentLinkedQueue[(Long, Long)]()  // all successful appends
    val deletable = new ConcurrentLinkedQueue[(Long, Long)]() // popped once by the CRUD worker
    val deleted = new ConcurrentLinkedQueue[Long]()
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val reads = new AtomicLong(0)
    val stop = new AtomicBoolean(false)
    val writersIdle = new CountDownLatch(4) // 2 appenders + CRUD + repair

    def tagged(name: String)(body: => Unit): Unit =
      try body catch {
        case t: Throwable => errors.add(new RuntimeException(s"[$name] $t", t))
      }

    def appendWorker(name: String): Unit = {
      tagged(name) {
        while (!stop.get()) {
          val lo = nextId.getAndAdd(400L)
          GeoTable.appendClustered(pts(lo until lo + 400L), "geom", dir, extent, numFiles = 1)
          appended.add((lo, lo + 400L))
          deletable.add((lo, lo + 400L))
        }
      }
      writersIdle.countDown()
    }

    def crudWorker(): Unit = {
      tagged("crud") {
        var flip = false
        while (!stop.get()) {
          if (flip) {
            GeoTable.compactDeltas(spark, "geom", dir, extent)
          } else {
            val r = deletable.poll()
            if (r == null) Thread.sleep(30)
            else {
              val (lo, hi) = r
              val expect = (lo until hi).filter(_ % 5 == 3)
              val n = GeoTable.deleteWhere(spark, "geom", dir,
                $"id" >= lo && $"id" < hi && $"id" % 5 === 3L)
              assert(n == expect.size, s"delete [$lo,$hi) removed $n, expected ${expect.size}")
              expect.foreach(deleted.add)
            }
          }
          flip = !flip
        }
      }
      writersIdle.countDown()
    }

    def repairWorker(): Unit = {
      tagged("repair") {
        while (!stop.get()) { GeoTable.repair(spark, dir); Thread.sleep(40) }
      }
      writersIdle.countDown()
    }

    def readerWorker(seed: Int, until: AtomicBoolean): Runnable = () => {
      val rnd = new scala.util.Random(seed)
      tagged(s"reader-$seed") {
        while (!until.get()) {
          try {
            val es = GeoTableLog.entries(fs, dir)
            if (es.nonEmpty) {
              val v = es(rnd.nextInt(es.size))._1
              val c = GeoTableLog.readVersion(spark, dir, v).count()
              assert(c > 0, s"version $v read as empty")
              reads.incrementAndGet()
            }
          } catch { case t: Throwable if allowedReadRace(t) => () } // retry next loop
        }
      }
    }

    val pool = Executors.newFixedThreadPool(7)
    val readersStop = new AtomicBoolean(false)
    pool.submit(readerWorker(1, readersStop))
    pool.submit(readerWorker(2, readersStop))
    pool.submit(new Runnable { def run(): Unit = appendWorker("append-1") })
    pool.submit(new Runnable { def run(): Unit = appendWorker("append-2") })
    pool.submit(new Runnable { def run(): Unit = crudWorker() })
    pool.submit(new Runnable { def run(): Unit = repairWorker() })

    def mixedPhase(ms: Long): Unit = { Thread.sleep(ms) }

    // phase A: everything concurrent
    mixedPhase(9000)
    // quiesce writers for the vacuum window (vacuum is documented
    // mutually-exclusive against writers; snapshot READS stay safe)
    stop.set(true)
    assert(writersIdle.await(120, TimeUnit.SECONDS), "writers failed to quiesce")
    if (errors.isEmpty) {
      val es = GeoTableLog.entries(fs, dir)
      if (es.size > 3) {
        val keepFrom = es(es.size / 2)._1
        GeoTableLog.vacuum(spark, dir, keepFrom) // readers still hammering
      }
    }
    // phase B: restart writers, fuzz again over the vacuumed log
    stop.set(false)
    val writersIdle2 = new CountDownLatch(4)
    def withLatch(body: () => Unit): Runnable = () => {
      try body() finally writersIdle2.countDown()
    }
    // (re-submit fresh workers; the first generation counted down writersIdle)
    pool.submit(withLatch(() => tagged("append-B") {
      while (!stop.get()) {
        val lo = nextId.getAndAdd(400L)
        GeoTable.appendClustered(pts(lo until lo + 400L), "geom", dir, extent, numFiles = 1)
        appended.add((lo, lo + 400L)); deletable.add((lo, lo + 400L))
      }
    }))
    pool.submit(withLatch(() => tagged("crud-B") {
      var flip = true
      while (!stop.get()) {
        if (flip) GeoTable.compactDeltas(spark, "geom", dir, extent)
        else {
          val r = deletable.poll()
          if (r == null) Thread.sleep(30)
          else {
            val (lo, hi) = r
            val expect = (lo until hi).filter(_ % 5 == 3)
            val n = GeoTable.deleteWhere(spark, "geom", dir,
              $"id" >= lo && $"id" < hi && $"id" % 5 === 3L)
            assert(n == expect.size, s"delete [$lo,$hi) removed $n, expected ${expect.size}")
            expect.foreach(deleted.add)
          }
        }
        flip = !flip
      }
    }))
    pool.submit(withLatch(() => tagged("repair-B") {
      while (!stop.get()) { GeoTable.repair(spark, dir); Thread.sleep(40) }
    }))
    writersIdle2.countDown() // only 3 fresh writers in phase B
    mixedPhase(9000)
    stop.set(true)
    assert(writersIdle2.await(120, TimeUnit.SECONDS), "phase-B writers failed to quiesce")
    readersStop.set(true)
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))

    if (!errors.isEmpty) {
      import scala.jdk.CollectionConverters._
      val heads = errors.asScala.map(_.getMessage.linesIterator.next()).mkString("\n  ")
      val sw = new java.io.StringWriter()
      errors.peek().printStackTrace(new java.io.PrintWriter(sw))
      fail(s"worker failures (${errors.size}):\n  $heads\nfirst stack:\n$sw")
    }
    assert(reads.get() > 0, "readers never completed a snapshot read")
    assert(!appended.isEmpty, "no append ever committed — fuzz exercised nothing")
    assert(deleted.size > 0, "no delete ever committed — fuzz exercised nothing")

    // settle: one final repair, then exactness
    GeoTable.repair(spark, dir)
    val es = GeoTableLog.entries(fs, dir)
    assert(es.map(_._1) == es.indices.map(identity), s"non-contiguous versions: ${es.map(_._1)}")
    // every committed version remains exactly reconstructible
    es.foreach { case (v, _, _, _) =>
      assert(GeoTableLog.readVersion(spark, dir, v).count() > 0, s"version $v lost rows")
    }
    // physical root == latest committed file set
    val live = GeoTableLog.fileSetAt(fs, dir, es.last._1).toSet
    val root = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getName).toSet
    assert(live == root, s"root drifted from log: live-only=${live -- root} root-only=${root -- live}")
    // the final content is exact: initial ∪ appended − deleted
    import scala.jdk.CollectionConverters._
    val expectIds = (0L until 1000L).toSet ++
      appended.asScala.flatMap { case (lo, hi) => lo until hi } --
      deleted.asScala
    spark.catalog.refreshByPath(dir)
    val gotIds = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(gotIds == expectIds,
      s"row drift: missing=${(expectIds -- gotIds).take(5)} extra=${(gotIds -- expectIds).take(5)} " +
        s"(missing ${(expectIds -- gotIds).size}, extra ${(gotIds -- expectIds).size})")
    // no orphan markers or staging dirs
    val infl = new java.io.File(dir, "_graft_log/inflight")
    assert(!infl.exists() || infl.listFiles().isEmpty, "orphan inflight markers")
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains(".__append-")), "orphan staging dirs")
    assert(!new java.io.File(dir, "_graft_log/rebase.tmp").exists(), "orphan vacuum stage")
  }
}
