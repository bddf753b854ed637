package graft

import graft.GeoFunctions._
import graft.sources.{GeoTable, GeoTableLog}
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/**
 * Concurrency fuzz for the STREAMING read path: a `geotable` stream
 * consumes (with skipChangeCommits) while appendClustered /
 * deleteWhere / compactDeltas / repairRoot workers hammer the same
 * table — the surface GeoTableFuzzSpec leaves uncovered (its readers
 * are snapshot reads; the stream adds offset tracking, checkpoint
 * recovery, and the getBatch resolve-vs-retire window).
 *
 * The stream's documented failure mode under concurrent maintenance is
 * LOUD AND REPLAYABLE, never silent: a delta file that compact retires
 * between getBatch's path resolution and task execution 404s the
 * micro-batch; a restart from the same checkpoint re-resolves (now in
 * `_graft_log/retained/`) and replays the identical version range. The
 * consumer here does exactly that — restart on failure, bounded — and
 * the invariant is: after the dust settles, the DELIVERED ID SET
 * equals initial ∪ every appended id exactly (deletes don't retract
 * already-streamed rows; skipped rewrite commits emit nothing).
 * foreachBatch side effects are at-least-once across restarts, so the
 * assert is set equality against an idempotent sink — the same
 * idempotence contract Spark documents for foreachBatch sinks.
 */
class GeoTableStreamFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def pts(ids: Seq[Long]) = ids.map(i =>
    (i, (i % 141).toDouble * 0.71, (i % 89).toDouble * 1.12))
    .toDF("id", "x", "y").withColumn("geom", st_point($"x", $"y")).select("id", "geom")

  test("stream fuzz: tail survives concurrent append/delete/compact/repair via replay") {
    val dir = java.nio.file.Files.createTempDirectory("geostreamfuzz").toString + "/t"
    val ckpt = dir + "-ckpt"
    val extent = (0.0, 0.0, 100.0, 100.0)
    GeoTable.writeClustered(pts(0L until 1000L), "geom", dir, extent, numFiles = 2)
    GeoTableLog.enable(spark, dir)

    val nextId = new AtomicLong(1000L)
    val appended = new ConcurrentLinkedQueue[(Long, Long)]()
    val deletable = new ConcurrentLinkedQueue[(Long, Long)]()
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val stop = new AtomicBoolean(false)
    val writersIdle = new CountDownLatch(4)

    def tagged(name: String)(body: => Unit): Unit =
      try body catch {
        case t: Throwable => errors.add(new RuntimeException(s"[$name] $t", t))
      }

    def appendWorker(name: String): Unit = {
      tagged(name) {
        while (!stop.get()) {
          val lo = nextId.getAndAdd(300L)
          GeoTable.appendClustered(pts(lo until lo + 300L), "geom", dir, extent, numFiles = 1)
          appended.add((lo, lo + 300L))
          deletable.add((lo, lo + 300L))
        }
      }
      writersIdle.countDown()
    }

    def crudWorker(): Unit = {
      tagged("crud") {
        var flip = false
        while (!stop.get()) {
          if (flip) GeoTable.compactDeltas(spark, "geom", dir, extent)
          else {
            val r = deletable.poll()
            if (r == null) Thread.sleep(30)
            else GeoTable.deleteWhere(spark, "geom", dir,
              $"id" >= r._1 && $"id" < r._2 && $"id" % 5 === 3L)
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

    val pool = Executors.newFixedThreadPool(4)
    pool.submit(new Runnable { def run(): Unit = appendWorker("append-1") })
    pool.submit(new Runnable { def run(): Unit = appendWorker("append-2") })
    pool.submit(new Runnable { def run(): Unit = crudWorker() })
    pool.submit(new Runnable { def run(): Unit = repairWorker() })

    // the consumer: tail with restarts — every failure must be the
    // documented replayable class, and the restart must make progress
    val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    var restarts = 0
    val deadline = System.currentTimeMillis() + 10000
    var done = false
    while (!done) {
      val q = spark.readStream.format("geotable").option("path", dir)
        .option("skipChangeCommits", "true").load()
        .select("id")
        .writeStream.outputMode("append").option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.collect().foreach(r => delivered.add(r.getLong(0)))
          ()
        }.start()
      try {
        while (System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(50)
        }
        // quiesce writers, then drain the tail through THIS query
        if (!stop.getAndSet(true)) {
          assert(writersIdle.await(120, TimeUnit.SECONDS), "writers failed to quiesce")
        }
        q.processAllAvailable()
        done = true
      } catch {
        case t: Throwable =>
          def chain(x: Throwable): Seq[Throwable] =
            if (x == null) Nil else x +: chain(x.getCause)
          val replayable = chain(t).exists(c =>
            c.isInstanceOf[java.io.FileNotFoundException] ||
            Option(c.getMessage).exists(m => m.contains("FileNotFoundException") ||
              m.contains("does not exist") || m.contains("vacuumed")))
          assert(replayable, s"stream died on a non-replayable error: $t")
          restarts += 1
          assert(restarts < 50, s"restart storm: $restarts restarts")
      } finally q.stop()
    }
    if (!stop.getAndSet(true)) { // writers still running if no failure path hit
      assert(writersIdle.await(120, TimeUnit.SECONDS), "writers failed to quiesce")
    }
    assert(errors.isEmpty, s"writer errors: ${errors.toArray.mkString("\n")}")

    // invariant: delivered ids == initial ∪ appended, exactly
    import scala.jdk.CollectionConverters._
    val expected = (0L until 1000L).toSet ++
      appended.asScala.flatMap { case (lo, hi) => lo until hi }
    val got = delivered.asScala.toSet
    assert(got == expected,
      s"delivered ${got.size} ids, expected ${expected.size}; " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    info(s"stream fuzz: ${appended.size()} appends, ${got.size} ids delivered, " +
      s"$restarts restart(s)")
  }
}
