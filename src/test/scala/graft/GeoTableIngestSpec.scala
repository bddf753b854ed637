package graft

import graft.GeoFunctions._
import graft.sources.{GeoTable, GeoTableLog}
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** The 100 TB ingest loop, end-to-end on real pieces: crawl batches
 *  land in a STAGING GeoTable (commit log on), the `geotable` stream
 *  tails it version-by-version, every micro-batch runs the MinHash-LSH
 *  near-dup gate against a PERSISTED corpus bucket table, and the
 *  survivors append to a CURATED GeoTable — no component mocked, no
 *  full rescan anywhere (the stream reads only each commit's delta
 *  files; the gate joins ids-only band buckets). */
class GeoTableIngestSpec extends SparkSpec {
  import spark.implicits._

  private val ext = (0.0, 0.0, 100.0, 100.0)

  /** Disjoint vocabularies: seed docs share no shingle with fresh
   *  docs, so the only gate drops are the planted exact copies. */
  private def seedText(i: Long) =
    s"seed alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"
  private def freshText(i: Long) =
    s"fresh pico$i nano$i micro$i milli$i centi$i deci$i deka$i hecto$i kilo$i mega$i"

  private def docs(ids: Seq[Long], text: Long => String): DataFrame =
    ids.map(i => (i, text(i))).toDF("id", "text")
      .withColumn("geom", st_point((col("id") % 97).cast("double"),
        ((col("id") * 7) % 89).cast("double")))

  test("staging stream -> near-dup gate -> curated table, exactly once") {
    val staging = "/tmp/graft-ingest-staging"
    val curated = "/tmp/graft-ingest-curated"
    val bucketsPath = "/tmp/graft-ingest-buckets"
    val ckpt = "/tmp/graft-ingest-ckpt"
    Seq(staging, curated, bucketsPath, ckpt)
      .foreach(d => org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(d)))

    // the accepted corpus so far: 20 seed docs, bucket table persisted
    // once and reused across every micro-batch (the scale contract —
    // ids-only, never the signatures themselves)
    val seed = docs(0L until 20L, seedText)
    Streams.corpusBuckets(seed, col("id"), col("text"))
      .write.parquet(bucketsPath)
    val corpusBuckets = spark.read.parquet(bucketsPath)
    Streams.requireSigFormat(corpusBuckets) // once per run, not per batch

    // curated table starts from the seed corpus itself
    GeoTable.writeClustered(seed, "geom", curated, ext, numFiles = 2)
    GeoTableLog.enable(spark, curated)

    // staging: init snapshot is the first crawl batch — 5 fresh docs
    // plus 2 exact copies of seed docs (must be gated out)
    GeoTable.writeClustered(
      docs(100L until 105L, freshText)
        .unionByName(docs(Seq(200L, 201L), i => seedText(i - 200))),
      "geom", staging, ext, numFiles = 2)
    GeoTableLog.enable(spark, staging)

    val q = spark.readStream.format("geotable").option("path", staging).load()
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val survivors = Streams.nearDupFilterBatch(
          batch, col("id"), col("text"), corpusBuckets)
        if (!survivors.isEmpty)
          GeoTable.appendClustered(
            survivors.select("id", "text", "geom"), "geom", curated, ext, numFiles = 1)
        ()
      }.start()
    try {
      q.processAllAvailable()
      // second crawl batch arrives as a staging APPEND: 4 fresh docs
      // plus 3 copies of seed docs
      GeoTable.appendClustered(
        docs(110L until 114L, freshText)
          .unionByName(docs(Seq(210L, 211L, 212L), i => seedText(i - 210))),
        "geom", staging, ext, numFiles = 1)
      q.processAllAvailable()
    } finally q.stop()

    // curated = seed + exactly the fresh docs; every planted copy gated
    val got = spark.read.parquet(curated).select("id").as[Long].collect().toSeq.sorted
    val expected = ((0L until 20L) ++ (100L until 105L) ++ (110L until 114L)).sorted
    assert(got == expected, s"curated table wrong: $got")
    // and the curated log shows exactly the two gated appends
    val ops = GeoTableLog.entries(spark, curated).map(_._2)
    assert(ops == Seq("init", "append", "append"), s"curated ops: $ops")
  }
}
