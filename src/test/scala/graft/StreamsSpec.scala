package graft

import graft.GeoFunctions._
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private lazy val eventsDir: String = {
    // re-write sf0.001 events as micro-batch-able parquet with a
    // TimestampType ts column (Streams.eventTime handles both the old
    // nanos-as-long and the current timestamp[us] testdata). Always
    // overwritten (once per suite run — lazy val): an existence-keyed
    // cache went stale across testdata-generation switches.
    val dir = "/tmp/graft-stream-events"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Streams.eventTime(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming windowed aggregation equals batch result") {
    val stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    val agg = Streams.windowedEventCounts(stream, "1 hour", "1 hour")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(col("window.start").as("w"), col("event_type"), col("n"))
      val batch = spark.read.parquet(eventsDir)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("w"), col("event_type"))
        .agg(count("*").as("n"))
      assert(got.count() > 0)
      assert(got.exceptAll(batch).count() == 0 && batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("streaming windowed top-k equals batch top-k (append mode, bounded state)") {
    // chained stateful aggregations require append mode (complete mode
    // trips Spark's global-watermark correctness guard by design), so
    // the test drives the production shape: ingest the events, then a
    // far-future sentinel batch that advances the watermark and flushes
    // every real window out of the state store.
    val inDir = "/tmp/graft-stream-topk-in"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(inDir), true)
    val base = spark.read.parquet(eventsDir)
    base.write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream.schema(eventsSchema).parquet(inDir)
      .withColumn("item_id", $"user_id" % 20)
    val topk = Streams.windowedTopK(stream, k = 3, watermark = "1 hour", window_ = "1 hour")
    val q = topk.writeStream.outputMode("append").format("memory")
      .queryName("topk_out").start()
    try {
      q.processAllAvailable()
      val maxTs = base.agg(max($"ts")).collect()(0).getTimestamp(0)
      val sentinel = base.limit(1)
        .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 3 * 3600 * 1000L)))
        .withColumn("event_type", lit("zz_sentinel"))
      sentinel.write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val got = spark.table("topk_out")
        .select($"window.start".as("w"), $"event_type", $"item_id", $"rank")
      val batch = {
        val scored = base
          .withColumn("item_id", $"user_id" % 20)
          .groupBy(window($"ts", "1 hour").getField("start").as("w"),
            $"event_type", $"item_id")
          .agg(sum($"value").as("score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("w", "event_type").orderBy($"score".desc, $"item_id".asc)
        scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
          .select($"w", $"event_type", $"item_id", $"rank")
      }
      assert(got.count() > 0)
      assert(got.exceptAll(batch).count() == 0 && batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("streaming zone tagging (broadcast spatial enrich)") {
    val zones = (for (i <- 0 until 4) yield (i, i * 25.0))
      .toDF("zid", "x0")
      .withColumn("zone", st_makeenvelope($"x0", lit(0.0), $"x0" + 25.0, lit(100.0)))
    val stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
      .withColumn("pt", st_point(pmod($"event_id", lit(100)).cast("double") + 0.5, lit(50.0)))
    val tagged = Streams.tagZones(stream, $"pt", zones, $"zone")
    val q = tagged.writeStream.outputMode("append").format("memory")
      .queryName("zones_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("zones_out")
      val total = spark.read.parquet(eventsDir).count()
      assert(got.count() == total) // left_outer keeps every event
      // every event's x in [0,100) → exactly one zone matches
      assert(got.filter($"zid".isNull).count() == 0)
      val check = got.withColumn("expected", floor((pmod($"event_id", lit(100)) + 0.5) / 25.0))
        .filter($"zid" =!= $"expected").count()
      assert(check == 0)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch interval join") {
    val batch = spark.read.parquet(eventsDir)
    val bViews = batch.filter($"event_type" === "view")
    val bClicks = batch.filter($"event_type" === "click")
    val expected = Streams.intervalJoin(bViews, bClicks,
      "user_id", "ts", withinMs = 3600000L)
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(expected.nonEmpty, "fixture has no view->click pairs within an hour")

    val stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    val joined = Streams.intervalJoin(
      stream.filter($"event_type" === "view"),
      stream.filter($"event_type" === "click"),
      "user_id", "ts", withinMs = 3600000L)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ij_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    } finally q.stop()
  }

  test("streaming as-of join: single batch equals batch asof; state carries across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lMem = MemoryStream[(Long, Long, Double)]
    val rMem = MemoryStream[(Long, Long, Double)]
    val out = Streams.asofJoinStream(
      lMem.toDF.toDF("key", "ts", "lval"), rMem.toDF.toDF("key", "ts", "rval"))
    // batch 0: interleaved rights/lefts, an equal-ts tie, a key with
    // no right at all, and a stale right older than the state — data
    // added BEFORE start so both sides land in the SAME micro-batch
    // (the single-batch == batch-operator premise)
    rMem.addData((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 90L, 9.0), (2L, 50L, 5.0))
    lMem.addData((1L, 150L, 1.0), (1L, 200L, 2.0), (3L, 99L, 3.0))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("asof_out").start()
    try {
      q.processAllAvailable()
      val got1 = spark.table("asof_out")
        .as[(Long, Long, Double, Option[Long], Option[Double])].collect().toSet
      val bl = Seq((1L, 150L, 1.0), (1L, 200L, 2.0), (3L, 99L, 3.0)).toDF("key", "lts", "lval")
      val br = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 90L, 9.0), (2L, 50L, 5.0))
        .toDF("key", "rts", "rval")
      val expect = graft.operators.AsofJoin.asofJoin(bl, br, "key", "lts", "rts")
        .select($"key", $"lts", $"lval", $"asof_rts", $"rval")
        .as[(Long, Long, Double, Option[Long], Option[Double])].collect().toSet
      assert(got1 == expect, s"missing=${expect -- got1} extra=${got1 -- expect}")
      // non-strict tie: the left at ts=200 sees the right at ts=200
      assert(got1.exists(r => r._2 == 200L && r._5.contains(20.0)))
      // no-right key emits with NULLs
      assert(got1.contains((3L, 99L, 3.0, None, None)))
      // batch 2: left arrives in a LATER batch; the carried state joins
      lMem.addData((2L, 60L, 4.0))
      q.processAllAvailable()
      val got2 = spark.table("asof_out")
        .as[(Long, Long, Double, Option[Long], Option[Double])].collect().toSet
      assert(got2.contains((2L, 60L, 4.0, Some(50L), Some(5.0))), got2.toString)
      // batch 3: a LATE left older than the carried state — the
      // right.ts <= left.ts contract means it must NOT see the future
      // right (state for key 1 is ts=200)
      lMem.addData((1L, 120L, 9.0))
      q.processAllAvailable()
      val got3 = spark.table("asof_out")
        .as[(Long, Long, Double, Option[Long], Option[Double])].collect().toSet
      assert(got3.contains((1L, 120L, 9.0, None, None)),
        s"late left must not join a future right: $got3")
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence per key; minhash tags match batch") {
    // duplicate every event id twice: an exact copy AND a copy shifted
    // +1 minute — both must collapse (the key alone is the identity)
    val dir = eventsDir
    val dupDir = "/tmp/graft-stream-events-dup"
    if (!new java.io.File(dupDir).exists()) {
      val e = spark.read.parquet(dir)
      e.unionAll(e)
        .unionAll(e.withColumn("ts", $"ts" + expr("INTERVAL 1 MINUTE")))
        .write.mode("overwrite").parquet(dupDir)
    }
    val stream = spark.readStream.schema(eventsSchema).parquet(dupDir)
    val deduped = Streams.dedupStream(stream, "ts", "1 hour", "event_id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out")
      val distinctKeys = spark.read.parquet(dir).select("event_id").distinct().count()
      assert(got.count() == distinctKeys)
      assert(got.groupBy("event_id").count().filter($"count" > 1).count() == 0)
    } finally q.stop()

    // minhash tagging is stateless per micro-batch and equals the batch op
    val docs = spark.read.parquet(dir).limit(50)
      .select($"event_id", concat(lit("text payload nr "), $"event_id").as("text"))
    val docsDir = "/tmp/graft-stream-docs"
    docs.write.mode("overwrite").parquet(docsDir)
    val dstream = spark.readStream.schema(docs.schema).parquet(docsDir)
    val tagged = Streams.minhashTagStream(dstream, $"text")
    val q2 = tagged.writeStream.outputMode("append").format("memory")
      .queryName("mh_out").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("mh_out").select($"event_id", $"minhash_sig")
      val batch = docs.select($"event_id",
        graft.operators.Dedup.minhashSignature($"text").as("minhash_sig"))
      assert(got.exceptAll(batch).count() == 0 && batch.exceptAll(got).count() == 0)
    } finally q2.stop()
  }

  test("BPE encode is streaming-safe: per-batch narrow map equals batch encode") {
    // encode is a stateless mapPartitions with broadcast merges — it
    // must run unchanged on a stream (the ingestion-pipeline shape:
    // tokenize documents as they land)
    val docsDir = "/tmp/graft-stream-docs"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").write.mode("overwrite").parquet(docsDir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"))
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val enc = graft.operators.Bpe.encode(stream, $"doc_id", $"text", merges)
      .select($"id", size($"tokens").as("n_tokens"))
    assert(enc.isStreaming, "encode must preserve the streaming plan")
    val q = enc.writeStream.outputMode("append").format("memory")
      .queryName("bpe_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("bpe_out")
      val batch = graft.operators.Bpe.encode(
          spark.read.parquet(docsDir), $"doc_id", $"text", merges)
        .select($"id", size($"tokens").as("n_tokens"))
      assert(got.count() > 0)
      assert(got.exceptAll(batch).count() == 0 && batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("sessionization groups events by inactivity gap") {
    val stream = spark.readStream.schema(eventsSchema).parquet(eventsDir)
    val sessions = Streams.sessionize(stream, gapMs = 3600 * 1000L)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess_out")
      // closed sessions only (append mode); sanity: no negative durations,
      // counts positive
      assert(got.filter($"session_end" < $"session_start").count() == 0)
      assert(got.filter($"n_events" <= 0).count() == 0)
      // batch ≡ streaming: the declarative sessionizeBatch must agree
      // with the stateful streaming operator on every CLOSED session
      // (the streaming side's state holds each user's final session
      // open forever, so batch = streaming + exactly the last session
      // per user)
      val batch = Streams.sessionizeBatch(
        spark.read.parquet(eventsDir), gapMs = 3600 * 1000L)
      assert(got.exceptAll(batch).count() == 0,
        "streaming emitted a session batch does not have")
      val openOnly = batch.exceptAll(got)
      val lastPerUser = batch.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max($"session_start").as("session_start"))
      assert(openOnly.count() == lastPerUser.count())
      assert(openOnly.join(lastPerUser, Seq("user_id", "session_start"), "left_anti").count() == 0,
        "batch-minus-streaming contained a non-final session")
    } finally q.stop()
  }

  test("ingestion gate drops near-dups of the accepted corpus, keeps fresh docs") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // accepted corpus: first 50 docs; incoming batch: 25 exact re-crawls
    // (near-dups of the corpus) + 25 docs the corpus has never seen
    val corpus = docs.filter($"doc_id" < 50)
    val incomingDup = docs.filter($"doc_id" < 25)
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
    val incomingFresh = docs.filter($"doc_id" >= 100 && $"doc_id" < 125)
      .select(($"doc_id" + 2000).as("doc_id"), $"text")
    val incoming = incomingDup.unionAll(incomingFresh)

    val buckets = Streams.corpusBuckets(corpus, $"doc_id", $"text").cache()
    // batch semantics first
    val survivors = Streams.nearDupFilterBatch(incoming, $"doc_id", $"text", buckets)
    val ids = survivors.select("doc_id").as[Long].collect().toSet
    assert(ids.forall(_ >= 2000), s"re-crawled dups survived: ${ids.filter(_ < 2000)}")
    assert(ids.size > 15, s"too few fresh survivors (LSH false positives?): ${ids.size}")

    // stream path: same batch through the foreachBatch gate
    val dir = "/tmp/graft-stream-gate"
    incoming.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(incoming.schema).parquet(dir)
    val out = scala.collection.mutable.Set[Long]()
    val q = Streams.nearDupGate(stream, $"doc_id", $"text", buckets,
      b => out ++= b.select("doc_id").as[Long].collect()).start()
    try { q.processAllAvailable() } finally q.stop()
    assert(out.toSet == ids, "stream gate disagrees with batch gate")

    // signature-format guard (r16): a bucket table from a DIFFERENT
    // minhash format must fail LOUDLY, not silently admit every dup —
    // the r15 array<long> -> array<int> break made stale persisted
    // tables match nothing
    Streams.requireSigFormat(buckets) // current format passes
    val untagged = buckets.drop("__sig_v")
    val e1 = intercept[IllegalArgumentException] {
      Streams.nearDupFilterBatch(incoming, $"doc_id", $"text", untagged)
    }
    assert(e1.getMessage.contains("__sig_v"))
    val wrongV = buckets.withColumn("__sig_v",
      org.apache.spark.sql.functions.lit(1))
    val e2 = intercept[IllegalArgumentException] { Streams.requireSigFormat(wrongV) }
    assert(e2.getMessage.contains("signature format v1"))
  }
}
