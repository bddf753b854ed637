package graft.streaming

import graft.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators. The reference has no streaming
 * surface (SURVEY §2.9: "absent in reference"); these extend the
 * engine to continuous pipelines with the same spatial/pipeline
 * semantics — windowed aggregation with watermarks, streaming
 * point-in-polygon enrichment against a broadcast zone table, and
 * stateful sessionization via flatMapGroupsWithState.
 */
object Streams {

  /** Normalize an event-time column to TimestampType across testdata
   *  generations: older driver data carried TIMESTAMP(NANOS) (readable
   *  only as a raw epoch-nanos long under
   *  spark.sql.legacy.parquet.nanosAsLong); current data is
   *  timestamp[us], which Spark reads as TIMESTAMP_NTZ. Session tz is
   *  UTC, so the NTZ→TZ cast preserves the wall-clock rendering the
   *  DuckDB oracle produces from the same naive values. */
  def eventTime(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // exact integer division: `/` promotes to double, whose 2^53
        // mantissa cannot represent epoch-nanos (~1.7e18, ulp ~256ns) —
        // a boundary timestamp could land in the wrong window bucket
        df.withColumn(c, timestamp_micros(expr(s"`$c` DIV 1000")))
      case _ => df.withColumn(c, col(c).cast("timestamp"))
    }

  /** Watermarked tumbling-window aggregate over an event stream
   *  (columns: ts timestamp, event_type string, value double). */
  def windowedEventCounts(
      events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count("*").as("n"), sum(col("value")).as("sum_value"))
  }

  /**
   * Continuous per-window top-k over an event stream (trending items /
   * leaderboards): watermarked tumbling window, ranked by the bounded
   * [[graft.operators.Similarity.topKByScore]] aggregate — map-side
   * partial top-k means state per (window, type) is O(k), never the
   * full item list (the collect_list-then-sort formulation keeps every
   * event in the state store and dies at scale).
   * Input columns: ts timestamp, event_type string, item_id long,
   * value double. Output: window, event_type, item_id, score, rank.
   */
  def windowedTopK(
      events: DataFrame, k: Int = 5, watermark: String = "10 minutes",
      window_ : String = "5 minutes"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"), col("item_id"))
      .agg(sum(col("value")).as("score"))
      // chained windowed aggregation (Spark 3.4+ multiple-stateful-
      // operator support): re-windowing ON the window column is how
      // event-time/watermark propagates into the second aggregation
      .groupBy(window(col("window"), window_), col("event_type"))
      .agg(graft.operators.Similarity.topKByScore(
        col("score"), col("item_id"), k).as("__tk"))
      .select(col("window"), col("event_type"), posexplode(col("__tk")))
      .select(col("window"), col("event_type"), col("col.id").as("item_id"),
        col("col.score").as("score"), (col("pos") + lit(1)).as("rank"))
  }

  /**
   * Streaming spatial enrichment: tag each event's point geometry with
   * the zone that contains it. The zone table is a static (batch) side
   * — Spark broadcasts it per micro-batch; the stream is never
   * shuffled (stateless map-side join → scales to any event rate).
   */
  def tagZones(
      stream: DataFrame, pointCol: Column,
      zones: DataFrame, zoneGeomCol: Column): DataFrame = {
    val z = zones.withColumn("__zg", zoneGeomCol)
      .withColumn("__zb", st_extent(col("__zg")))
    val s = stream.withColumn("__pt", pointCol)
      .withColumn("__px", st_x(col("__pt")))
      .withColumn("__py", st_y(col("__pt")))
    s.join(broadcast(z),
      col("__px") >= col("__zb.min_x") && col("__px") <= col("__zb.max_x") &&
        col("__py") >= col("__zb.min_y") && col("__py") <= col("__zb.max_y") &&
        st_contains(col("__zg"), col("__pt")),
      "left_outer")
      .drop("__zg", "__zb", "__pt", "__px", "__py")
  }

  /**
   * Gap-based sessionization: events per user collapse into sessions
   * closed after `gapMs` of inactivity (classic
   * flatMapGroupsWithState with ProcessingTime timeout).
   * Input columns: user_id long, ts timestamp, value double.
   * Output: user_id, session_start, session_end, n_events, sum_value.
   */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col("user_id").cast("long"), col("ts").cast("long").as("ts_s"), col("value").cast("double"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Double), (Long, Long, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[(Long, Long, Long, Double)]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          var sessions = List.empty[(Long, Long, Long, Long, Double)]
          var cur = state.getOption.orNull
          sorted.foreach { case (_, ts, v) =>
            val tsMs = ts * 1000
            if (cur == null) cur = (tsMs, tsMs, 1L, v)
            else if (tsMs - cur._2 > gapMs) {
              sessions ::= ((userId, cur._1, cur._2, cur._3, cur._4))
              cur = (tsMs, tsMs, 1L, v)
            } else cur = (cur._1, tsMs, cur._3 + 1, cur._4 + v)
          }
          if (cur != null) state.update(cur)
          sessions.reverseIterator
      }.toDF("user_id", "session_start", "session_end", "n_events", "sum_value")
  }

  /**
   * Batch sessionization with semantics identical to [[sessionize]]:
   * per-user sessions split at inactivity gaps > `gapMs`. Declarative
   * plan — lag-window gap flags, running-sum session index, one
   * grouped aggregate — so Catalyst/Tungsten run it as two window
   * passes over a single user-keyed shuffle (at 100 TB: one exchange
   * on user_id, no state store, no driver involvement). The session
   * index is tie-stable: equal timestamps contribute a 0 gap flag
   * wherever the sort places them, so the assignment is deterministic
   * even under non-deterministic tie order. Same output schema as
   * [[sessionize]].
   */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events.select(col("user_id").cast("long").as("user_id"),
      (col("ts").cast("long") * 1000).as("ts_ms"), col("value").cast("double").as("value"))
    val w = Window.partitionBy("user_id").orderBy("ts_ms")
    val flagged = e.withColumn("__new",
      when(col("ts_ms") - lag("ts_ms", 1).over(w) > gapMs, 1).otherwise(0))
    val idx = flagged.withColumn("__idx",
      sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    idx.groupBy("user_id", "__idx")
      .agg(min("ts_ms").as("session_start"), max("ts_ms").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .drop("__idx")
  }

  /**
   * Streaming exact dedup: keep the first occurrence of each key the
   * stream has ever seen within the watermark horizon — duplicates
   * with DIFFERENT event times still collapse (the key alone is the
   * identity). State is bounded by the event-time watermark (keys
   * older than the horizon are evicted — at 100 TB/day the state
   * cannot grow without bound, which an unwatermarked distinct would).
   * Columns: `tsCol` event-time timestamp; `keyCols` the identity.
   */
  def dedupStream(
      stream: DataFrame, tsCol: String, watermark: String,
      keyCols: String*): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.toSeq)

  /** Streaming near-dup candidate tagging: minhash-band bucket ids per
   *  document, computed stateless per micro-batch (join the output
   *  against a bucket store, or window-aggregate it, downstream). */
  def minhashTagStream(stream: DataFrame, textCol: Column): DataFrame =
    stream.withColumn("minhash_sig",
      graft.operators.Dedup.minhashSignature(textCol))

  /** MinHash signature FORMAT version carried by persisted bucket
   *  tables. v2 = `array<int>` signatures (values mod 2^31-1; since
   *  r15); v1 was `array<long>`. Bucket hashes are `hash(slice(sig))`
   *  over the signature array, so the SAME document buckets
   *  DIFFERENTLY under the two formats — joining a v1 persisted table
   *  against freshly computed v2 buckets silently matches nothing and
   *  the ingestion gate admits every duplicate. The version column +
   *  the checks below turn that silent failure into a loud one. */
  val SigFormatVersion = 2

  /** Band-bucket table of an accepted corpus for the streaming
   *  ingestion gate: (`__id`, band, bh, __sig_v) — ids only, so at
   *  corpus scale the table is narrow; persist or write it out and
   *  reuse it across every micro-batch / ingestion run. `__sig_v`
   *  stamps the signature format ([[SigFormatVersion]]) so a table
   *  persisted before a format change fails loudly at the gate
   *  instead of silently matching nothing. */
  def corpusBuckets(
      corpus: DataFrame, id: Column, text: Column,
      numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 3): DataFrame =
    graft.operators.Dedup.bandBuckets(
      corpus.select(id.as("__id"),
        graft.operators.Dedup.minhashSignature(text, numHashes, shingleSize).as("__sig")),
      numHashes, bands)
      .withColumn("__sig_v", lit(SigFormatVersion))

  /** Assert a (possibly persisted) corpus bucket table was built with
   *  the CURRENT signature format — one 1-row action, run once per
   *  ingestion run (not per micro-batch). A table written before the
   *  version column existed (pre-r16) is v1-or-v2-ambiguous: rebuild
   *  it with [[corpusBuckets]]. */
  def requireSigFormat(corpusBuckets: DataFrame): Unit = {
    require(corpusBuckets.columns.contains("__sig_v"),
      "corpus bucket table carries no __sig_v column — it predates the " +
        s"signature format tag (current format v$SigFormatVersion, array<int> " +
        "minhash since r15; array<long> before). Rebuild it with " +
        "Streams.corpusBuckets so bucket hashes match freshly computed ones.")
    val vs = corpusBuckets.select("__sig_v").limit(1).collect()
    vs.headOption.foreach { r =>
      val v = r.getInt(0)
      require(v == SigFormatVersion,
        s"corpus bucket table is signature format v$v but this engine computes " +
          s"v$SigFormatVersion buckets — the (band, bh) join would silently match " +
          "nothing and admit every duplicate. Rebuild the table with " +
          "Streams.corpusBuckets.")
    }
  }

  /**
   * Ingestion-gate near-dup filter: drop batch documents that LSH-
   * collide with an already-accepted corpus (the standard training-data
   * ingestion step — new crawl batches vs the corpus so far). The
   * batch's bands equi-join the corpus bucket table on (band, bh);
   * a document matching in ANY band is dropped. Batch semantics —
   * stream-safe via [[nearDupGate]], which runs it per micro-batch
   * where the batch-vs-derived-self join is legal.
   */
  def nearDupFilterBatch(
      batch: DataFrame, id: Column, text: Column, corpusBuckets: DataFrame,
      numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 3): DataFrame = {
    val withSig = batch.withColumn("__gate_id", id)
      .withColumn("__sig",
        graft.operators.Dedup.minhashSignature(text, numHashes, shingleSize))
    val buckets = graft.operators.Dedup.bandBuckets(
      withSig.select(col("__gate_id").as("__id"), col("__sig")), numHashes, bands)
    // schema-only format guard (free per batch; the 1-row value check
    // is requireSigFormat, run once per ingestion run by nearDupGate)
    require(corpusBuckets.columns.contains("__sig_v"),
      "corpus bucket table carries no __sig_v format tag — rebuild it with " +
        s"Streams.corpusBuckets (current signature format v$SigFormatVersion)")
    val dupIds = buckets.join(corpusBuckets, Seq("band", "bh"), "left_semi")
      .select(col("__id")).distinct()
    withSig.join(dupIds, withSig("__gate_id") === dupIds("__id"), "left_anti")
      .drop("__gate_id", "__sig")
  }

  /**
   * Watermarked stream-stream interval join (attribution shape: each
   * left event pairs with same-key right events landing within
   * [0, withinMs] after it). Both sides carry event-time watermarks,
   * and the time-range predicate rides the key equi-join — exactly
   * what Spark needs to bound the join state on BOTH sides (without
   * the interval bound, stream-stream join state grows forever).
   * On batch frames the watermark is a no-op and the same plan is the
   * batch interval join, which is how the spec proves equivalence.
   * Output: (key, left_ts, right_ts) plus the passed-through payload
   * columns (prefixed l_/r_ when names collide is the caller's job —
   * inputs are pre-projected).
   */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, withinMs: Long,
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
      .select(col(keyCol).as("key"), col(tsCol).as("left_ts"))
    val r = right.withWatermark(tsCol, watermark)
      .select(col(keyCol).as("__rkey"), col(tsCol).as("right_ts"))
    l.join(r,
      l("key") === r("__rkey") &&
        r("right_ts") >= l("left_ts") &&
        r("right_ts") <= l("left_ts") + expr(s"INTERVAL ${withinMs / 1000} SECOND"),
      "inner")
      .select(col("key"), col("left_ts"), col("right_ts"))
  }

  /**
   * Streaming as-of enrichment — the streaming twin of
   * [[graft.operators.AsofJoin.asofJoin]]'s backward/latest
   * (non-strict) semantics: each left event joins the LATEST right
   * row with right.ts <= left.ts seen so far on its key (the
   * "enrich events with current reference state" shape: trades
   * against latest quote, requests against latest config).
   *
   * Mechanics: both sides union into one keyed stream
   * (`flatMapGroupsWithState`); per key the state is the single
   * latest right (ts, value) — O(keys) state, never a row buffer.
   * Within a micro-batch rows process in ts order with rights ahead
   * of lefts at equal timestamps (the batch operator's non-strict tie
   * rule). ACROSS batches, a right arriving after a left already
   * emitted cannot retro-update it — the inherent streaming
   * divergence; the batch operator is the exact replay, which is how
   * the spec certifies this one (single-batch run == batch asof).
   *
   * Inputs: left (key long, ts long, lval double), right (key long,
   * ts long, rval double). Output: (key, ts, lval, asof_ts, rval) —
   * asof_ts/rval NULL when no right row has arrived yet.
   */
  def asofJoinStream(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val tagged = left.select(col("key").cast("long"), col("ts").cast("long"),
        lit(false).as("isRight"), col("lval").cast("double"), lit(0.0).as("rval"))
      .unionByName(right.select(col("key").cast("long"), col("ts").cast("long"),
        lit(true).as("isRight"), lit(0.0).as("lval"), col("rval").cast("double")))
      .as[(Long, Long, Boolean, Double, Double)]
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double, Option[Long], Option[Double])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Double)]) =>
          // rights before lefts at equal ts = non-strict (<=) semantics
          val sorted = rows.toSeq.sortBy(r => (r._2, !r._3))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Double, Option[Long], Option[Double])]
          sorted.foreach { case (_, ts, isRight, lval, rval) =>
            if (isRight) {
              // monotone guard: a stale right (older than the state)
              // never regresses the latest value
              if (cur.isEmpty || ts >= cur.get._1) cur = Some((ts, rval))
            } else {
              // the contract is right.ts <= left.ts: a state right from
              // the FUTURE of this (late) left must not join it
              val m = cur.filter(_._1 <= ts)
              out += ((key, ts, lval, m.map(_._1), m.map(_._2)))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }.toDF("key", "ts", "lval", "asof_ts", "rval")
  }

  /** Streaming wrapper for [[nearDupFilterBatch]]: apply the gate per
   *  micro-batch via foreachBatch and hand survivors to `sink`.
   *  Validates the bucket table's signature format ONCE up front
   *  ([[requireSigFormat]]) — a persisted table from a different
   *  minhash format fails here, not by silently admitting every dup. */
  def nearDupGate(
      stream: DataFrame, id: Column, text: Column, corpusBuckets: DataFrame,
      sink: DataFrame => Unit,
      numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    requireSigFormat(corpusBuckets)
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(nearDupFilterBatch(batch, id, text, corpusBuckets, numHashes, bands, shingleSize))
    }
  }
}
