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
}
