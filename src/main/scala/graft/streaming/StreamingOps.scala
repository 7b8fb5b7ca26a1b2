package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document event on a stream: content hash precomputed upstream (or
  * via sha2), event time for watermarking.
  */
final case class DocEvent(doc_id: Long, hash: String, ts: Timestamp)

/** One user interaction on a stream, for gap-based sessionization. */
final case class UserEvent(user_id: Long, ts: Timestamp)

/** A closed session: emitted once, when the gap elapses (in-batch) or the
  * watermark passes session_end + gap (via event-time timeout).
  */
final case class ClosedSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Long)

private[streaming] final case class OpenSession(start: Long, end: Long, n: Long)

/** Streaming shapes for a continuously-ingesting training-data pipeline:
  * the batch pack's dedup/quality operators re-expressed over unbounded
  * input with watermarks and explicit state. All state is keyed and
  * watermark/TTL-bounded — nothing accumulates unboundedly on an executor.
  */
object StreamingOps {

  /** Watermarked tumbling-window event counts (append mode emits a window
    * only once the watermark passes it — late events beyond `watermark` are
    * dropped, bounding state).
    */
  def windowedEventCounts(events: DataFrame, tsCol: String, keyCol: String,
                          window: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** Streaming exact dedup: emit a document the FIRST time its content hash
    * is seen; duplicates in the same or any later batch are dropped. State
    * is one boolean per hash with an event-time TTL — once the watermark
    * passes `ttl` past the last sighting, the hash can be re-emitted (the
    * standard bounded-state tradeoff; set the watermark by how far apart
    * true duplicates arrive).
    */
  def dedupByHash(docs: Dataset[DocEvent], watermark: String = "1 hour",
                  ttlMs: Long = 24L * 3600 * 1000): Dataset[DocEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withWatermark("ts", watermark)
      .groupByKey(_.hash)
      .flatMapGroupsWithState[Long, DocEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, events: Iterator[DocEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val first = if (state.exists) None else events.nextOption()
            val maxTs = events.foldLeft(first.map(_.ts.getTime).getOrElse(0L))(
              (m, e) => math.max(m, e.ts.getTime))
            state.update(math.max(state.getOption.getOrElse(0L), maxTs))
            // flatMapGroupsWithState does NOT drop late rows: a backfilled
            // key older than watermark-ttl would make ts+ttl an illegal
            // (pre-watermark) timeout and kill the query — clamp forward.
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1, state.get + ttlMs))
            first.iterator
          }
      }
  }

  /** Gap-based streaming sessionization — the streaming twin of the batch
    * q33 query: a session is a maximal run of a user's events with no gap
    * larger than `gapMs`. Sessions that close INSIDE a micro-batch (a
    * larger gap between two arriving events) are emitted immediately; the
    * trailing open session is held in keyed state and emitted by event-time
    * timeout once the watermark passes its end + gap. State is one
    * (start, end, n) triple per ACTIVE user — bounded by the watermark, not
    * by history — so a 1000-executor deployment holds live users only.
    */
  def sessionize(events: Dataset[UserEvent], gapMs: Long = 30L * 60 * 1000,
                 watermark: String = "1 hour"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid,
              new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            // Fold this batch's events (sorted by event time) into sessions,
            // closing whenever the gap is exceeded; late events inside the
            // watermark still merge correctly because the sort is per batch
            // and the state carries the open session across batches.
            val sorted = evs.toArray.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case Some(s) if t - s.end <= gapMs =>
                  Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(uid,
                    new Timestamp(s.start), new Timestamp(s.end), s.n)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // clamp past the watermark: a backfilled key whose end + gap
              // precedes the current watermark would be an illegal timeout
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, s.end + gapMs))
            }
            closed.iterator
          }
      }
  }

  /** Built-in alternative for the common case: watermark-bounded
    * dropDuplicates on the hash column (state bounded by the watermark).
    */
  def dedupWithinWatermark(docs: DataFrame, tsCol: String, hashCol: String,
                           watermark: String = "1 hour"): DataFrame =
    docs.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(hashCol)

  /** Streaming sliding N-day distinct users (the WAU dashboard fed by an
    * unbounded event stream) — the streaming twin of the batch q54 query,
    * using the same inversion: instead of per-window distinct-user SETS
    * (state proportional to users x windows), each event expands into the
    * <= N day-windows it serves, an exact streaming dedup keeps one row
    * per (user, window-end) inside the watermark horizon, and a windowed
    * count aggregates. State is the dedup's (user, win_end) keys plus
    * tiny per-window counters, both bounded by the watermark.
    */
  def slidingDistinctUsers(events: DataFrame, tsCol: String, userCol: String,
                           days: Int = 7,
                           watermarkDays: Int = 1): DataFrame = {
    val expanded = events
      .select(col(userCol).as("user_id"),
        explode(sequence(
          date_trunc("DAY", col(tsCol)),
          date_trunc("DAY", col(tsCol)) + expr(s"INTERVAL ${days - 1} DAY"),
          expr("INTERVAL 1 DAY"))).as("win_end"))
    // the dedup/aggregation key carries the event time itself. CRITICAL:
    // win_end runs up to N-1 days AHEAD of the event's own time, so the
    // global watermark (max win_end - delay) would outrun punctual
    // events' earlier windows and drop them as late. The delay therefore
    // absorbs the expansion: input lateness bound + (N-1) days. Both the
    // dedup keys and the per-window counters still evict on watermark
    // advance — state stays bounded by (N + lateness) days of windows.
    expanded
      .withWatermark("win_end", s"${watermarkDays + days - 1} days")
      .dropDuplicatesWithinWatermark("user_id", "win_end")
      .groupBy(col("win_end"))
      .count()
      .withColumnRenamed("count", "wau")
  }

  /** Stream-stream interval join (the click-attribution shape): each
    * click joins the impression with the same key that precedes it by at
    * most `horizonMinutes`. BOTH sides carry watermarks and the join
    * condition bounds event time in BOTH directions, which is exactly
    * what lets Spark evict buffered rows once no future match is
    * possible — without the time-range conjunct a two-unbounded-stream
    * join's state grows forever. Inner join semantics: rows later than
    * the watermark drop on either side. At scale the join shuffles both
    * streams keyed on ad_id only (state and shuffle are per-key local);
    * no broadcast, no cross product.
    */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       horizonMinutes: Int = 30,
                       watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .select(col("ad_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks
      .select(col("ad_id").as("c_ad_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    imp.join(clk,
        col("ad_id") === col("c_ad_id") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") +
            expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))
  }

  /** Streaming quality gate: language-ID + quality score per document,
    * filtering below-threshold rows — stateless, fuses into the stream's
    * scan stage (same kernels as the batch l09 query).
    */
  def qualityFilter(docs: DataFrame, textCol: String, minQuality: Double): DataFrame = {
    val lang = udf((t: String) =>
      if (t == null) "und" else graft.functions.TextOps.langId(t))
    val qual = udf((t: String) =>
      if (t == null) 0.0 else graft.functions.TextOps.qualityScore(t))
    docs
      .withColumn("lang", lang(col(textCol)))
      .withColumn("quality", qual(col(textCol)))
      .filter(col("quality") >= minQuality)
  }
}
