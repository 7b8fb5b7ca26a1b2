package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document event on a stream: content hash precomputed upstream (or
  * via sha2), event time for watermarking.
  */
final case class DocEvent(doc_id: Long, hash: String, ts: Timestamp)

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

  /** Built-in alternative for the common case: watermark-bounded
    * dropDuplicates on the hash column (state bounded by the watermark).
    */
  def dedupWithinWatermark(docs: DataFrame, tsCol: String, hashCol: String,
                           watermark: String = "1 hour"): DataFrame =
    docs.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(hashCol)

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
