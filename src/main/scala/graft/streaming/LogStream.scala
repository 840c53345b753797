package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.CloudWatchLogs

/** Structured Streaming face of the engine (SURVEY §2.1 st1–st3).
  *
  * The reference's long-poll loop over shard iterators
  * (kinesis_logs_reader.py:99-106) becomes a streaming source +
  * incremental query: the runtime owns offsets/retries/backpressure,
  * and the same narrow parse chain as the batch Reader runs per
  * micro-batch. With a real Kinesis connector the `records` stream
  * would come from `readStream.format(...)`; everything downstream is
  * source-agnostic.
  */
object LogStream {

  /** Streaming variant of Reader.readLogs (no global sort/limit —
    * those are not stream semantics; use watermarks + windows).
    */
  def parse(records: DataFrame, dataCol: String = "data"): DataFrame =
    records
      .withColumn("_payload",
        graft.functions.opaque(CloudWatchLogs.decodePayload(col(dataCol))))
      .where(col("_payload.messageType") === CloudWatchLogs.DataMessage)
      .select(explode(col("_payload.logEvents")).as("_logEvent"))
      .select(
        col("_logEvent.id").as("log_id"),
        col("_logEvent.timestamp").as("timestamp_ms"),
        col("_logEvent.message").as("message"),
        col("_logEvent.extractedFields").as("fields"))

  /** Event-time tumbling-window counts with a watermark bounding
    * state retention.
    */
  def windowedCounts(flat: DataFrame, windowDur: String, watermarkDelay: String): DataFrame =
    flat
      .withColumn("event_time", timestamp_millis(col("timestamp_ms")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDur))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Streaming exactly-once on re-delivered records: drop duplicate
    * log ids within the watermark horizon. Kinesis get_records is
    * at-least-once (the reference re-polls shard iterators and can
    * replay on resharding); state is bounded by the watermark instead
    * of an ever-growing seen-set.
    */
  def dedupe(flat: DataFrame, watermarkDelay: String): DataFrame =
    flat
      .withColumn("event_time", timestamp_millis(col("timestamp_ms")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("log_id")

  /** Stream-static enrichment: join the parsed stream to a static
    * dimension snapshot. The dim is broadcast per micro-batch — no
    * stream-side shuffle, no state.
    */
  def enrich(flat: DataFrame, dim: DataFrame, usingColumns: Seq[String]): DataFrame =
    flat.join(broadcast(dim), usingColumns, "left")

  /** Watermarked stream-stream interval join: left rows meet right
    * rows with the same `key` whose event time falls in
    * [left - lookback, left]. Both sides carry watermarks, so join
    * state is bounded: Spark evicts right-side state older than
    * `watermark + lookback` — the stream twin of RangeJoin.bandJoin
    * with an equi key.
    */
  def joinWithin(
      left: DataFrame, right: DataFrame, key: String,
      lookbackMs: Long, watermarkDelay: String): DataFrame = {
    val l = left
      .withColumn("l_time", timestamp_millis(col("timestamp_ms")))
      .withWatermark("l_time", watermarkDelay)
    val r = right
      .select(col(key), col("timestamp_ms").as("r_ts_ms"))
      .withColumn("r_time", timestamp_millis(col("r_ts_ms")))
      .withWatermark("r_time", watermarkDelay)
    l.join(r,
      l(key) === r(key) &&
        col("r_time") >= col("l_time") - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
        col("r_time") <= col("l_time"))
      .drop(r(key))
  }

  case class EventIn(userId: Long, tsNs: Long)
  case class SessionOut(userId: Long, startMs: Long, endMs: Long, nEvents: Long)
  case class OpenSession(startNs: Long, endNs: Long, n: Long)
  case class TimedEventIn(userId: Long, tsNs: Long, eventTime: java.sql.Timestamp)

  /** Like [[sessionize]] but with event-time expiry: a session idle
    * past the watermark is emitted and its state removed, instead of
    * the open tail lingering per user forever. This is the
    * production-correct variant — state size is bounded by *active*
    * users, and every session is eventually emitted exactly once.
    * Input must carry `withWatermark` on `eventTime`.
    */
  def sessionizeExpiring(events: Dataset[TimedEventIn], gapNs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapNs / 1000000L
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TimedEventIn], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val expired = state.getOption.map(s =>
              SessionOut(uid, s.startNs / 1000000L, s.endNs / 1000000L, s.n)).iterator
            state.remove()
            expired
          } else {
            val times = it.map(_.tsNs).toArray.sorted
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.endNs <= gapNs =>
                  open = Some(s.copy(endNs = t, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(uid, s.startNs / 1000000L, s.endNs / 1000000L, s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // expire once the watermark passes the session's gap
              // horizon (must be set strictly beyond current watermark)
              state.setTimeoutTimestamp(
                math.max(s.endNs / 1000000L + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }

  /** Stateful gap sessionization: closed sessions are emitted, the
    * open tail lives in group state (bounded per key). The streaming
    * twin of the batch q8_sessionize window query.
    */
  def sessionize(events: Dataset[EventIn], gapNs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventIn], state: GroupState[OpenSession]) =>
          val times = it.map(_.tsNs).toArray.sorted
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          times.foreach { t =>
            open match {
              case Some(s) if t - s.endNs <= gapNs =>
                open = Some(s.copy(endNs = t, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(uid, s.startNs / 1000000L, s.endNs / 1000000L, s.n)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }
}
