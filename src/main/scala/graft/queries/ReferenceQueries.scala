package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Reader
import graft.sources.CloudWatchLogs

/** §2.1 — the reference's own surface, re-expressed Spark-first.
  *
  * Kinesis isn't reachable in this environment, so each query
  * deterministically roundtrips the `events` table through real
  * gzipped CWL payloads (built with [[CloudWatchLogs.encodePayload]])
  * and then runs the genuine read pipeline on them. The oracle can
  * therefore verify the whole decompress/parse/flatten chain against
  * a plain SQL projection of `events`.
  */
object ReferenceQueries {

  /** events → per-"shard" gzipped CWL payloads (one Kinesis record per
    * shard here; multi-record sharding is exercised in r4).
    */
  private def payloadsFromEvents(events: DataFrame, shards: Int = 8): DataFrame = {
    GraftSession.ensureRegistered(events.sparkSession)
    events
      .select(
        (col("user_id") % shards).as("shard_id"),
        struct(
          col("event_id").cast("string").as("id"),
          col("ts_ms").as("timestamp"),
          concat_ws(" ", col("event_id"), col("event_type"), col("value")).as("message"),
          map(
            lit("event_id"), col("event_id").cast("string"),
            lit("user_id"), col("user_id").cast("string"),
            lit("event_type"), col("event_type"),
            lit("value"), col("value").cast("string")).as("extractedFields")
        ).as("logEvent"))
      .groupBy("shard_id")
      .agg(collect_list(col("logEvent")).as("logEvents"))
      .select(
        col("shard_id"),
        CloudWatchLogs.encodePayload(lit(CloudWatchLogs.DataMessage), col("logEvents")).as("data"))
  }

  /** Flattened reader output → typed event columns (sorted). */
  private def typedFields(flat: DataFrame): DataFrame =
    flat.select(
      col("fields")("event_id").cast("long").as("event_id"),
      col("timestamp_ms").as("ts_ms"),
      col("fields")("user_id").cast("long").as("user_id"),
      col("fields")("event_type").as("event_type"),
      round(col("fields")("value").cast("double"), 2).as("value"))

  val r1CwlParse: Q = (s, dir) =>
    typedFields(Reader.readLogs(payloadsFromEvents(events(s, dir)))).orderBy("event_id")

  val queries: Map[String, Q] = Map(
    "r1_cwl_parse" -> r1CwlParse)

  val oracleSql: Map[String, String] = Map(
    "r1_cwl_parse" ->
      """SELECT event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms, user_id, event_type,
        |round(value, 2) AS value FROM events ORDER BY event_id""".stripMargin)
}
