package graft.sources

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.streaming.LogStream

/** Kinesis connector option shim — the argument-surface twin of the
  * reference reader's constructor.
  *
  * The reference takes `stream_name` and an optional `start_time`,
  * and turns them into per-shard iterators: `start_time=None` ⇒
  * `ShardIteratorType=LATEST`, a datetime ⇒ `AT_TIMESTAMP` with the
  * timestamp (reference: kinesis_logs_reader.py:23-32, 69-77);
  * client kwargs (region/endpoint/credentials) configure the boto3
  * session (kinesis_logs_reader.py:60-61).
  *
  * On Spark the runtime owns shard discovery, iterators, retries and
  * checkpointing — the whole loop reduces to source OPTIONS. This
  * shim builds that option map for the public AWS Labs Structured
  * Streaming connector (`spark-sql-kinesis-connector`, format
  * `"aws-kinesis"`, options prefixed `kinesis.`). The sandbox has no
  * AWS endpoint, so nothing here is integration-tested against a real
  * stream; the map is unit-specced and [[fileFallback]] realizes the
  * same semantics over the file source so every downstream operator
  * is exercised end-to-end.
  *
  * Everything downstream of the source is source-agnostic
  * ([[LogStream.parse]] takes any DataFrame with a `data` binary
  * column), so swapping the file realization for the connector is one
  * line: `readStream(spark, args)` instead of
  * `fileFallback(spark, path, schema, args)`.
  */
object KinesisSource {

  /** The reference constructor's argument surface, typed.
    * `startTime=None` means "tail from now" (LATEST), exactly like
    * the reference's default.
    */
  case class KinesisArgs(
      streamName: String,
      startTime: Option[Instant] = None,
      region: Option[String] = None,
      endpointUrl: Option[String] = None)

  /** Connector format name of the AWS Labs Structured Streaming
    * Kinesis connector.
    */
  val Format = "aws-kinesis"

  /** Datetime pattern used for the AT_TIMESTAMP position value (UTC).
    * Emitted alongside the value as
    * `kinesis.startingPosition.timestampFormat` so the connector
    * parses with the exact pattern we wrote, whatever its default.
    */
  val AtTimestampPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  /** Build the connector option map.
    *
    *  - no startTime → `kinesis.startingPosition = LATEST`
    *    (reference: kinesis_logs_reader.py:71-72)
    *  - startTime    → `AT_TIMESTAMP` + the timestamp option
    *    (reference: kinesis_logs_reader.py:73-75)
    *
    * The AT_TIMESTAMP value is a formatted UTC datetime plus an
    * explicit `timestampFormat` — the spelling the AWS Labs connector
    * README documents; set `timestampAsEpochMillis=true` for
    * connector builds that take epoch millis instead. The full option
    * surface this shim emits is pinned BOTH ways against the vendored
    * contract table (resources/kinesis-option-contract.md) by the k7
    * golden spec: a key rename on either side fails the build, not a
    * production attach. CAVEAT: this sandbox has no AWS endpoint and
    * no copy of the connector docs, so NEITHER AT_TIMESTAMP spelling
    * is verified against a pinned connector version here — before
    * production use, diff the vendored table against your connector
    * release's README and pick the matching form.
    */
  def options(args: KinesisArgs, timestampAsEpochMillis: Boolean = false): Map[String, String] = {
    require(args.streamName.nonEmpty, "streamName must be non-empty")
    val position = args.startTime match {
      case None => Map("kinesis.startingPosition" -> "LATEST")
      case Some(t) if timestampAsEpochMillis => Map(
        "kinesis.startingPosition" -> "AT_TIMESTAMP",
        "kinesis.startingPosition.timestamp" -> t.toEpochMilli.toString)
      case Some(t) => Map(
        "kinesis.startingPosition" -> "AT_TIMESTAMP",
        "kinesis.startingPosition.timestamp" ->
          java.time.format.DateTimeFormatter.ofPattern(AtTimestampPattern)
            .withZone(java.time.ZoneOffset.UTC).format(t),
        "kinesis.startingPosition.timestampFormat" -> AtTimestampPattern)
    }
    Map("kinesis.streamName" -> args.streamName) ++
      args.region.map("kinesis.region" -> _) ++
      args.endpointUrl.map("kinesis.endpointUrl" -> _) ++
      position
  }

  /** Attach to the stream via the native connector. The result has
    * the connector's record schema (`data` binary among
    * `partitionKey`/`sequenceNumber`/`approximateArrivalTimestamp`) —
    * feed it straight to [[LogStream.parse]].
    */
  def readStream(spark: SparkSession, args: KinesisArgs, format: String = Format): DataFrame =
    options(args).foldLeft(spark.readStream.format(format)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** File-source realization of the same starting-position semantics,
    * for environments without the connector (and for tests):
    *
    *  - LATEST → [[LogStream.attachLatest]] (snapshot-exclusion
    *    anti-join: only files that land after attach are read)
    *  - AT_TIMESTAMP → full listing; the time bound is applied to the
    *    parsed event time downstream, mirroring how AT_TIMESTAMP
    *    positions by server-side record time. Kinesis positions on
    *    *arrival* time, a file source has no arrival clock — the
    *    parsed `timestamp_ms` is the faithful stand-in and matches
    *    the batch r6_start_time semantics.
    *
    * `records` schema must include the `data` binary column that
    * [[LogStream.parse]] consumes.
    */
  def fileFallback(
      spark: SparkSession, path: String, schema: StructType,
      args: KinesisArgs): DataFrame = {
    val records = args.startTime match {
      case None => LogStream.attachLatest(spark, path, schema)
      case Some(_) => spark.readStream.schema(schema).parquet(path)
    }
    val parsed = LogStream.parse(records)
    args.startTime match {
      case None => parsed
      case Some(t) =>
        parsed.where(org.apache.spark.sql.functions.col("timestamp_ms") >= t.toEpochMilli)
    }
  }
}
