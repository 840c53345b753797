package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.events
import graft.sources.{CloudWatchLogs, KinesisSource}
import graft.sources.KinesisSource.KinesisArgs
import graft.streaming.LogStream

/** Kinesis connector option shim: the reference's constructor
  * arguments (stream_name, start_time, client kwargs —
  * kinesis_logs_reader.py:23-32, 60-77) mapped to connector options,
  * plus the file-source realization of both starting positions.
  */
class KinesisSourceSpec extends SparkSpec {

  private lazy val payloadDir: String = {
    GraftSession.ensureRegistered(spark)
    val dir = Files.createTempDirectory("graft_kinesis").toString
    events(spark, sf)
      .select(
        expr("event_id div 100").as("batch"),
        struct(
          col("event_id").cast("string").as("id"),
          col("ts_ms").as("timestamp"),
          lit("").as("message"),
          map(lit("event_type"), col("event_type")).as("extractedFields")).as("ev"))
      .groupBy("batch")
      .agg(collect_list("ev").as("logEvents"))
      .select(CloudWatchLogs.encodePayload(
        lit(CloudWatchLogs.DataMessage), col("logEvents")).as("data"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private val recordSchema = StructType(Seq(StructField("data", BinaryType)))

  test("k1: default (no start_time) maps to LATEST, like the reference's default iterator") {
    val opts = KinesisSource.options(KinesisArgs("flowlog-stream"))
    assert(opts("kinesis.streamName") === "flowlog-stream")
    assert(opts("kinesis.startingPosition") === "LATEST")
    assert(!opts.contains("kinesis.startingPosition.timestamp"))
    assert(!opts.contains("kinesis.region"))
  }

  test("k2: start_time maps to AT_TIMESTAMP as formatted UTC + explicit format") {
    val t = Instant.parse("2024-01-01T12:30:00Z")
    val opts = KinesisSource.options(
      KinesisArgs("s", startTime = Some(t),
        region = Some("us-east-1"), endpointUrl = Some("https://example.test")))
    assert(opts("kinesis.startingPosition") === "AT_TIMESTAMP")
    assert(opts("kinesis.startingPosition.timestamp") === "2024-01-01T12:30:00.000Z")
    assert(opts("kinesis.startingPosition.timestampFormat") === KinesisSource.AtTimestampPattern)
    // the emitted value round-trips through the emitted pattern
    val parsed = java.time.format.DateTimeFormatter
      .ofPattern(opts("kinesis.startingPosition.timestampFormat"))
      .withZone(java.time.ZoneOffset.UTC)
      .parse(opts("kinesis.startingPosition.timestamp"), Instant.from(_))
    assert(parsed === t)
    assert(opts("kinesis.region") === "us-east-1")
    assert(opts("kinesis.endpointUrl") === "https://example.test")
  }

  test("k2b: epoch-millis spelling for connector builds that take millis") {
    val t = Instant.parse("2024-01-01T12:30:00Z")
    val opts = KinesisSource.options(
      KinesisArgs("s", startTime = Some(t)), timestampAsEpochMillis = true)
    assert(opts("kinesis.startingPosition") === "AT_TIMESTAMP")
    assert(opts("kinesis.startingPosition.timestamp") === t.toEpochMilli.toString)
    assert(!opts.contains("kinesis.startingPosition.timestampFormat"))
  }

  test("k3: empty stream name is rejected") {
    intercept[IllegalArgumentException](KinesisSource.options(KinesisArgs("")))
  }

  test("k4: LATEST file fallback reads only records landing after attach") {
    val dir = Files.createTempDirectory("graft_kinesis_latest").toString
    val payloads = spark.read.parquet(payloadDir)
    payloads.write.mode("overwrite").parquet(dir) // pre-attach backlog
    val parsed = KinesisSource.fileFallback(spark, dir, recordSchema, KinesisArgs("s"))
    val q = parsed.writeStream
      .format("memory").queryName("k4_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("k4_out").count() === 0)
      payloads.write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("k4_out").count() === events(spark, sf).count())
  }

  test("k5: AT_TIMESTAMP file fallback replays from the given time, like batch r6_start_time") {
    val cutoffMs = events(spark, sf)
      .agg(expr("percentile(ts_ms, 0.5)")).head().getDouble(0).toLong
    val parsed = KinesisSource.fileFallback(
      spark, payloadDir, recordSchema,
      KinesisArgs("s", startTime = Some(Instant.ofEpochMilli(cutoffMs))))
    val q = parsed.writeStream
      .format("memory").queryName("k5_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val expected = events(spark, sf).where(col("ts_ms") >= cutoffMs).count()
    assert(expected > 0)
    assert(spark.table("k5_out").count() === expected)
  }

  test("k6: attachLatest excludes the backlog via an anti-join, not a giant In literal") {
    val dir = Files.createTempDirectory("graft_kinesis_plan").toString
    spark.read.parquet(payloadDir).write.mode("overwrite").parquet(dir)
    val nFiles = new java.io.File(dir).listFiles().count(f =>
      f.isFile && f.getName.startsWith("part-"))
    assert(nFiles > 0)
    val plan = LogStream.attachLatest(spark, dir, recordSchema)
      .queryExecution.logical.toString
    assert(plan.contains("Join LeftOuter"), s"expected a snapshot join in:\n$plan")
    assert(!plan.contains(" IN ("), s"file-name In literal leaked into:\n$plan")
  }
}
