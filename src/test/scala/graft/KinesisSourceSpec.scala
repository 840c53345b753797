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

  test("k7: emitted option maps match the vendored connector option contract exactly") {
    // the contract table ships as a resource; this spec parses it and
    // pins the emitted keys against it BOTH ways, so a rename in the
    // code or an edit of the table fails here instead of silently
    // mis-optioning a production attach
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/kinesis-option-contract.md"), "UTF-8")
    val contract: Map[String, String] =
      try src.getLines().toList
        .filter(_.startsWith("| kinesis."))
        .map(_.split("\\|").map(_.trim).filter(_.nonEmpty))
        .map(a => a(0) -> a(1)).toMap
      finally src.close()
    assert(contract.nonEmpty, "vendored contract table missing or unparseable")

    val t = Instant.parse("2024-01-01T12:30:00Z")
    val latest = KinesisSource.options(KinesisArgs("s"))
    val latestFull = KinesisSource.options(KinesisArgs(
      "s", region = Some("us-east-1"), endpointUrl = Some("https://example.test")))
    val atTs = KinesisSource.options(KinesisArgs(
      "s", startTime = Some(t),
      region = Some("us-east-1"), endpointUrl = Some("https://example.test")))
    val atMs = KinesisSource.options(
      KinesisArgs("s", startTime = Some(t)), timestampAsEpochMillis = true)

    // no emitted key outside the contract, no contract row never emitted
    val allEmitted = latest.keySet ++ latestFull.keySet ++ atTs.keySet ++ atMs.keySet
    assert(allEmitted === contract.keySet,
      s"emitted/contract drift: only-emitted=${allEmitted -- contract.keySet} " +
        s"only-contract=${contract.keySet -- allEmitted}")
    // 'when' column semantics hold per form
    val always = contract.filter(_._2 == "always").keySet
    Seq(latest, latestFull, atTs, atMs).foreach(m =>
      assert(always.subsetOf(m.keySet), s"always-keys missing from $m"))
    assert(latestFull.contains("kinesis.region") && !latest.contains("kinesis.region"))
    assert(latestFull.contains("kinesis.endpointUrl") && !latest.contains("kinesis.endpointUrl"))
    contract.filter(_._2 == "at-timestamp-only").keySet.foreach { k =>
      assert(atTs.contains(k) && atMs.contains(k) && !latest.contains(k), k)
    }
    contract.filter(_._2 == "at-timestamp-datetime-only").keySet.foreach { k =>
      assert(atTs.contains(k) && !atMs.contains(k) && !latest.contains(k), k)
    }
    // pinned position values (the contract's value-form column)
    assert(latest("kinesis.startingPosition") === "LATEST")
    assert(atTs("kinesis.startingPosition") === "AT_TIMESTAMP")
  }
}
