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

  // --- k8/k9: KinesisSource.readStream through Spark's REAL source API ---
  // A test-scoped DSv2 stub (graft.testkit.FakeKinesisProvider) registers
  // as format "aws-kinesis" on the test classpath, so the one main-code
  // line the sandbox could never execute (KinesisSource.readStream's
  // format/option/load wiring) runs end-to-end: format resolution via
  // DataSourceRegister, option passing, micro-batch planning, multi-shard
  // partitions, and LogStream.parse downstream — both reference iterator
  // modes (kinesis_logs_reader.py:69-77) exercised and row-matched
  // against the fileFallback realization on the same fixture.

  /** 6 DATA_MESSAGE batches (3 events each, 2 shards, batch b's events
    * all stamped at its arrival minute) + 1 CONTROL_MESSAGE, as
    * (data, partitionKey, sequenceNumber, arrival).
    */
  private lazy val cannedBase = Instant.parse("2024-03-01T00:00:00Z")
  private lazy val canned: IndexedSeq[graft.testkit.FakeKinesis.Rec] = {
    import scala.jdk.CollectionConverters._
    val batches = (0 until 6).map { b =>
      val arrival = cannedBase.plusSeconds(60L * b)
      val evs = (0 until 3).map(j => Map(
        "id" -> s"$b-$j", "timestamp" -> arrival.toEpochMilli,
        "message" -> s"msg-$b-$j", "event_type" -> s"t$b"))
      (b, arrival, evs)
    }
    val rows = batches.map { case (b, arrival, evs) =>
      org.apache.spark.sql.Row(
        b, java.sql.Timestamp.from(arrival),
        evs.map(e => org.apache.spark.sql.Row(
          e("id").asInstanceOf[String], e("timestamp").asInstanceOf[Long],
          e("message").asInstanceOf[String],
          Map("event_type" -> e("event_type").asInstanceOf[String]))))
    }
    val evSchema = StructType(Seq(
      StructField("id", StringType), StructField("timestamp", LongType),
      StructField("message", StringType),
      StructField("extractedFields", MapType(StringType, StringType))))
    val df = spark.createDataFrame(
      rows.asJava,
      StructType(Seq(
        StructField("batch", IntegerType), StructField("arrival", TimestampType),
        StructField("logEvents", org.apache.spark.sql.types.ArrayType(evSchema)))))
    val data = df
      .select(col("batch"),
        CloudWatchLogs.encodePayload(lit(CloudWatchLogs.DataMessage), col("logEvents")).as("data"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("data")).toMap
    val control = spark.range(1)
      .select(CloudWatchLogs.encodePayload(
        lit(CloudWatchLogs.ControlMessage),
        array(struct(lit("c-0").as("id"), lit(cannedBase.toEpochMilli).as("timestamp"),
          lit("healthcheck").as("message"),
          map(lit("event_type"), lit("control")).as("extractedFields")))).as("data"))
      .head().getAs[Array[Byte]]("data")
    (0 until 6).map { b =>
      graft.testkit.FakeKinesis.Rec(
        data(b), s"shard-${b % 2}", f"seq-$b%04d", cannedBase.plusSeconds(60L * b))
    } :+ graft.testkit.FakeKinesis.Rec(
      // control message arrives mid-stream: served by the source in
      // both modes' ranges, dropped by parse's DATA_MESSAGE filter
      control, "shard-0", "seq-ctrl", cannedBase.plusSeconds(60L * 4 + 30))
  }

  private def drainParsed(parsed: org.apache.spark.sql.DataFrame, name: String): Set[(String, Long, String, String)] = {
    val q = parsed.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    spark.table(name)
      .select(col("log_id"), col("timestamp_ms"), col("message"),
        col("fields")("event_type").as("et"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
  }

  test("k8: LATEST attach via .readStream.format(aws-kinesis) serves only post-attach records, end-to-end through the DSv2 API") {
    import graft.testkit.FakeKinesis
    FakeKinesis.records = canned
    FakeKinesis.attachInstant = cannedBase.plusSeconds(60L * 3) // after batch 3
    val got = drainParsed(
      LogStream.parse(KinesisSource.readStream(spark, KinesisArgs("flowlog-stream"))),
      "k8_out")
    // the stub really saw KinesisSource.options' emitted map
    assert(FakeKinesis.lastOptions("kinesis.startingPosition") === "LATEST")
    assert(FakeKinesis.lastOptions("kinesis.streamName") === "flowlog-stream")
    // batches 4-5 only (post-attach), control dropped by the parse filter
    val expected = (4 to 5).flatMap(b => (0 until 3).map(j =>
      (s"$b-$j", cannedBase.plusSeconds(60L * b).toEpochMilli, s"msg-$b-$j", s"t$b"))).toSet
    assert(got === expected)

    // row-match the fileFallback realization on the same fixture:
    // backlog lands pre-attach, batches 4-5 + control land after
    val dir = Files.createTempDirectory("graft_kinesis_dsv2_latest").toString
    def writeRecs(idxs: Seq[Int], mode: String): Unit = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        idxs.map(i => org.apache.spark.sql.Row(canned(i).data)).asJava, recordSchema)
        .write.mode(mode).parquet(dir)
    }
    writeRecs(0 to 3, "overwrite")
    val parsed = KinesisSource.fileFallback(spark, dir, recordSchema, KinesisArgs("s"))
    val q = parsed.writeStream.format("memory").queryName("k8_ff").outputMode("append").start()
    val ff =
      try {
        q.processAllAvailable()
        writeRecs(4 to 6, "append")
        q.processAllAvailable()
        spark.table("k8_ff")
          .select(col("log_id"), col("timestamp_ms"), col("message"),
            col("fields")("event_type").as("et"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      } finally q.stop()
    assert(ff === got, "DSv2 LATEST attach and fileFallback LATEST diverged on the same fixture")
  }

  test("k9: AT_TIMESTAMP attach via .readStream.format(aws-kinesis) positions from the emitted options and row-matches fileFallback") {
    import graft.testkit.FakeKinesis
    FakeKinesis.records = canned
    FakeKinesis.attachInstant = Instant.EPOCH
    val cutoff = cannedBase.plusSeconds(60L * 3) // batch 3's arrival/event time
    val got = drainParsed(
      LogStream.parse(KinesisSource.readStream(
        spark, KinesisArgs("flowlog-stream", startTime = Some(cutoff)))),
      "k9_out")
    // the stub parsed the emitted timestamp with the emitted format
    assert(FakeKinesis.lastOptions("kinesis.startingPosition") === "AT_TIMESTAMP")
    assert(FakeKinesis.lastOptions.contains("kinesis.startingPosition.timestampFormat"))
    val expected = (3 to 5).flatMap(b => (0 until 3).map(j =>
      (s"$b-$j", cannedBase.plusSeconds(60L * b).toEpochMilli, s"msg-$b-$j", s"t$b"))).toSet
    assert(got === expected)

    // same fixture through fileFallback's AT_TIMESTAMP realization
    // (events are stamped at their batch's arrival, so arrival-time
    // positioning and parsed-time filtering select the same rows)
    val dir = Files.createTempDirectory("graft_kinesis_dsv2_atts").toString
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      canned.indices.map(i => org.apache.spark.sql.Row(canned(i).data)).asJava, recordSchema)
      .write.mode("overwrite").parquet(dir)
    val parsed = KinesisSource.fileFallback(
      spark, dir, recordSchema, KinesisArgs("s", startTime = Some(cutoff)))
    val q = parsed.writeStream.format("memory").queryName("k9_ff").outputMode("append").start()
    val ff =
      try {
        q.processAllAvailable()
        spark.table("k9_ff")
          .select(col("log_id"), col("timestamp_ms"), col("message"),
            col("fields")("event_type").as("et"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      } finally q.stop()
    assert(ff === got, "DSv2 AT_TIMESTAMP attach and fileFallback diverged on the same fixture")
    // multi-shard: the DSv2 scan planned one partition per shard key
    assert(canned.map(_.partitionKey).distinct.size === 2)
  }
}
