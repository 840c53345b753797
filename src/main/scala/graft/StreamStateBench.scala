package graft

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.LogStream

/** Streaming STATE-SIZE scale evidence (the streaming twin of
  * IngestGateBench): the stateful st-rows claim O(1) / O(k) / O(dim)
  * state PER KEY regardless of stream length, and their parity specs
  * pin that at fixture scale only. This main drives each claimant at
  * 1×/10×/100× events-per-key with a FIXED key count, reads the
  * state store's own receipts from StreamingQueryProgress
  * (`stateOperators.numRowsTotal` / `memoryUsedBytes`), and asserts:
  *
  *   - state ROWS stay exactly at (or under, for the draining st29)
  *     the key count at every scale — state row count tracks KEYS,
  *     never stream length;
  *   - state MEMORY at 100× stays within a small slack of 1× — the
  *     per-key payload is genuinely bounded (Welford triples, KMV's
  *     ≤k hashes, the drift centroid's dim doubles, ffill's carry),
  *     not an accumulating history.
  *
  * st30's input saturates KMV's k well inside the 1× run so the
  * memory comparison tests the cap, not the fill phase. st29's
  * interval stream advances event time steadily, so islands close
  * against the watermark as they would in production; its state is
  * bounded by open-islands-per-watermark-window, and the final
  * sentinel drains to (near) zero.
  *
  * Emits one JSON line (and writes it to the artifact path in
  * args(0), default STREAM_STATE.json): per operator × scale the
  * input rows, state rows, and state memory, plus the verdict
  * booleans the round notes cite.
  */
object StreamStateBench {

  final case class Obs(scale: Int, rowsIn: Long, stateRows: Long, stateMem: Long)

  private def lastStateMetrics(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
    val p = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .getOrElse(throw new IllegalStateException(
        s"no stateOperators progress for ${q.name}"))
    (p.stateOperators.map(_.numRowsTotal).sum,
      p.stateOperators.map(_.memoryUsedBytes).sum)
  }

  /** Run one operator at one scale: write the input in two parquet
    * deliveries (state must carry across micro-batches, as in the
    * parity specs), stream it through `build`, return the final
    * state receipts.
    */
  private def run(
      spark: SparkSession, name: String, scale: Int,
      schema: StructType, firstHalf: DataFrame, secondHalf: DataFrame,
      build: DataFrame => DataFrame,
      sentinel: Option[DataFrame] = None): Obs = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ssb_$name").toString
    firstHalf.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
    val in = spark.readStream.schema(schema).parquet(dir)
    val qn = s"ssb_${name}_$scale"
    val q = build(in).writeStream.format("noop").queryName(qn)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft_ssb_ckpt_$name").toString)
      .outputMode("append").start()
    val n =
      try {
        q.processAllAvailable()
        secondHalf.coalesce(1).write.mode(SaveMode.Append).parquet(dir)
        q.processAllAvailable()
        sentinel.foreach { s =>
          s.coalesce(1).write.mode(SaveMode.Append).parquet(dir)
          q.processAllAvailable()
        }
        firstHalf.count() + secondHalf.count()
      } finally ()
    val (rows, mem) = lastStateMetrics(q)
    q.stop()
    Obs(scale, n, rows, mem)
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("STREAM_STATE.json")
    val spark = GraftSession.builder(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val keys = 100
    val scales = Seq(1, 10, 100)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Obs]]

    def split(df: DataFrame, tsCol: String): (DataFrame, DataFrame) = {
      val mid = df.agg((min(col(tsCol)) + (max(col(tsCol)) - min(col(tsCol))) / 2)
          .cast("long").as("m"))
        .head().getLong(0)
      (df.where(col(tsCol) < mid).localCheckpoint(),
        df.where(col(tsCol) >= mid).localCheckpoint())
    }

    // --- st25 anomaly: Welford triple per key ---------------------------
    results("st25_anomaly") = scales.map { sc =>
      val n = 20 * sc
      val df = spark.range(keys).select(col("id").as("u"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(col("u").as("userId"), (col("i") * 1000 + col("u")).as("tsNs"),
          ((col("i") % 7) * 0.5).as("value"))
      val (a, b) = split(df, "tsNs")
      run(spark, "st25", sc, StructType(Seq(
        StructField("userId", LongType), StructField("tsNs", LongType),
        StructField("value", DoubleType))), a, b,
        in => LogStream.anomalyFlags(in.as[LogStream.ValueIn]).toDF)
    }

    // --- st30 kmv: ≤k smallest hashes per key (saturated at 1×) ---------
    results("st30_kmv") = scales.map { sc =>
      val n = 200 * sc // k = 64: saturated from scale 1 on
      val df = spark.range(keys).select(col("id").as("u"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(concat(lit("k"), col("u")).as("key"),
          (col("u") * 1000000000L + col("i")).as("element"),
          (col("i")).as("ord"))
      val (a, b) = split(df, "ord")
      run(spark, "st30", sc, StructType(Seq(
        StructField("key", StringType), StructField("element", LongType),
        StructField("ord", LongType))), a.drop("ord"), b.drop("ord"),
        in => LogStream.streamKmv(in.as[LogStream.KmvIn]).toDF)
    }

    // --- st31 ewma: 4 numbers per key -----------------------------------
    results("st31_ewma") = scales.map { sc =>
      val n = 20 * sc
      val df = spark.range(keys).select(col("id").as("u"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(col("u").as("userId"), (col("i") * 3600000L + col("u")).as("tsMs"),
          (col("i") * 1000 + col("u")).as("eventId"), ((col("i") % 5) * 1.0).as("value"))
      val (a, b) = split(df, "tsMs")
      run(spark, "st31", sc, StructType(Seq(
        StructField("userId", LongType), StructField("tsMs", LongType),
        StructField("eventId", LongType), StructField("value", DoubleType))), a, b,
        in => LogStream.streamEwma(in.as[LogStream.EwmaIn]).toDF)
    }

    // --- st33 drift: O(dim) centroid sum per label ----------------------
    results("st33_drift") = scales.map { sc =>
      val dim = 64
      val n = 10 * sc
      val ref = (0 until keys).map(l =>
        l -> Array.tabulate(dim)(j => if (j == l % dim) 1.0 else 0.0)).toMap
      val df = spark.range(keys).select(col("id").cast("int").as("label"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(col("label"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => when(j === col("label") % dim, 1.0f).otherwise(0.0f)).as("vec"),
          col("i").as("ord"))
      val (a, b) = split(df, "ord")
      run(spark, "st33", sc, StructType(Seq(
        StructField("label", IntegerType),
        StructField("vec", ArrayType(FloatType)),
        StructField("ord", LongType))), a.drop("ord"), b.drop("ord"),
        in => LogStream.streamDrift(in.as[LogStream.DriftIn], ref).toDF)
    }

    // --- st34 trend: six Welford/co-moment numbers per key --------------
    results("st34_trend") = scales.map { sc =>
      val n = 20 * sc
      val df = spark.range(keys).select(col("id").as("u"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(concat(lit("k"), col("u")).as("key"),
          (lit(1704067200000L) + col("i") * 60000 + col("u")).as("tsMs"),
          (col("i") * 2.0 + col("u")).as("value"))
      val (a, b) = split(df, "tsMs")
      run(spark, "st34", sc, StructType(Seq(
        StructField("key", StringType), StructField("tsMs", LongType),
        StructField("value", DoubleType))), a, b,
        in => LogStream.streamTrend(in.as[LogStream.TrendIn]).toDF)
    }

    // --- st41 ffill: grid cursor + carry + open run per key -------------
    results("st41_ffill") = scales.map { sc =>
      val n = 20 * sc
      val step = 86400000L
      val df = spark.range(keys).select(col("id").as("u"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(col("u").as("userId"),
          (col("i") * (step / 4) + col("u")).as("tsMs"),
          (col("i") * 1000 + col("u")).as("eventId"),
          ((col("i") % 9) * 1.0).as("value"), lit(false).as("heartbeat"))
      val (a, b) = split(df, "tsMs")
      run(spark, "st41", sc, StructType(Seq(
        StructField("userId", LongType), StructField("tsMs", LongType),
        StructField("eventId", LongType), StructField("value", DoubleType),
        StructField("heartbeat", BooleanType))), a, b,
        in => LogStream.streamFfill(in.as[LogStream.FfillIn]).toDF)
    }

    // --- st42 funnel: two scalars per key -------------------------------
    results("st42_funnel") = scales.map { sc =>
      val n = 20 * sc
      val df = spark.range(keys).select(col("id").as("u"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(col("u").as("userId"),
          (col("i") * 1000000000L + col("u")).as("tsNs"),
          when(col("i") === 0, "click").otherwise("view").as("eventType"))
      val (a, b) = split(df, "tsNs")
      run(spark, "st42", sc, StructType(Seq(
        StructField("userId", LongType), StructField("tsNs", LongType),
        StructField("eventType", StringType))), a, b,
        in => LogStream.streamFunnel(in.as[LogStream.FunnelIn]).toDF)
    }

    // --- st29 islands: open islands per watermark window, drains -------
    results("st29_islands") = scales.map { sc =>
      val n = 20 * sc
      val df = spark.range(keys).select(col("id").as("u"))
        .crossJoin(spark.range(n).select(col("id").as("i")))
        .select(col("u").as("userId"),
          (col("i") * 10000L + col("u")).as("startMs"),
          (col("i") * 10000L + col("u") + 500L).as("endMs"))
        .withColumn("eventTime", timestamp_millis(col("startMs")))
      val (a, b) = split(df, "startMs")
      val far = (n + 1000L) * 10000L
      val sentinel = Seq((99999L, far, far + 1L), (99999L, far + 7200000L, far + 7200001L))
        .toDF("userId", "startMs", "endMs")
        .withColumn("eventTime", timestamp_millis(col("startMs")))
      run(spark, "st29", sc, StructType(Seq(
        StructField("userId", LongType), StructField("startMs", LongType),
        StructField("endMs", LongType), StructField("eventTime", TimestampType))), a, b,
        in => LogStream.intervalUnionExpiring(
          in.withWatermark("eventTime", "1 second").as[LogStream.IntervalIn]).toDF,
        sentinel = Some(sentinel))
    }

    // --- verdicts -------------------------------------------------------
    val perKeyOps = Seq("st25_anomaly", "st30_kmv", "st31_ewma", "st33_drift",
      "st34_trend", "st41_ffill", "st42_funnel")
    val flatRows = perKeyOps.forall(op => results(op).forall(_.stateRows == keys))
    // st29 drains: after the sentinel the only state rows are the
    // sentinel key's open island (≤ a handful), never O(stream)
    val st29Bounded = results("st29_islands").forall(_.stateRows <= keys + 1)
    val memSlack = 1.5
    val memBounded = (perKeyOps :+ "st29_islands").forall { op =>
      val obs = results(op)
      obs.last.stateMem <= (obs.head.stateMem * memSlack).toLong + 4096
    }

    val json = new StringBuilder
    json.append("{\"metric\":\"stream_state\",\"keys\":").append(keys)
      .append(",\"scales\":[").append(scales.mkString(",")).append("]")
      .append(",\"flat_state_rows\":").append(flatRows)
      .append(",\"st29_bounded\":").append(st29Bounded)
      .append(",\"mem_bounded_slack_1p5x\":").append(memBounded)
      .append(",\"ops\":{")
    json.append(results.map { case (op, obs) =>
      s""""$op":[""" + obs.map(o =>
        s"""{"scale":${o.scale},"rows_in":${o.rowsIn},"state_rows":${o.stateRows},"state_mem_bytes":${o.stateMem}}""")
        .mkString(",") + "]"
    }.mkString(","))
    json.append("}}")
    println(json.toString)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      json.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    require(flatRows, "state rows grew with stream length on a per-key O(1) operator")
    require(st29Bounded, "st29 state rows exceeded the open-island bound")
    require(memBounded, "state memory at 100x exceeded 1.5x the 1x footprint")
    spark.stop()
  }
}
