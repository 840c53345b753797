package graft.cli

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {

  test("e2e: gzipped-CWL fixture through main — byte-exact sorted-key TSV with --start-time and --count") {
    import org.apache.spark.sql.functions._
    val spark = graft.GraftSession.builder(4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.ensureRegistered(spark)
    import spark.implicits._
    // 10 flow-log events, one per minute, split across two payload
    // rows (the two-shard shape); every field value is derivable by
    // hand so the expected bytes are written out literally below
    val t0 = 1709251200000L // 2024-03-01 00:00:00 UTC
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_e2e").toString
    (1 to 10).map(i => (i, t0 + i * 60000L)).toDF("i", "ts")
      .select(
        struct(
          format_string("ev%02d", col("i")).as("id"),
          col("ts").as("timestamp"),
          lit("").as("message"),
          map(
            lit("srcaddr"), format_string("192.168.0.%d", col("i")),
            lit("dstaddr"), format_string("10.0.0.%d", col("i")),
            lit("action"), when(col("i") % 2 === 0, "ACCEPT").otherwise("REJECT")
          ).as("extractedFields")).as("ev"),
        (col("i") % 2).as("shard"))
      .groupBy("shard").agg(collect_list("ev").as("logEvents"))
      .select(graft.sources.CloudWatchLogs.encodePayload(
        lit(graft.sources.CloudWatchLogs.DataMessage), col("logEvents")).as("data"))
      .write.mode("overwrite").parquet(dir)
    // the reference's CLI contract (__main__.py:10-24): sorted-key
    // header, tab-joined values, --start-time drops events before
    // 00:04, --count stops after 4
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      ReadLogsCli.main(Array(dir,
        "--start-time", "2024-03-01 00:04:00",
        "--count", "4"))
    }
    spark.sparkContext.setLogLevel("ERROR") // main sets WARN; restore
    val expected = Seq(
      "action\tdstaddr\tsrcaddr",
      "ACCEPT\t10.0.0.4\t192.168.0.4",
      "REJECT\t10.0.0.5\t192.168.0.5",
      "ACCEPT\t10.0.0.6\t192.168.0.6",
      "REJECT\t10.0.0.7\t192.168.0.7").mkString("", "\n", "\n")
    assert(out.toString("UTF-8") === expected)
  }
  test("strptime codes translate to java.time patterns") {
    assert(ReadLogsCli.strptimeToJava("%Y-%m-%d %H:%M:%S") === "yyyy-MM-dd HH:mm:ss")
  }

  test("start-time parses with the reference's default format, UTC") {
    assert(ReadLogsCli.parseStartTimeMs("2016-05-14 14:30:00", "%Y-%m-%d %H:%M:%S")
      === 1463236200000L)
  }

  test("custom time format (reference --time-format)") {
    assert(ReadLogsCli.parseStartTimeMs("14/05/2016 14:30", "%d/%m/%Y %H:%M")
      === 1463236200000L)
  }

  // 2016-05-14 14:30:00 UTC
  private val T = 1463236200000L

  test("full strptime directive table") {
    val cases = Seq(
      ("16-135 02:30:00 PM", "%y-%j %I:%M:%S %p", T),          // %y %j %I %p
      ("2016-05-14 16:30:00 +0200", "%Y-%m-%d %H:%M:%S %z", T), // %z offset
      ("May 14 2016 14:30:00.250000", "%b %d %Y %H:%M:%S.%f", T + 250L), // %b %f
      ("Sat May 14 14:30:00 2016", "%a %b %d %H:%M:%S %Y", T),  // %a %b
      ("Saturday 14 May 2016 14:30", "%A %d %B %Y %H:%M", T),   // %A %B
      ("2016-05-14T14:30:00", "%Y-%m-%dT%H:%M:%S", T))          // literal T quoted
    cases.foreach { case (value, fmt, want) =>
      assert(ReadLogsCli.parseStartTimeMs(value, fmt) === want, s"$fmt on $value")
    }
  }

  test("%% is a literal percent; unsupported directives fail loudly") {
    assert(ReadLogsCli.strptimeToJava("%H%%%M") === "HH%mm")
    assert(ReadLogsCli.parseStartTimeMs("2016-05-14 14%30", "%Y-%m-%d %H%%%M") === T)
    intercept[IllegalArgumentException](ReadLogsCli.strptimeToJava("%Y week %U"))
  }

  // expected values below confirmed against CPython's
  // datetime.strptime (naive → UTC), the reference's parser
  test("week-number directives %U/%W/%w parse with Python semantics") {
    val cases = Seq(
      // Sunday-start weeks: week 19 of 2016 starts Sun May 8; w=6 → Sat May 14
      ("2016 19 6 14:30:00", "%Y %U %w %H:%M:%S", T),
      // Monday-start weeks: week 19 starts Mon May 9; w=6 → Sat May 14
      ("2016 19 6 14:30:00", "%Y %W %w %H:%M:%S", T),
      // w=0 (Sunday) is the FIRST day of a %U week...
      ("2016 19 0", "%Y %U %w", 1462665600000L),  // Sun May 8, midnight
      // ...but the LAST day of a %W week
      ("2016 19 0", "%Y %W %w", 1463270400000L),  // Sun May 15, midnight
      // days before the first Sunday are week 0
      ("2016 0 5 12:00:00", "%Y %U %w %H:%M:%S", 1451649600000L)) // Fri Jan 1
    cases.foreach { case (value, fmt, want) =>
      assert(ReadLogsCli.parseStartTimeMs(value, fmt) === want, s"$fmt on $value")
    }
  }

  test("locale directives %c/%x/%X expand to their C-locale forms") {
    assert(ReadLogsCli.parseStartTimeMs("Sat May 14 14:30:00 2016", "%c") === T)
    assert(ReadLogsCli.parseStartTimeMs("05/14/16 14:30:00", "%x %X") === T)
  }

  test("date-only formats default to midnight like Python") {
    assert(ReadLogsCli.parseStartTimeMs("2016-05-14", "%Y-%m-%d") === 1463184000000L)
  }
}
