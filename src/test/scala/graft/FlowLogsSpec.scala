package graft

import org.apache.spark.sql.functions._

import graft.sources.FlowLogs

/** Typed flow-log parsing, incl. the reference README's sample rows
  * (reference: README.md "CLI Usage").
  */
class FlowLogsSpec extends SparkSpec {
  import spark.implicits._

  test("parses a v2 ACCEPT line into typed fields") {
    val line = "2 12345678901 eni-25bed87f 192.0.2.1 198.51.100.1 123 123 17 3 228 1463236035 1463236181 ACCEPT OK"
    val row = Seq(line).toDF("line")
      .select(FlowLogs.parseLine($"line").as("f")).select("f.*").head()
    assert(row.getAs[Int]("version") === 2)
    assert(row.getAs[Long]("account_id") === 12345678901L)
    assert(row.getAs[String]("interface_id") === "eni-25bed87f")
    assert(row.getAs[String]("srcaddr") === "192.0.2.1")
    assert(row.getAs[Int]("protocol") === 17)
    assert(row.getAs[Long]("bytes") === 228L)
    assert(row.getAs[Long]("f_start") === 1463236035L)
    assert(row.getAs[String]("action") === "ACCEPT")
    assert(row.getAs[String]("log_status") === "OK")
  }

  test("NODATA line: '-' flow fields become typed NULLs") {
    val line = "2 12345678901 eni-25bed87f - - - - - - - 1463236035 1463236181 - NODATA"
    val row = Seq(line).toDF("line")
      .select(FlowLogs.parseLine($"line").as("f")).select("f.*").head()
    assert(row.getAs[String]("srcaddr") === null)
    assert(row.isNullAt(row.fieldIndex("srcport")))
    assert(row.isNullAt(row.fieldIndex("packets")))
    assert(row.getAs[String]("log_status") === "NODATA")
  }
}
