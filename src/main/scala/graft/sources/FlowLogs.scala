package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VPC flow-log line parsing — the domain payload the reference is
  * built for (reference: README.md "CLI Usage" shows the 14
  * extractedFields columns; tests/test_kinesis_logs_reader.py:49-56).
  *
  * A v2 flow-log line is 14 space-separated fields:
  * `version account-id interface-id srcaddr dstaddr srcport dstport
  * protocol packets bytes start end action log-status`.
  * On NODATA/SKIPDATA records the flow fields are `-` → typed NULLs.
  * Pure narrow column expressions: parses inside whole-stage codegen,
  * no UDF, no shuffle.
  */
object FlowLogs {

  val fieldNames: Seq[String] = Seq(
    "version", "account_id", "interface_id", "srcaddr", "dstaddr",
    "srcport", "dstport", "protocol", "packets", "bytes",
    "f_start", "f_end", "action", "log_status")

  /** Parse a space-separated flow-log line into a typed struct.
    * (`start`/`end` are exposed as `f_start`/`f_end`: both are SQL
    * reserved words downstream.)
    */
  def parseLine(line: Column): Column = {
    val parts = split(line, " ")
    def raw(i: Int): Column = {
      val p = parts.getItem(i)
      when(p === "-", lit(null)).otherwise(p)
    }
    struct(
      raw(0).cast("int").as("version"),
      raw(1).cast("long").as("account_id"),
      raw(2).as("interface_id"),
      raw(3).as("srcaddr"),
      raw(4).as("dstaddr"),
      raw(5).cast("int").as("srcport"),
      raw(6).cast("int").as("dstport"),
      raw(7).cast("int").as("protocol"),
      raw(8).cast("long").as("packets"),
      raw(9).cast("long").as("bytes"),
      raw(10).cast("long").as("f_start"),
      raw(11).cast("long").as("f_end"),
      raw(12).as("action"),
      raw(13).as("log_status"))
  }
}
