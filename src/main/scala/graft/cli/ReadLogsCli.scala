package graft.cli

import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.operators.{Reader, Tsv}

/** CLI parity with the reference's `kinesis_logs_reader` entry point
  * (reference: __main__.py:27-60): read gzipped CWL payloads, print a
  * sorted-key TSV of extractedFields to stdout.
  *
  * The Kinesis stream name becomes a path to parquet holding the raw
  * records (binary `data` column) — the only part of the surface this
  * environment can't reach is the live AWS API itself.
  *
  * Usage: ReadLogsCli <records_path> [--start-time "2016-05-14 14:30:00"]
  *   [--count N] [--time-format "%Y-%m-%d %H:%M:%S"] [--data-col name]
  */
object ReadLogsCli {

  /** Translate the reference's Python-strptime codes (the subset its
    * default uses) to a java.time pattern.
    */
  private[cli] def strptimeToJava(fmt: String): String =
    fmt
      .replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")

  private[cli] def parseStartTimeMs(value: String, fmt: String): Long =
    LocalDateTime
      .parse(value, DateTimeFormatter.ofPattern(strptimeToJava(fmt)))
      .toInstant(ZoneOffset.UTC).toEpochMilli

  def main(args: Array[String]): Unit = {
    var path: Option[String] = None
    var startTime: Option[String] = None
    var timeFormat = "%Y-%m-%d %H:%M:%S" // reference default
    var count = 0                        // reference default: no limit
    var dataCol = "data"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--start-time" => startTime = Some(args(i + 1)); i += 2
        case "--count" => count = args(i + 1).toInt; i += 2
        case "--time-format" => timeFormat = args(i + 1); i += 2
        case "--data-col" => dataCol = args(i + 1); i += 2
        case p => path = Some(p); i += 1
      }
    }
    val records = path.getOrElse(
      sys.error("usage: ReadLogsCli <records_path> [--start-time ...] [--count N]"))

    val spark = SparkSession.getActiveSession.getOrElse(
      GraftSession.builder().getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.ensureRegistered(spark)

    val flat = Reader.readLogs(
      spark.read.parquet(records),
      dataCol = dataCol,
      startTimeMs = startTime.map(parseStartTimeMs(_, timeFormat)),
      takeN = if (count > 0) Some(count) else None)
    // toLocalIterator: stream partitions to the driver one at a time,
    // like the reference's row-at-a-time print loop — never collect()
    Tsv.render(flat).toLocalIterator().forEachRemaining(r => println(r.getString(0)))
  }
}
