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

  /** Translate a Python-strptime format (what the reference's
    * --time-format accepts, __main__.py:44-47) to a java.time
    * pattern: the full directive set a datetime can carry (%Y %y %m
    * %d %H %I %M %S %f %j %p %a %A %b %B %z %Z %%), with literal
    * text quoted (a bare `T` is a pattern letter in java.time).
    * Locale-dependent week/locale directives (%U %W %w %c %x %X)
    * have no java.time equivalent and fail loudly instead of
    * mis-parsing.
    */
  private[cli] def strptimeToJava(fmt: String): String = {
    val map = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
      'f' -> "SSSSSS", 'j' -> "DDD", 'p' -> "a",
      'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
      'z' -> "xx", 'Z' -> "zzz")
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(c => c.isLetter || c == '\''))
        out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        if (d == '%') { lit.append('%'); i += 2 }
        else map.get(d) match {
          case Some(j) => flushLit(); out.append(j); i += 2
          case None => throw new IllegalArgumentException(
            s"unsupported strptime directive %$d in '$fmt'")
        }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }

  private[cli] def parseStartTimeMs(value: String, fmt: String): Long = {
    val f = DateTimeFormatter.ofPattern(strptimeToJava(fmt), java.util.Locale.US)
    val parsed = f.parse(value)
    // offset-aware formats (%z) carry their own zone; naive ones are
    // UTC, matching the reference's naive-UTC start_time
    if (parsed.isSupported(java.time.temporal.ChronoField.OFFSET_SECONDS))
      java.time.OffsetDateTime.from(parsed).toInstant.toEpochMilli
    else LocalDateTime.from(parsed).toInstant(ZoneOffset.UTC).toEpochMilli
  }

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
