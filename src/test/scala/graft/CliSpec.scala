package graft.cli

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {
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
