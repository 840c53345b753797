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
}
