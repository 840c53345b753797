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
}
