package graft

import org.apache.spark.sql.functions._

import graft.operators.{Reader, Tsv}
import graft.sources.CloudWatchLogs

/** Behavior parity with the reference's reader tests
  * (tests/test_kinesis_logs_reader.py:130-178): two shards, a control
  * message that must be dropped, all events surfaced exactly once;
  * plus start-time and --count semantics.
  */
class ReaderSpec extends SparkSpec {
  import spark.implicits._

  /** Mirror of the reference's GET_RECORDS fixture: shard-0001 carries
    * a CONTROL_MESSAGE and events 0,1 then 2,3; shard-0002 carries 4,5.
    */
  private lazy val fixtureRecords = {
    def dataMsg(ids: Seq[Int]) = (CloudWatchLogs.DataMessage, ids)
    val recs = Seq(
      ("shard-0001", CloudWatchLogs.ControlMessage, Seq.empty[Int]),
      ("shard-0001", dataMsg(Seq(0, 1))._1, Seq(0, 1)),
      ("shard-0001", dataMsg(Seq(2, 3))._1, Seq(2, 3)),
      ("shard-0002", dataMsg(Seq(4, 5))._1, Seq(4, 5)))
    recs.toDF("shard", "mt", "ids")
      .select($"shard", CloudWatchLogs.encodePayload($"mt",
        transform($"ids", i => struct(
          i.cast("string").as("id"),
          (lit(1463236035000L) + i * 1000L).as("timestamp"),
          lit("").as("message"),
          map(
            lit("srcaddr"), lit("192.0.2.1"),
            lit("srcport"), i.cast("string"),
            lit("dstaddr"), lit("198.51.100.1"),
            lit("dstport"), lit("443"),
            lit("protocol"), lit("6")).as("extractedFields")))).as("data"))
  }

  test("control messages are dropped; all shard events surface exactly once") {
    val flat = Reader.readLogs(fixtureRecords)
    val ids = flat.select($"log_id".cast("int")).as[Int].collect().sorted
    assert(ids === (0 to 5).toArray)
  }

  test("extractedFields keys and values roundtrip") {
    val row = Reader.readLogs(fixtureRecords)
      .where($"log_id" === "3").select($"fields").head()
    val fields = row.getMap[String, String](0)
    assert(fields("srcport") === "3")
    assert(fields("dstaddr") === "198.51.100.1")
  }

  test("start-time filters by event timestamp (AT_TIMESTAMP semantics)") {
    val flat = Reader.readLogs(fixtureRecords, startTimeMs = Some(1463236035000L + 3000L))
    assert(flat.select($"log_id".cast("int")).as[Int].collect().sorted === Array(3, 4, 5))
  }

  test("takeN returns the deterministic first N (--count semantics)") {
    val flat = Reader.readLogs(fixtureRecords, takeN = Some(2))
    assert(flat.select($"log_id".cast("int")).as[Int].collect().sorted === Array(0, 1))
  }

  test("tsv rendering: sorted-key header then tab-joined rows (CLI parity)") {
    val lines = Tsv.render(Reader.readLogs(fixtureRecords, takeN = Some(1)))
      .as[String].collect()
    assert(lines.head === "dstaddr\tdstport\tprotocol\tsrcaddr\tsrcport")
    assert(lines(1) === "198.51.100.1\t443\t6\t192.0.2.1\t0")
  }

  test("permissive mode drops corrupt gzip records instead of failing") {
    import org.apache.spark.sql.functions.lit
    val corrupt = Seq(Array[Byte](1, 2, 3)).toDF("data")
    val mixed = fixtureRecords.select($"data").unionAll(corrupt)
    intercept[Exception] {
      Reader.readLogs(mixed).count() // strict mode: reference behavior
    }
    val flat = Reader.readLogs(mixed, permissive = true)
    assert(flat.count() === 6) // all good events survive, bad record dropped
  }

  test("malformed (non-JSON) payloads yield no rows rather than failing") {
    GraftSession.ensureRegistered(spark)
    val junk = Seq("not json at all").toDF("s")
      .select(graft.functions.graft_gzip($"s".cast("binary")).as("data"))
    assert(Reader.readLogs(junk).count() === 0)
  }
}
