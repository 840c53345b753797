package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Gzip

/** Parity with the reference's utils tests
  * (tests/test_kinesis_logs_reader.py:110-127).
  */
class CompressionSpec extends AnyFunSuite {

  // The reference's fixed gzip fixture: gunzip(gz) == b'Test data'.
  private val referenceGz: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x00, 0x4d, 0x98, 0x36, 0x57, 0x02, 0xff, 0x0b,
    0x49, 0x2d, 0x2e, 0x51, 0x48, 0x49, 0x2c, 0x49, 0x04, 0x00, 0x11,
    0x2c, 0xf9, 0x51, 0x09, 0x00, 0x00, 0x00).map(_.toByte)

  test("gunzip decodes the reference fixture") {
    assert(new String(Gzip.gunzip(referenceGz), UTF_8) === "Test data")
  }

  test("gzip/gunzip roundtrip on assorted payloads") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      "Test data".getBytes(UTF_8),
      Array.fill(1 << 20)(0x61.toByte)) ++
      (0 until 20).map(i => Array.fill(rnd.nextInt(10000))(rnd.nextInt().toByte))
    cases.foreach { bytes =>
      assert(Gzip.gunzip(Gzip.gzip(bytes)).toSeq === bytes.toSeq)
    }
  }

  test("r9: multi-member gzip decodes ALL members (Kinesis aggregation / Firehose concatenation parity)") {
    // Firehose and some producers CONCATENATE gzip members into one
    // record; Python's gzip.decompress (the reference's decode path,
    // utils.py:24-29) decodes every member. A decoder that stops at
    // the first member's trailer silently DROPS the tail — at 100 TB
    // that's invisible data loss, not an error. Pin the parity.
    val a = "first member ".getBytes(UTF_8)
    val b = "second member ".getBytes(UTF_8)
    val c = "third".getBytes(UTF_8)
    val concat = Gzip.gzip(a) ++ Gzip.gzip(b) ++ Gzip.gzip(c)
    assert(new String(Gzip.gunzip(concat), UTF_8)
      === "first member second member third")
    // the reference fixture concatenated with itself
    assert(new String(Gzip.gunzip(referenceGz ++ referenceGz), UTF_8)
      === "Test dataTest data")
  }

  test("zstd roundtrip preserves bytes and beats gzip on size for text") {
    import graft.functions.ZstdCodec
    val raw = ("the quick brown fox " * 500).getBytes("UTF-8")
    val z = ZstdCodec.compress(raw)
    assert(ZstdCodec.decompress(z).toSeq === raw.toSeq)
    assert(z.length < raw.length)
    val gz = graft.functions.Gzip.gzip(raw)
    assert(z.length <= gz.length * 2) // same ballpark; exact ratio is corpus-dependent
  }

  test("zstd expressions work as columns and in SQL") {
    val spark = GraftSession.builder(2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.ensureRegistered(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("payload-one", "payload-two").toDF("s")
      .withColumn("b", col("s").cast("binary"))
    val rt = df.withColumn("z", graft.functions.graft_zstd(col("b")))
      .withColumn("back", graft.functions.graft_unzstd(col("z")))
      .selectExpr("cast(back as string) AS s2", "cast(graft_unzstd(graft_zstd(b)) as string) AS s3", "s")
      .collect()
    rt.foreach { r =>
      assert(r.getString(0) === r.getString(2))
      assert(r.getString(1) === r.getString(2))
    }
  }
}
