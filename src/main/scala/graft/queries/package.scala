package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-facing query catalog. */
package object queries {
  /** Query: (session, sf-dir) → result DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's events table carries TIMESTAMP(NANOS), which Spark 4
    // rejects by default; read nanos as long and convert explicitly.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with ts normalized: ts_ns (long), ts_ms (long, floored),
    * ts (TimestampType, microsecond precision — what DuckDB's
    * `ts::TIMESTAMP` yields too). Adapts to either physical schema the
    * driver has generated: INT64 epoch-nanos (read as long via
    * nanosAsLong) or timestamp[us] (naive = UTC wall clock; the
    * session timezone is pinned to UTC everywhere, so the NTZ→LTZ
    * cast is instant-preserving and agrees with DuckDB's epoch_ns on
    * a naive TIMESTAMP).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = table(s, dir, "events")
    val tsAsNs: Column = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    }
    // keep ts_ns in ts's original column position, ts_ms/ts appended —
    // the exact shape the int64-nanos path has always produced
    raw.select(raw.columns.map {
        case "ts" => tsAsNs.as("ts_ns")
        case c    => col(c)
      }.toSeq: _*)
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Exact decimal cast used before sums so Spark and DuckDB agree
    * bit-for-bit (no fp associativity).
    */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** DuckDB replay of graft_simhash64 over a `(id, tok)` relation
    * named `tk`: per-token 64-bit hash = first 16 hex chars of
    * md5(tok) as two 32-bit halves (SimHashOps.hash64 takes the first
    * 8 digest bytes big-endian, so the halves line up exactly), then
    * +1/-1 votes per bit position, sign → nibble → uppercase
    * 16-hex-digit fingerprint column `simhash` keyed by `id`.
    */
  val simhashReplaySql: String =
    """h AS (
      |  SELECT id,
      |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
      |    ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
      |  FROM tk
      |), bits AS (
      |  SELECT id, bb.b AS b,
      |    sum(CASE WHEN ((CASE WHEN bb.b < 32 THEN lo ELSE hi END >> (bb.b % 32)) & 1) = 1
      |        THEN 1 ELSE -1 END) AS v
      |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
      |  GROUP BY 1, 2
      |), nibs AS (
      |  SELECT id, b // 4 AS nib,
      |    sum(CASE WHEN v > 0 THEN 1 << (b % 4) ELSE 0 END) AS nv
      |  FROM bits GROUP BY 1, 2
      |), fp AS (
      |  SELECT id,
      |    string_agg(substr('0123456789ABCDEF', (nv + 1)::INT, 1), '' ORDER BY nib DESC) AS simhash
      |  FROM nibs GROUP BY id
      |)""".stripMargin
}
