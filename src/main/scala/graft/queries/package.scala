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
    * `ts::TIMESTAMP` yields too).
    */
  def events(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

  /** Exact decimal cast used before sums so Spark and DuckDB agree
    * bit-for-bit (no fp associativity).
    */
  def dec(c: Column): Column = c.cast("decimal(18,4)")
}
