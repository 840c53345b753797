package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization, batch form (the streaming twin is
  * graft.streaming.LogStream.sessionize).
  *
  * One shuffle on the session key; the lag/cumulative-sum windows run
  * inside the same partitioning, so adding executors scales linearly
  * in distinct keys.
  */
object Sessionize {

  /** Assign a session index per key: a new session starts when the
    * gap since the previous event exceeds `gapNs` (timestamps in
    * nanos). Adds `session_idx` (0-based per key, ordered by time).
    */
  def assign(
      df: DataFrame, keyCol: String, tsNsCol: String, gapNs: Long,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsNsCol), tieBreak)
    df
      .withColumn("_prev_ns", lag(tsNsCol, 1).over(w))
      .withColumn("_new_s",
        when(col("_prev_ns").isNull || col(tsNsCol) - col("_prev_ns") > gapNs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("_new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("_prev_ns", "_new_s")
  }

  /** Collapse to one row per (key, session): bounds + event count. */
  def summarize(
      df: DataFrame, keyCol: String, tsNsCol: String, gapNs: Long,
      tieBreak: Column): DataFrame =
    assign(df, keyCol, tsNsCol, gapNs, tieBreak)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsNsCol).as("s_start_ns"),
        max(tsNsCol).as("s_end_ns"))
}
