package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles, sort-based.
  *
  * Spark's built-in `percentile` aggregate accumulates a value→count
  * map per group in executor memory — fine for low-cardinality
  * values, but on a 100 TB fact column the map IS the column, and the
  * aggregate buffer explodes. This operator computes the same exact
  * result with the machinery Spark already scales: one shuffle on the
  * group key, an external (spillable) sort per partition, and a
  * row_number window — then only the two boundary rows per
  * (group, percentile) survive into a tiny final aggregate.
  *
  * Interpolation matches `percentile` / DuckDB `quantile_cont`:
  * `lo + (hi - lo) * frac` at continuous index `(n-1) * p`.
  */
object Percentiles {

  /** One row per group: `p<NN>` columns (e.g. p50, p90) holding exact
    * interpolated percentiles of `valueCol`, plus `n_rows`.
    */
  def exact(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      ps: Seq[Double]): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(col("__v"))
    val ranked = df
      .select(groupCols.map(col) :+ col(valueCol).as("__v"): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
    // keep only rows that are a lo/hi boundary for some requested p
    val needed = ps.map { p =>
      val idx = (col("__n") - 1) * p
      col("__rn") === floor(idx) + 1 || col("__rn") === ceil(idx) + 1
    }.reduce(_ || _)
    // gather each p's boundary values, then interpolate with the
    // exact `lo + (hi - lo) * frac` form both Spark's percentile and
    // DuckDB's quantile_cont use (bit-identical doubles either way)
    val bounds = ps.flatMap { p =>
      val idx = (col("__n") - 1) * p
      Seq(
        max(when(col("__rn") === floor(idx) + 1, col("__v"))).as(s"__lo_${pName(p)}"),
        max(when(col("__rn") === ceil(idx) + 1, col("__v"))).as(s"__hi_${pName(p)}"))
    }
    val nRows = max(col("__n")).as("n_rows")
    val agged = ranked.where(needed)
      .groupBy(groupCols.map(col): _*)
      .agg(bounds.head, bounds.tail :+ nRows: _*)
    val interp = ps.map { p =>
      val idx = (col("n_rows") - 1) * p
      val frac = idx - floor(idx)
      val lo = col(s"__lo_${pName(p)}")
      val hi = coalesce(col(s"__hi_${pName(p)}"), lo) // idx integral → hi row may equal lo row
      (lo + (hi - lo) * frac).as(pName(p))
    }
    agged.select(groupCols.map(col) ++ interp :+ col("n_rows"): _*)
  }

  /** p=0.5 → "p50", p=0.99 → "p99", p=0.999 → "p999". */
  def pName(p: Double): String =
    "p" + BigDecimal(p * 100).underlying.stripTrailingZeros.toPlainString.replace(".", "_")
}
