package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window shapes whose parallelism scales with DATA size instead of
  * the partition-key cardinality.
  *
  * A `Window.partitionBy(g)` over a low-cardinality `g` executes one
  * task per distinct key, no matter how many executors exist — top
  * tokens "per language" or running totals "per source" sort the
  * whole relation in a handful of tasks at 100 TB (the q15 ceiling,
  * measured 6.5× at 10× data before its range-parallel rewrite).
  * Both helpers here produce IDENTICAL results to the plain window
  * (spec-pinned), never materialize a per-key single-task sort over
  * the full relation, and stay deterministic under any input
  * partitioning.
  */
object ScalableWindow {

  /** Exact `row_number() <= k` per group under the total order
    * `orderCols`: each input partition first ranks ITS rows per
    * (partition, group) — parallel in the partition count — and keeps
    * its local top-k, then the global rank runs over the ≤ P·k
    * survivors per group (bounded by cluster width, never data).
    * Correct because a row in a group's global top-k is necessarily
    * in its partition's local top-k; exact ties must be broken by
    * `orderCols` (pass a total order), exactly as the plain window
    * requires for determinism anyway.
    */
  def cappedRowNumber(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      k: Int, rnCol: String): DataFrame = {
    val gCols = groupCols.map(col)
    val wLocal = Window.partitionBy(col("__pid") +: gCols: _*).orderBy(orderCols: _*)
    val wGlobal = Window.partitionBy(gCols: _*).orderBy(orderCols: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(wLocal))
      .where(col("__lrn") <= k)
      .withColumn(rnCol, row_number().over(wGlobal).cast("long"))
      .where(col(rnCol) <= k)
      .drop("__pid", "__lrn")
  }

  /** Exact EXCLUSIVE per-group running total of `valueCol` in
    * `orderCols` order (the `sum over rowsBetween(unboundedPreceding,
    * -1)` shape): range-partition by (group, order) so each task owns
    * a contiguous slice, cumsum locally, then lift to global totals
    * by adding per-(partition, group) sum offsets — a P×G-row
    * broadcast relation. `orderCols` must be a total order within
    * each group (the same requirement the plain window has for a
    * deterministic result); `groupCols` may be empty for a GLOBAL
    * running total — the shape a plain un-partitioned window would
    * execute in exactly one task regardless of cluster size.
    */
  def prefixSum(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      valueCol: Column, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val gCols = groupCols.map(col)
    // pid must be STABLE across the two consumers (the offsets pass
    // and the local-cumsum pass): both sit in one physical plan, so
    // Spark's exchange reuse feeds them the same shuffle output, and
    // the explicit partition count keeps AQE from re-coalescing
    // either read. Same shape (and same correctness argument) as
    // operators.Percentiles: this used to be a lazy localCheckpoint,
    // but storing the fact-sized relation through the block manager
    // costs a SizeEstimator object-graph walk per deserialized block
    // — profiled in r14 as the dominant cost of the Percentiles twin
    // at local[32]; the reused in-flight shuffle costs neither.
    // RUNTIME GUARD (same as Percentiles): without exchange reuse the
    // two materializations of the range shuffle would sample bounds
    // with different seeds and the per-pid offsets would silently
    // misalign — fall back to the checkpoint if reuse is disabled.
    val exchangeReuse =
      spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean
    val base0 = df
      .withColumn("__v", valueCol)
      .repartitionByRange(
        spark.sparkContext.defaultParallelism * 2,
        gCols ++ orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val base = if (exchangeReuse) base0 else base0.localCheckpoint(eager = false)
    val wLocal = Window.partitionBy(col("__pid") +: gCols: _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = base
      .groupBy(col("__pid") +: gCols: _*)
      .agg(sum(col("__v")).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .drop("__c")
    base
      .withColumn("__lcum", coalesce(sum(col("__v")).over(wLocal), lit(0L)))
      .join(broadcast(offs), "__pid" +: groupCols)
      .withColumn(outCol, col("__off") + col("__lcum"))
      .drop("__pid", "__lcum", "__off", "__v")
  }
}
