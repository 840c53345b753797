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
    // and the local-cumsum pass). Two regimes:
    //
    //  - FAST PATH (exchange reuse, the Percentiles r14 shape): both
    //    consumers sit in one physical plan, so when their range-
    //    exchange subtrees are IDENTICAL Spark materializes the
    //    shuffle once and the offsets pass reads a ReusedExchange —
    //    no block-manager materialization. Identical subtrees are
    //    only GUARANTEED when every column of `df` is referenced by
    //    the partitioning keys (gCols ++ orderCols): a column the
    //    offsets consumer does not need is otherwise PRUNED below its
    //    copy of the exchange (e.g. `[g,id,n, n AS __v]` vs
    //    `[g,id, n AS __v]`), the copies stop being equal, reuse does
    //    NOT fire, and the two independently-sampled range shuffles
    //    disagree on partition bounds — silently wrong offsets (caught
    //    by ScalableWindowSpec's any-partitioning parity rows, r18).
    //    Percentiles avoids this by construction (it pre-projects to
    //    exactly the partitioning columns); prefixSum must return the
    //    FULL row, so it can only take the fast path when the
    //    partitioning covers every column.
    //
    //  - CHECKPOINT PATH (everything else, and reuse disabled): the
    //    lazy localCheckpoint pins the partitioning — slower (a
    //    SizeEstimator walk per block) but correct under any pruning.
    val exchangeReuse =
      spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean
    val base0 = df
      .withColumn("__v", valueCol)
      .repartitionByRange(
        spark.sparkContext.defaultParallelism * 2,
        gCols ++ orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    // coverage check on the ANALYZED plan (Spark 4 Columns wrap
    // ColumnNodes, so the unanalyzed Column tree is not inspectable):
    // the resolved RepartitionByExpression's partition expressions
    // must reference every column of df.
    val partitioningCoversRow = {
      import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
      val partRefs = base0.queryExecution.analyzed.collectFirst {
        case r: RepartitionByExpression =>
          r.partitionExpressions.flatMap(_.references.map(_.name.toLowerCase)).toSet
      }.getOrElse(Set.empty[String])
      df.columns.map(_.toLowerCase).toSet.subsetOf(partRefs)
    }
    val base =
      if (exchangeReuse && partitioningCoversRow) base0
      else base0.localCheckpoint(eager = true)
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
