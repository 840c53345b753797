package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized band (interval) join.
  *
  * Joins `left` to every `right` row whose `rightTs` falls in
  * `[leftTs + lo, leftTs + hi]` — with NO equi key. A naive plan is a
  * broadcast-nested-loop / cross join (O(|L|·|R|) comparisons); at
  * 100 TB that never finishes. This operator buckets both sides by
  * `width = hi - lo` so every qualifying pair shares one of two
  * adjacent buckets, turning the band join into a shuffle equi-join
  * on the bucket id + a residual range filter:
  *
  *   - right row → bucket floor(rt / width)
  *   - left row  → buckets floor((lt+lo)/width) .. floor((lt+hi)/width)
  *     (at most 2 when the probe span equals the bucket width)
  *
  * Each pair is examined in ≤ 2 buckets and kept exactly once by the
  * exact predicate, so results match the naive join. Cost is
  * O(|L| + |R|) shuffle + per-bucket products — the standard
  * map-reduce band-join; Spark Catalyst has no native interval join,
  * so this composition IS the scale path.
  *
  * Reference anchor: the reference reader's AT_TIMESTAMP time
  * filtering (kinesis_logs_reader.py:34-47) is the degenerate
  * one-sided band; this generalizes it to two-sided event-time
  * correlation.
  */
object RangeJoin {

  /** Band join rows: all left columns + `rightCols`, one output row
    * per (left, right-in-window) pair. `leftTs`/`rightTs` are long
    * columns in the same unit; window is `[leftTs+lo, leftTs+hi]`
    * with lo < hi (a zero-width band would make the bucket width 0;
    * for an exact-point join use an equi-join on the timestamp).
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      lo: Long, hi: Long,
      rightCols: Seq[String]): DataFrame = {
    require(hi > lo, s"empty band [$lo, $hi]")
    val width = hi - lo
    val l = left.withColumn("__b",
      explode(sequence(
        floorDiv(col(leftTs) + lo, width),
        floorDiv(col(leftTs) + hi, width))))
    val r = right
      .select(col(rightTs).as("__rts") +: rightCols.map(col): _*)
      .withColumn("__b", floorDiv(col("__rts"), width))
    l.join(r, Seq("__b"))
      .where(col("__rts") >= col(leftTs) + lo && col("__rts") <= col(leftTs) + hi)
      .drop("__b", "__rts")
  }

  /** Per-left-row count of right rows in the band, keyed by
    * `leftKey` — which must uniquely identify left rows: counts
    * aggregate by key, so under a non-unique key every row of that
    * key would receive the key-level total. Left rows with no matches
    * get 0 (left-outer semantics without a second wide join: the
    * count join is re-joined to `left` broadcast-free on the
    * already-partitioned key column). Band bounds follow
    * [[bandJoin]]: lo < hi.
    */
  def countInBand(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String, rightTs: String,
      lo: Long, hi: Long,
      countName: String): DataFrame = {
    val counts = bandJoin(left, right, leftTs, rightTs, lo, hi, Seq(rightTs))
      .groupBy(leftKey)
      .agg(count(lit(1)).as(countName))
    left.join(counts, Seq(leftKey), "left")
      .withColumn(countName, coalesce(col(countName), lit(0L)))
  }

  /** Exact floor division on longs: `div` after subtracting the
    * positive modulus (floor ≡ truncation once exactly divisible; a
    * double-typed `/` would lose precision past 2^53, e.g. nanos).
    */
  private def floorDiv(c: Column, d: Long): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val exact = c - pmod(c, lit(d))
    ColumnShim.column(
      IntegralDivide(ColumnShim.expression(exact), ColumnShim.expression(lit(d))))
  }
}
