package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScalableWindow

/** ScalableWindow must be value-identical to the plain low-cardinality
  * window it replaces, under ANY input partitioning.
  */
class ScalableWindowSpec extends SparkSpec {

  // 3 groups, values engineered to include exact ties (v = id % 97):
  // the tie-break column id makes the order total, as both forms
  // require for determinism
  private def fixture = {
    import spark.implicits._
    (0L until 3000L)
      .map(i => (s"g${i % 3}", i, (i % 97).toDouble))
      .toDF("g", "id", "v")
  }

  test("cappedRowNumber equals the plain per-group window at any partitioning") {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val plain = fixture
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 10)
      .collect().map(_.toString).sorted.toSeq
    for (parts <- Seq(1, 7, 64)) {
      val got = ScalableWindow.cappedRowNumber(
          fixture.repartition(parts), Seq("g"),
          Seq(col("v").desc, col("id")), k = 10, rnCol = "rn")
        .select("g", "id", "v", "rn")
        .collect().map(_.toString).sorted.toSeq
      assert(got === plain, s"parts=$parts")
    }
  }

  test("prefixSum equals the plain per-group running total at any partitioning") {
    import spark.implicits._
    val longs = fixture.select(col("g"), col("id"), (col("id") % 13).cast("long").as("n"))
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val plain = longs
      .withColumn("cum", coalesce(sum("n").over(w), lit(0L)))
      .collect().map(_.toString).sorted.toSeq
    for (parts <- Seq(1, 7, 64)) {
      val got = ScalableWindow.prefixSum(
          longs.repartition(parts), Seq("g"), Seq(col("id")), col("n"), "cum")
        .select("g", "id", "n", "cum")
        .collect().map(_.toString).sorted.toSeq
      assert(got === plain, s"parts=$parts")
    }
  }

  test("prefixSum: global (no groups) with a composite order, any partitioning") {
    // composite order (v desc, id) over NO groups — the global-running-
    // total shape a plain window executes in one task
    val longs = fixture.select(col("g"), col("id"), (col("id") % 13).cast("long").as("n"))
    val w = Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val plain = fixture
      .join(longs.select("id", "n"), "id")
      .withColumn("cum", coalesce(sum("n").over(w), lit(0L)))
      .select("id", "n", "cum")
      .collect().map(_.toString).sorted.toSeq
    for (parts <- Seq(1, 7, 64)) {
      val got = ScalableWindow.prefixSum(
          fixture.join(longs.select("id", "n"), "id").repartition(parts),
          Nil, Seq(col("v").desc, col("id")), col("n"), "cum")
        .select("id", "n", "cum")
        .collect().map(_.toString).sorted.toSeq
      assert(got === plain, s"parts=$parts")
    }
  }

  test("cappedRowNumber: groups smaller than k emit all rows, ranked") {
    import spark.implicits._
    val tiny = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("b", 3L, 1.0)).toDF("g", "id", "v")
    val got = ScalableWindow.cappedRowNumber(
        tiny, Seq("g"), Seq(col("v").desc, col("id")), k = 10, rnCol = "rn")
      .select("g", "id", "rn").as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L)))
  }
}
