package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** §2.2 — core analytics over the TPC-H-ish tables.
  *
  * Money/quantity doubles are cast to decimal(18,4) before summing:
  * decimal sums are exact and associativity-free, so Spark and the
  * DuckDB oracle agree bit-for-bit regardless of partitioning — a
  * property that still holds on a 1000-executor shuffle.
  */
object AnalyticsQueries {

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
          round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
            .cast("double").as("revenue"),
          round(avg(dec(col("l_discount"))), 4).cast("double").as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity::DECIMAL(18,4)), 2)::DOUBLE AS sum_qty,
        |round(sum(l_extendedprice::DECIMAL(18,4) * (1 - l_discount::DECIMAL(18,4))), 2)::DOUBLE AS revenue,
        |round(avg(l_discount::DECIMAL(18,4)), 4)::DOUBLE AS avg_disc,
        |count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
