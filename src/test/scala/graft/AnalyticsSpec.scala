package graft

import graft.queries.AnalyticsQueries

/** Specs for analytics operators without a SQL oracle. */
class AnalyticsSpec extends SparkSpec {

  test("a1: approx_count_distinct within 5% of exact per group") {
    val rows = AnalyticsQueries.queries("a1_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users")
      val exact = r.getAs[Long]("exact_users")
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("q3: top orders are strictly ordered by exact revenue") {
    val rows = AnalyticsQueries.queries("q3_top_orders")(spark, sf).collect()
    assert(rows.length === 10)
  }
}
