package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized band join ≡ naive cross-join + range filter. */
class RangeJoinSpec extends SparkSpec {

  test("bandJoin matches the naive cross-join plan") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 250L), (3L, 999L)).toDF("lid", "lts")
    val right = Seq(40L, 100L, 149L, 150L, 260L, 1000L, 1100L).toDF("rts")

    val got = RangeJoin.bandJoin(left, right, "lts", "rts", lo = -60L, hi = 50L, Seq("rts"))
      .select("lid", "rts").as[(Long, Long)].collect().sorted

    val want = left.crossJoin(right)
      .where(col("rts") >= col("lts") - 60 && col("rts") <= col("lts") + 50)
      .select("lid", "rts").as[(Long, Long)].collect().sorted

    assert(got.sameElements(want))
    assert(want.nonEmpty)
  }

  test("countInBand zero-fills left rows with no matches") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 5000L)).toDF("lid", "lts")
    val right = Seq(90L, 95L, 130L).toDF("rts")
    val rows = RangeJoin.countInBand(left, right, "lid", "lts", "rts", -20L, 0L, "n")
      .select("lid", "n").as[(Long, Long)].collect().toMap
    assert(rows(1L) === 2L) // 90 and 95 in [80, 100]; 130 out
    assert(rows(2L) === 0L)
  }

  test("bandJoin handles negative timestamps (floor bucketing)") {
    import spark.implicits._
    val left = Seq((1L, -100L)).toDF("lid", "lts")
    val right = Seq(-160L, -100L, -39L).toDF("rts")
    // window [-160, -40]: -160 and -100 in, -39 out
    val got = RangeJoin.bandJoin(left, right, "lts", "rts", -60L, 60L, Seq("rts"))
      .select("rts").as[Long].collect().sorted
    assert(got.sameElements(Array(-160L, -100L)))
  }
}
