package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("inclusive ≤ semantics, latest match wins, no-match → NULL") {
    val left = Seq((1L, 100L), (2L, 200L), (3L, 50L)).toDF("l_id", "ts")
    // key 2's row must never leak into key 1's matches
    val right = Seq((1L, 90L, 900L), (1L, 200L, 901L), (2L, 100L, 999L))
      .toDF("k", "ts", "v")
    val l = left.withColumn("k", lit(1)).select("l_id", "k", "ts")
    val out = AsOfJoin.lastBefore(l, right, "k", "ts", "ts", Seq("v"))
      .orderBy("l_id").select("l_id", "v").as[(Long, Option[Long])].collect()
    // l_id=1 (t=100): latest right ≤ 100 is t=90 → 900
    // l_id=2 (t=200): right at exactly 200 counts (inclusive) → 901
    // l_id=3 (t=50): nothing before → NULL
    assert(out.toSeq === Seq((1L, Some(900L)), (2L, Some(901L)), (3L, None)))
  }

  test("ties on (key, ts) in the right side reduce deterministically") {
    val l = Seq((1L, 100L)).toDF("l_id", "ts").withColumn("k", lit(7))
    val r = Seq((7L, 100L, 5L), (7L, 100L, 9L)).toDF("k", "ts", "v")
    val out = AsOfJoin.lastBefore(l.select("l_id", "k", "ts"), r, "k", "ts", "ts", Seq("v"))
      .select("v").as[Long].collect()
    assert(out.toSeq === Seq(9L)) // max of tied payloads
  }
}
