package graft

import org.apache.spark.sql.functions._

import graft.functions.{topk, TopKBuffer}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("buffer: bounded, ordered, tie-broken by id asc") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (3.0, 30L), (2.0, 20L), (3.0, 5L), (0.5, 1L), (9.9, 99L))
      .foreach { case (s, i) => b.add(s, i) }
    assert(b.sortedDesc.toSeq === Seq((9.9, 99L), (3.0, 5L), (3.0, 30L)))
  }

  test("buffer merge ≡ adding everything to one buffer") {
    val all = (0 until 100).map(i => ((i * 37 % 101).toDouble, i.toLong))
    val one = new TopKBuffer(10)
    all.foreach { case (s, i) => one.add(s, i) }
    val (l, r) = all.splitAt(50)
    val b1 = new TopKBuffer(10); l.foreach { case (s, i) => b1.add(s, i) }
    val b2 = new TopKBuffer(10); r.foreach { case (s, i) => b2.add(s, i) }
    b1.merge(b2)
    assert(b1.sortedDesc.toSeq === one.sortedDesc.toSeq)
  }

  test("aggregate matches window row_number top-k on a DataFrame") {
    val df = (1 to 1000).map(i => (i % 7L, (i * 131 % 997).toDouble, i.toLong))
      .toDF("g", "s", "id")
    val viaAgg = df.groupBy("g").agg(topk(col("s"), col("id"), 5).as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .orderBy("g", "id").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("s").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select(col("g"), col("s").as("score"), col("id"))
      .orderBy("g", "id").collect().toSeq
    assert(viaAgg === viaWindow)
  }
}
