package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup}

/** Randomized-case checks for the two operators whose correctness
  * rests on a combinatorial argument: the triangle block-matrix pair
  * coverage (every unordered pair meets in exactly one block-pair
  * task) and the alternating-star contraction. Cases are seeded
  * pseudo-random (reproducible) and each runs a Spark job, so the
  * counts stay small while the inputs vary adversarially.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def scramble(seed: Long): Long = {
    var z = seed * 0x9e3779b97f4a7c15L + 0xabcdefL
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pick(seed: Long, lo: Int, hi: Int): Int =
    lo + (math.abs(scramble(seed)) % (hi - lo + 1)).toInt

  private def vec(seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d => (scramble(seed * 64 + d) % 997L) / 500.0f)

  test("block-matrix embedding pairs equal all unordered pairs for any (n, blocks)") {
    (1 to 6).foreach { c =>
      val n = pick(c * 7 + 1, 0, 30)
      val blocks = pick(c * 7 + 2, 1, 9)
      val df = (0 until n).map(i => (i.toLong, vec(c * 1000L + i, 8)))
        .toDF("vec_id", "embedding")
      // threshold -2 keeps EVERY pair: coverage must be exactly the
      // set of unordered pairs, each exactly once
      val blocked = Dedup.embeddingPairs(df, "embedding", "vec_id", -2.0, blocks = blocks)
        .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
      val expected = (for { a <- 0 until n; b <- a + 1 until n }
        yield (a.toLong, b.toLong)).sorted
      assert(blocked === expected, s"case $c: n=$n blocks=$blocks")
    }
  }

  test("distributed star CC matches the driver union-find on random graphs") {
    (1 to 5).foreach { c =>
      val nEdges = pick(c * 13 + 5, 0, 40)
      val edges = (0 until nEdges).map(i =>
        (math.abs(scramble(c * 500L + i)) % 30, math.abs(scramble(c * 900L + i)) % 30))
      val df = edges.toDF("src", "dst")
      val distributed = ConnectedComponents.runWithStats(df, smallCutoff = 0L)
        .labels.as[(Long, Long)].collect().toMap
      val driver = ConnectedComponents.run(df) // small → union-find path
        .as[(Long, Long)].collect().toMap
      assert(distributed === driver, s"case $c: nEdges=$nEdges")
    }
  }
}
