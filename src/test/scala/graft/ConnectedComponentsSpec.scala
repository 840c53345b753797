package graft

import graft.operators.ConnectedComponents

/** Min-label propagation CC: known components, chains, convergence. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("three separate components get their min id as label") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L), (22L, 20L)))
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a 12-node chain converges to one component") {
    val chain = (0L until 11L).map(i => (i + 1, i))
    val got = components(chain)
    assert(got.size === 12)
    assert(got.values.toSet === Set(0L))
  }

  test("self-loops and duplicate edges are harmless") {
    val got = components(Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)))
    assert(got === Map(5L -> 5L, 6L -> 5L))
  }
}
