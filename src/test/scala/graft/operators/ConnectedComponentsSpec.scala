package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = SparkSpec.session
    import s.implicits._
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component labeled by its min id") {
    // 5~4~3~2~1: worst-case diameter for min-label propagation
    val got = run(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate canonical labels") {
    val got = run(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("cycles and duplicate edges converge") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
