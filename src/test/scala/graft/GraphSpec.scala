package graft

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRankScaled: one hand-computed power step with a dangling node") {
    // 1→2, 1→3, 2→3; node 3 dangles (its mass drops, classic sparse form)
    // N=3, S=1e12, r0 = 333333333333 each, base = 15e12 div 300 = 5e10
    // r1(1) = base; r1(2) = base + 85·(r0 div 2) div 100
    // r1(3) = base + 85·(r0 div 2 + r0) div 100
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.pageRankScaled(e, "src", "dst", iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 50000000000L,
      2L -> 191666666666L,
      3L -> 474999999999L))
  }

  test("pageRankScaled: a symmetric cycle is a fixpoint of the iteration") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankScaled(e, "src", "dst", iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.toSet == Set(333333333333L))
  }

  test("pageRankScaled: duplicate edges collapse before outdegree counting") {
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val once = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = Graph.pageRankScaled(dup, "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Graph.pageRankScaled(once, "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
