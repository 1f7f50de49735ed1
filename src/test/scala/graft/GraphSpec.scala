package graft

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  // K4 on {1,2,3,4} plus a pendant 5—1: C(4,3)=4 triangles, each K4
  // node in 3 of them, the pendant in none.
  test("triangleCounts: K4 plus pendant edge") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("u", "v")
    val out = Graph.triangleCounts(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle with tails counts each node once") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val out = Graph.triangleCounts(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("pageRankInt: two-node cycle stays symmetric, sink gains from source") {
    // a <-> b symmetric: ranks stay equal every iteration.
    val cyc = Seq((1L, 2L, 10L), (2L, 1L, 10L)).toDF("src", "dst", "w")
    val rc = Graph.pageRankInt(cyc, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rc(1L) == rc(2L))
    // chain a -> b: b ends above base (gets a's mass), a at base.
    val chain = Seq((1L, 2L, 5L)).toDF("src", "dst", "w")
    val rh = Graph.pageRankInt(chain, "src", "dst", "w", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 150000000000L
    assert(rh(1L) == base) // no in-edges: damped base only
    // iter1: b = base + 85% of 1e12; iter2: b = base + 85% of a's base
    assert(rh(2L) == base + 85L * base / 100L)
  }

  test("pageRankInt: rank mass is conserved minus damping leakage") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val out = Graph.pageRankInt(edges, "src", "dst", "w", iters = 3)
      .collect().map(_.getLong(1))
    // 3-cycle: every node keeps exactly the uniform rank at every step
    // (each node passes its whole rank on and receives one whole rank).
    assert(out.toSet == Set(150000000000L + 85L * 1000000000000L / 100L))
  }
}
