package graft.ops

import graft.SparkTestBase

/** Bounded-depth BFS: min-dist correctness on hand-built graphs. */
class BfsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], probes: Seq[Long], depth: Int) =
    Graph.bfsDistances(
      edges.toDF("src", "dst"), "src", "dst",
      probes.toDF("probe"), "probe", depth)
      .as[(Long, Long, Int)].collect().toSet

  test("path graph: exact hop layers, depth bound respected") {
    // 1 → 2 → 3 → 4 → 5
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val out = run(edges, Seq(1L), depth = 3)
    assert(out === Set((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3)))
  }

  test("diamond: node reachable by two paths gets the MIN distance") {
    // 1→2→4, 1→3→4, and a long way 1→5→6→4
    val edges = Seq(1L -> 2L, 2L -> 4L, 1L -> 3L, 3L -> 4L,
      1L -> 5L, 5L -> 6L, 6L -> 4L)
    val out = run(edges, Seq(1L), depth = 3)
    assert(out.contains((1L, 4L, 2)))
    assert(!out.exists(r => r._2 == 4L && r._3 == 3))
  }

  test("multi-probe: layers are tracked independently per probe") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 9L -> 3L)
    val out = run(edges, Seq(1L, 9L), depth = 2)
    assert(out.contains((1L, 3L, 2)))
    assert(out.contains((9L, 3L, 1)))
    assert(out.contains((9L, 9L, 0)))
  }

  test("cycle does not revisit or loop") {
    val edges = Seq(1L -> 2L, 2L -> 1L)
    val out = run(edges, Seq(1L), depth = 4)
    assert(out === Set((1L, 1L, 0), (1L, 2L, 1)))
  }

  test("depth outside [1,16] is rejected loudly") {
    intercept[IllegalArgumentException] { run(Seq(1L -> 2L), Seq(1L), 0) }
    intercept[IllegalArgumentException] { run(Seq(1L -> 2L), Seq(1L), 17) }
  }
}
