package graft.ops

import graft.SparkTestBase

/** Deterministic label propagation: community convergence and the
  * (most-frequent, min-label) tie rule. */
class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    Graph.labelPropagation(edges.toDF("a", "b"), "a", "b", iters)
      .as[(Long, Long)].collect().toMap

  test("two cliques joined by a bridge settle into two communities") {
    val k1 = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 1L -> 4L, 2L -> 4L, 3L -> 4L)
    val k2 = Seq(5L -> 6L, 6L -> 7L, 5L -> 7L, 5L -> 8L, 6L -> 8L, 7L -> 8L)
    val out = run(k1 ++ k2 ++ Seq(4L -> 5L), iters = 4)
    assert(Set(1L, 2L, 3L, 4L).map(out).size === 1, s"clique 1 split: $out")
    assert(Set(6L, 7L, 8L).map(out).size === 1, s"clique 2 split: $out")
    assert(out(1L) !== out(7L), s"cliques merged: $out")
  }

  test("tie between neighbor labels resolves to the smallest label") {
    // node 3's neighbors 1 and 2 carry labels 1 and 2 (one vote each)
    val out = run(Seq(1L -> 3L, 2L -> 3L), iters = 1)
    assert(out(3L) === 1L)
  }

  test("deterministic across partitionings") {
    val edges = (1L to 60L).map(i => (i, (i * 7) % 60 + 1)).filter(e => e._1 != e._2)
    val a = run(edges, 3)
    val b = Graph.labelPropagation(
      edges.toDF("a", "b").repartition(7), "a", "b", 3)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("iteration bound is enforced loudly") {
    intercept[IllegalArgumentException] { run(Seq(1L -> 2L), 0) }
    intercept[IllegalArgumentException] { run(Seq(1L -> 2L), 21) }
  }
}
