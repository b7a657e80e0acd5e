package graft.ops

import graft.SparkTestBase

/** HITS and k-core peeling: hand-checkable structure. */
class HitsKcoreSpec extends SparkTestBase {
  import spark.implicits._

  test("hits: the pointed-at node is the authority, the pointer the hub") {
    // 1→3, 2→3, 3→4: node 3 is the top authority (two hubs point at
    // it); 1 and 2 are the top hubs (they point at the top authority)
    val edges = Seq(1L -> 3L, 2L -> 3L, 3L -> 4L).toDF("a", "b")
    val out = Graph.hits(edges, "a", "b", iterations = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(3L)._2 === 1000000L, "node 3 must be the max authority")
    assert(out(1L)._1 === 1000000L && out(2L)._1 === 1000000L,
      "nodes 1 and 2 must be the max hubs")
    assert(out(4L)._1 === 0L, "sink node has no out-edges, hub 0")
    assert(out(1L)._2 === 0L, "source node has no in-edges, auth 0")
  }

  test("hits: deterministic across partitionings") {
    val edges = (1L to 40L).map(i => (i, (i * 7) % 40 + 1))
      .filter(e => e._1 != e._2)
    val a = Graph.hits(edges.toDF("a", "b"), "a", "b", 3)
      .as[(Long, Long, Long)].collect().toSet
    val b = Graph.hits(edges.toDF("a", "b").repartition(7), "a", "b", 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("kcore: a tail is peeled off, the clique survives with full degree") {
    // K4 clique {1,2,3,4} + tail 4-5-6
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L, 5L -> 6L).toDF("a", "b")
    val out = Graph.kCorePeel(edges, "a", "b", k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L), s"only the K4 survives: $out")
    assert(out.values.forall(_ == 3L), s"clique degrees after peel: $out")
  }

  test("kcore: bounds are enforced loudly") {
    val e = Seq(1L -> 2L).toDF("a", "b")
    intercept[IllegalArgumentException] { Graph.kCorePeel(e, "a", "b", 0, 3) }
    intercept[IllegalArgumentException] { Graph.kCorePeel(e, "a", "b", 2, 17) }
  }
}
