package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PageRank: fixed-point invariants, hand-computed small graphs, a
  * differential check against an independent driver-side integer
  * reimplementation, and the dangling/duplicate-edge contracts. */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Int = 85): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters, dampingPct)
      .as[(Long, Long)].collect().toMap

  /** Independent reference: same all-integer update rule, computed
    * with plain Scala maps (no DataFrames, no partitioning). */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val teleport = (100L - dampingPct) * 10000000L
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map(p => r(p._1) / outdeg(p._1)).sum
      }
      r = nodes.map(n =>
        n -> (teleport + dampingPct * in.getOrElse(n, 0L) / 100)).toMap
    }
    r
  }

  test("a cycle is a fixed point: every node keeps exactly 1e9") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    for (iters <- Seq(1, 5, 9)) { // 9 crosses the checkpoint boundary
      val r = ranksOf(cycle, iters)
      assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L))
    }
  }

  test("star: hub collects its spokes' mass, hand-computed") {
    // 2,3,4 each point only at 1; 1 points at 2. After one iteration:
    //   r(1) = 15e7 + 85 * (3 * 1e9) div 100 = 2_700_000_000
    //   r(2) = 15e7 + 85 * 1e9 div 100      = 1_000_000_000
    //   r(3) = r(4) = 15e7 (teleport only — no in-links)
    val r = ranksOf(Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)), 1)
    assert(r === Map(1L -> 2700000000L, 2L -> 1000000000L,
      3L -> 150000000L, 4L -> 150000000L))
  }

  test("dangling node receives but never emits; sink outranks source") {
    val r = ranksOf(Seq((1L, 2L)), 3)
    // node 2 has no out-edges: its mass leaks (not redistributed)
    assert(r(2L) > r(1L))
    // source gets teleport only after iteration 1
    assert(r(1L) === 150000000L)
  }

  test("duplicate edges collapse — a multi-edge must not double-weight") {
    val once = ranksOf(Seq((1L, 2L), (1L, 3L)), 2)
    val dup = ranksOf(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 2)
    assert(once === dup)
  }

  test("differential vs independent integer reimplementation") {
    // deterministic pseudo-random digraph: 40 nodes, ~160 edges
    val edges = for {
      i <- 0L until 160L
      src = (i * 7919) % 40
      dst = (i * 104729 + 13) % 40
      if src != dst
    } yield (src, dst)
    for (damping <- Seq(85, 50)) {
      assert(ranksOf(edges, 6, damping) === refRanks(edges, 6, damping))
    }
  }

  test("assumeSimple is output-identical on a duplicate-free edge list" +
      " (pageRank, PPR, HITS, BFS)") {
    // the flag's contract: on an already-simple graph the dedup skip
    // changes the PLAN only. Distinct-ify the pseudo-random digraph
    // first, then run every flagged kernel both ways.
    val edges = (for {
      i <- 0L until 160L
      src = (i * 7919) % 40
      dst = (i * 104729 + 13) % 40
      if src != dst
    } yield (src, dst)).distinct
    val df = edges.toDF("src", "dst")
    assert(
      Graph.pageRank(df, "src", "dst", 5, assumeSimple = true)
        .as[(Long, Long)].collect().toMap ===
      Graph.pageRank(df, "src", "dst", 5)
        .as[(Long, Long)].collect().toMap)
    val probes = Seq(0L, 1L, 2L).toDF("probe")
    assert(
      Graph.personalizedPageRank(df, "src", "dst", probes, "probe", 5,
          assumeSimple = true)
        .as[(Long, Long)].collect().toMap ===
      Graph.personalizedPageRank(df, "src", "dst", probes, "probe", 5)
        .as[(Long, Long)].collect().toMap)
    assert(
      Graph.hits(df, "src", "dst", 3, assumeSimple = true)
        .as[(Long, Long, Long)].collect().sorted.toSeq ===
      Graph.hits(df, "src", "dst", 3)
        .as[(Long, Long, Long)].collect().sorted.toSeq)
    assert(
      Graph.bfsDistances(df, "src", "dst", probes, "probe", 4,
          assumeSimple = true)
        .as[(Long, Long, Int)].collect().sorted.toSeq ===
      Graph.bfsDistances(df, "src", "dst", probes, "probe", 4)
        .as[(Long, Long, Int)].collect().sorted.toSeq)
  }

  test("symmetric nodes rank equally; iterations are monotone for a hub") {
    // two symmetric spokes into a hub, bidirectional
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 2L))
    val r = ranksOf(edges, 4)
    assert(r(1L) === r(2L))
    assert(r(3L) > r(1L)) // hub has in-degree 2 at out-degree-1 sources
  }

  test("parameter validation is loud") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(e, "src", "dst", 5, dampingPct = 101))
  }

  test("triangleCount: triangle 1, square 0, K4 4; duplicates/reversals collapse") {
    import spark.implicits._
    def count(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L))) == ((3L, 3L, 1L)))
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == ((4L, 4L, 0L)))
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count(k4) == ((4L, 6L, 4L)))
    // reversed + duplicated edges and self-loops are one undirected edge / dropped
    assert(count(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))) == ((3L, 3L, 1L)))
  }

  test("associationRules: hand-computed support, confidence, lift") {
    import spark.implicits._
    // baskets: {a,b} ×3, {a,c}, {b,c}: c_ab=3, c_a=4, c_b=4, n=5
    // conf a→b = 3/4; lift = 3·5/(4·4) = 0.9375
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (4L, "a"), (4L, "c"), (5L, "b"), (5L, "c"))
      .toDF("bk", "item")
    val got = graft.ops.Analytics.associationRules(
      rows, col("bk"), col("item"), minSupport = 2)
      .collect().map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b"),
        r.getAs[Long]("c_ab"), r.getAs[Long]("conf_ab_micro"),
        r.getAs[Long]("lift_micro")))
    assert(got.toSeq == Seq(("a", "b", 3L, 750000L, 937500L)), got.toSeq.toString)
  }
}
