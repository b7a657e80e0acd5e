package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The IVF-blocked self-kNN kernel (round 11 — the executable scale
  * path for the q73/q109 exact all-pairs carve-outs). Pins:
  *  - EXACTNESS AT FULL PROBE: nProbe ≥ centroid count means every
  *    (probe, neighbor) pair is scored exactly once, so the kernel must
  *    equal the brute-force twin bit-for-bit (same rounding, same
  *    tie-break) — the differential identity everything else leans on;
  *  - self-exclusion and candidate-pair uniqueness (each neighbor lives
  *    in exactly one cell, so no rank position repeats a neighbor);
  *  - the refactored [[Similarity.knnLabelAgreement]] is the same
  *    function as [[Similarity.labelAgreementOver]] ∘
  *    [[Similarity.exactSelfTopK]] (q109's pinned oracle rides it);
  *  - the loud-failure contract on an id layout that seeds nothing;
  *  - the round-12 geometry bound: the cell count is the parameter
  *    (default ⌈√n⌉), clamped to MaxIvfCells whatever the caller asks
  *    for or the corpus grows to.
  */
class IvfSelfTopKSpec extends SparkTestBase {

  import spark.implicits._

  // three well-separated direction clusters + a little in-cluster spread:
  // cluster structure makes low-probe recall meaningful, determinism
  // comes from the integer construction
  private lazy val vecs: DataFrame = (0L until 60L).map { i =>
    val c = (i % 3).toInt
    val base = Array.fill(8)(0.05f)
    base(c * 2) = 1.0f + (i % 5) * 0.01f
    base(c * 2 + 1) = 0.3f + (i % 7) * 0.02f
    (i, base.toSeq, s"label${c}")
  }.toDF("vec_id", "embedding", "label")

  test("nProbe >= centroid count reproduces the exact kernel bit-for-bit") {
    // nCells 6 over ids 0..59 → stride 10 → seeds 0,10..50; nProbe 6
    // probes every cell
    val exact = Similarity.exactSelfTopK(vecs, "vec_id", "embedding", k = 4)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val full = Similarity.ivfSelfTopK(vecs, "vec_id", "embedding", k = 4,
        nCells = 6, nProbe = 6)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(full === exact)
  }

  test("production probes: self excluded, neighbors unique, recall sane") {
    val r = Similarity.ivfSelfTopK(vecs, "vec_id", "embedding", k = 4,
        nCells = 6, nProbe = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(r.nonEmpty)
    assert(r.forall { case (p, _, n, _) => p != n }, "self match leaked")
    // one cell per neighbor → a probe can never see a neighbor twice
    val dupPairs = r.groupBy(t => (t._1, t._3)).filter(_._2.size > 1)
    assert(dupPairs.isEmpty, s"duplicate candidate pairs: ${dupPairs.keys}")
    // directed-pair recall vs exact on this clustered corpus must be
    // high (cells align with the planted clusters); gate loosely — the
    // sharp number is the q223 gauge's job
    val exact = Similarity.exactSelfTopK(vecs, "vec_id", "embedding", k = 4)
      .as[(Long, Int, Long, Double)].collect()
      .map(t => (t._1, t._3)).toSet
    val got = r.map(t => (t._1, t._3)).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.8, s"recall $recall unexpectedly low")
  }

  test("knnLabelAgreement == labelAgreementOver(exactSelfTopK) (refactor identity)") {
    val direct = Similarity.knnLabelAgreement(vecs, "vec_id", "embedding",
        "label", k = 5)
      .as[(Long, String, Long, Double)].collect().sorted.toSeq
    val composed = Similarity.labelAgreementOver(
        Similarity.exactSelfTopK(vecs, "vec_id", "embedding", k = 5),
        vecs, "vec_id", "label")
      .as[(Long, String, Long, Double)].collect().sorted.toSeq
    assert(direct === composed)
  }

  test("mutual composition yields canonical undirected edges") {
    val edges = Similarity.mutualTopK(
        Similarity.ivfSelfTopK(vecs, "vec_id", "embedding", k = 4,
          nCells = 6, nProbe = 2))
      .as[(Long, Long, Double)].collect().toSeq
    assert(edges.nonEmpty)
    assert(edges.forall { case (a, b, _) => a < b })
    assert(edges.map(e => (e._1, e._2)).distinct.size == edges.size)
  }

  test("cell-count bound: ⌈√n⌉ default, MaxIvfCells clamp, limit-enforced") {
    // the default geometry: ⌈√n⌉ cells, never more than MaxIvfCells —
    // the parameterization that keeps the assignment pass O(n^1.5), the
    // centroid broadcast bounded, and refineCentroids' per-round driver
    // collect bounded at ANY corpus size (VERDICT r11 finding #1)
    assert(Similarity.ivfCells(0L) == 1)
    assert(Similarity.ivfCells(100L) == 10)
    assert(Similarity.ivfCells(2000L) == 45)     // sf0.1 embeddings
    assert(Similarity.ivfCells(1000L * 1000 * 1000) == 31623) // 10⁹: √n, not n/stride
    assert(Similarity.ivfCells(Long.MaxValue) == Similarity.MaxIvfCells)
    // an over-seeding stride is trimmed by the explicit limit: 60 ids,
    // nCells 7 → stride 8 → 8 stride-hits, limited to exactly 7
    val seeds = Similarity.ivfSeeds(
      vecs.select(col("vec_id").as("id"), col("embedding").as("v")),
      "id", "v", nCells = 7, "spec")
    assert(seeds.count() == 7L)
    // an absurd explicit request is clamped to the hard ceiling: the
    // derived stride stays ≥ 1 and the limit stays ≤ MaxIvfCells, so
    // the seed frame can never exceed min(n, MaxIvfCells)
    val clamped = Similarity.ivfSeeds(
      vecs.select(col("vec_id").as("id"), col("embedding").as("v")),
      "id", "v", nCells = Int.MaxValue, "spec")
    assert(clamped.count() == 60L) // all of n=60, NOT Int.MaxValue cells
  }

  test("scanFraction steering: f = 1 reproduces the exact kernel " +
    "bit-for-bit; steeredProbes pins the scanned fraction") {
    // the round-13 recall dial: scanFraction = 1 must probe every cell,
    // which lands in the existing nProbe >= C exactness identity — the
    // steering mode inherits the differential proof, not a new one
    val exact = Similarity.exactSelfTopK(vecs, "vec_id", "embedding", k = 4)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val steered = Similarity.ivfSelfTopK(vecs, "vec_id", "embedding", k = 4,
        nCells = 6, nProbe = 1, scanFraction = 1.0)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(steered === exact)
    // the budget arithmetic: f = 0 keeps the caller's fixed budget
    // (clamped to the cell count), f > 0 takes max(floor, ceil(f*C))
    assert(Similarity.steeredProbes(6, 142, 0.0) == 6)
    assert(Similarity.steeredProbes(6, 4, 0.0) == 4) // nProbe > C clamps
    assert(Similarity.steeredProbes(1, 142, 0.133) == 19) // ceil(18.9)
    assert(Similarity.steeredProbes(6, 142, 0.01) == 6) // floor wins
    assert(Similarity.steeredProbes(1, 45, 1.0) == 45) // full scan
    intercept[IllegalArgumentException] {
      Similarity.steeredProbes(1, 45, 1.5)
    }
  }

  test("ivfSeeds materializes as a driver-local relation (one collect, " +
    "no per-consumer rescans)") {
    // round-13 ADVICE: the seed frame is <= MaxIvfCells rows by the
    // explicit limit, so it is collected once and re-emitted as a
    // LocalRelation — the strongest bounded shape the broadcast gate
    // recognizes, and downstream consumers stop re-running the
    // filter+limit corpus scan per use
    val seeds = Similarity.ivfSeeds(
      vecs.select(col("vec_id").as("id"), col("embedding").as("v")),
      "id", "v", nCells = 6, "spec")
    assert(seeds.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"expected LocalRelation, got:\n${seeds.queryExecution.optimizedPlan}")
    assert(graft.PlanGates.boundedByConstructionLogical(
      seeds.queryExecution.optimizedPlan))
  }

  test("refineCentroids never grows the cell count (bounds the driver collect)") {
    // Lloyd rounds can only merge cells (empty clusters drop out), never
    // mint new ones — so refineCentroids' per-round driver collect is
    // bounded by |init| for ANY number of rounds. ivfSeeds bounds |init|
    // at MaxIvfCells; together these bound the collect at any corpus
    // size (VERDICT r11 finding #1's third leg).
    val base = vecs.select(col("vec_id").as("id"), col("embedding").as("v"))
    val init = Similarity.ivfSeeds(base, "id", "v", nCells = 12, "spec")
    val initN = init.count()
    var prev = initN
    for (iters <- 1 to 3) {
      val n = Similarity.refineCentroids(base, init, "id", "v", iters).count()
      assert(n <= prev,
        s"round $iters grew the centroid count: $prev -> $n")
      prev = n
    }
  }

  test("an id layout that seeds no centroid fails loudly") {
    // 30 odd ids, nCells 15 → derived stride 2 → no odd id is divisible
    val noSeed = vecs.filter(col("vec_id") % 2 === 1)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfSelfTopK(noSeed, "vec_id", "embedding", k = 2,
        nCells = 15, nProbe = 2).collect()
    }
    assert(e.getMessage.contains("zero centroid seeds"))
  }
}
