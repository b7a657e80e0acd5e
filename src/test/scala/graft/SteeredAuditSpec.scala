package graft

import org.apache.spark.sql.functions._

/** q224 (steered index audit) vs q223 (fixed-probe): the graded-surface
  * lock for the round-13 `scanFraction` knob. The golden pins the exact
  * values; this spec pins the RELATIONSHIP the values must keep — a
  * steered budget of ⌈0.3·C⌉ probes scans strictly more cells than the
  * fixed 6 on the test corpora (C = 23 → 7 probes), so with identical
  * rounding and tie-breaks its recall against the exact twin can only
  * improve. A kernel change that silently breaks the steering (e.g. the
  * budget no longer reaching the candidate join) shows up here as lost
  * dominance even before the golden re-pin question arises. */
class SteeredAuditSpec extends SparkTestBase {
  private val sfDir = "/root/testdata/sf0.001"

  test("steered audit arm dominates the fixed arm per method") {
    def byMethod(q: String) =
      SparkEntry.queries(q)(spark, sfDir)
        .select(col("method"), col("recall_micro"), col("precision_micro"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val fixed = byMethod("q223_knn_index_eval")
    val steered = byMethod("q224_knn_index_eval_steered")
    assert(fixed.keySet == Set("knn_pairs", "mutual_edges", "agree_exact"))
    assert(steered.keySet == fixed.keySet)
    for (m <- fixed.keySet) {
      assert(steered(m)._1 >= fixed(m)._1,
        s"steered recall lost dominance on $m: ${steered(m)._1} < ${fixed(m)._1}")
    }
    // and the steering must be REAL on this corpus: at least one method
    // strictly better, or the budgets have silently collapsed to equal
    assert(fixed.keySet.exists(m => steered(m)._1 > fixed(m)._1),
      "steered arm identical to fixed — the f=0.3 budget is not steering " +
        s"on this corpus (fixed=$fixed steered=$steered)")
  }

  test("steered arm's probe budget is the lane fX convention on this corpus") {
    // n = 500 → C = 23 cells; floor-1 steering at f = 0.3 must budget
    // ⌈0.3·23⌉ = 7 probes where the fixed arm runs 6 — the arithmetic
    // the q224 golden's divergence from q223's rests on
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val cells = graft.ops.Similarity.ivfCells(n)
    assert(cells == 23)
    assert(graft.ops.Similarity.steeredProbes(1, cells, 0.3) == 7)
    assert(graft.ops.Similarity.steeredProbes(6, cells, 0.0) == 6)
  }
}
