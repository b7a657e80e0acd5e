package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SemDeDup keep-rule semantics (ops/Dedup.semDedup): within each
  * duplicate cluster keep the member LEAST similar to its own centroid
  * (ties → smaller id), singletons pass through kept, and every input id
  * comes back exactly once. Geometry: 2-D unit vectors at chosen angles
  * from the single seeded centroid id 0 = (1,0) (nCells = 1 → derived
  * stride n → only id 0 seeds), so cosine similarities are exact
  * trigonometry. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private val corpus = Seq(
    (0L, vec(0)),   // the seed centroid itself; singleton (cos 10° < 0.999 to nearest)
    (1L, vec(10)),  // cluster A: cos(2°)=0.99939 to id 2 — duplicates at thr 0.999
    (2L, vec(12)),  //   id 2 is LESS centroid-similar (cos 12° < cos 10°) → the keeper
    (3L, vec(30)),  // cluster B: identical twin of id 4 → centroid-sim tie
    (4L, vec(30)),  //   min-id tie-break keeps id 3
    (5L, vec(90))   // singleton, orthogonal to everything
  ).toDF("vec_id", "embedding")

  test("keep-least-central rule, min-id tie-break, singleton passthrough") {
    val out = Dedup.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.999, nCells = 1, nProbe = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap

    // contract: every input id exactly once
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L))

    // cluster A {1,2}: keeper is the LEAST centroid-similar member (id 2),
    // even though id 1 is the smaller id
    assert(out(1L)._1 === out(2L)._1)
    assert(!out(1L)._3 && out(2L)._3)
    assert(out(2L)._2 < out(1L)._2) // cos 12° < cos 10°

    // cluster B {3,4}: identical vectors → centroid-sim tie → min id kept
    assert(out(3L)._1 === out(4L)._1)
    assert(out(3L)._2 === out(4L)._2)
    assert(out(3L)._3 && !out(4L)._3)

    // singletons come back kept, component = own id
    Seq(0L, 5L).foreach { id =>
      assert(out(id)._3, s"singleton $id must be kept")
      assert(out(id)._1 === id)
    }
  }

  test("dropping kept=false rows never empties a cluster") {
    val kept = Dedup.semDedup(corpus, "vec_id", "embedding",
        threshold = 0.999, nCells = 1, nProbe = 2)
      .filter(col("kept")).select("component").distinct().count()
    // 4 clusters: {0}, {1,2}, {3,4}, {5} — one keeper each
    assert(kept === 4L)
  }

  test("zero centroid seeds fails loudly instead of returning empty") {
    // 5 odd ids, nCells 1 → derived stride 5; none of 1,3,7,9,11 is a
    // multiple of 5 → zero seeds → the every-id contract must fail loud
    val noSeeds = Seq(1L, 3L, 7L, 9L, 11L).map(i => (i, vec(i * 3.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.semDedup(noSeeds, "vec_id", "embedding", nCells = 1)
    }
    assert(e.getMessage.contains("zero centroid seeds"))
  }
}
