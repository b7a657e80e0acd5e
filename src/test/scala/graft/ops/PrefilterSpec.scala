package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.srpSignature

/** The round-13 embedding near-dup Hamming prefilter
  * (ops/Dedup.prefilteredBucketPairs + srpHamMax): the sf10 lane
  * measured the in-bucket candidate expansion breaking twice at
  * n = 400k — AQE broadcast a 7.4 GiB candidate side it had estimated
  * at 12 MiB (Catalyst Generate stats don't model the pair explosion),
  * and the vector-verify rejoin put ~100 GB on the shuffle channel.
  * The fix threads a 64-bit disjoint-plane SRP signature through the
  * buckets and Hamming-filters pairs BEFORE the candidate exchange.
  * These tests pin the cap arithmetic, the scale-invariance that keeps
  * the planted-twin goldens byte-identical, the disjoint-plane
  * contract, and that the filter is genuinely in the execution path. */
class PrefilterSpec extends SparkTestBase {
  import spark.implicits._

  test("srpHamMax: Binomial-tail cap arithmetic at the documented points") {
    // μ = 64·acos(t)/π; cap = min(64, ⌈3μ⌉ + 3)
    assert(Dedup.srpHamMax(0.999) === 6)
    assert(Dedup.srpHamMax(0.95) === 23)
    assert(Dedup.srpHamMax(1.0) === 3) // μ = 0 → floor of 3
    assert(Dedup.srpHamMax(-1.0) === 64) // μ = 64 → clamped to "no filter"
    // monotone: looser thresholds never tighten the cap
    val caps = Seq(1.0, 0.999, 0.99, 0.95, 0.9, 0.5, 0.0, -1.0)
      .map(Dedup.srpHamMax)
    assert(caps === caps.sorted, s"cap not monotone: $caps")
  }

  test("prefilter signature is scale-invariant and plane-disjoint") {
    val v = Seq((1L, (0 until 64).map(d => ((d * 37 % 11) - 5).toFloat)))
      .toDF("id", "v")
    val row = v.select(
      srpSignature(col("v"), 64, Dedup.PrefilterPlaneOffset).as("s1"),
      srpSignature(transform(col("v"), x => x * lit(1.5f)), 64,
        Dedup.PrefilterPlaneOffset).as("s2"),
      srpSignature(col("v"), 64).as("s0")).head()
    // scale-invariance: v and 1.5·v sign-agree on every plane — the
    // property that keeps every planted-twin golden byte-identical
    assert(row.getLong(0) === row.getLong(1))
    // disjoint planes: offset 64 is a different hyperplane family than
    // the bucketing planes 0..63 (deterministic, so a plain inequality
    // on this fixed vector pins the offset actually being applied)
    assert(row.getLong(0) !== row.getLong(2))
  }

  test("the Hamming cap is in the execution path: hamMax=0 drops a " +
    "true near-dup whose signatures differ, hamMax=64 keeps it") {
    // Deterministic search for a pair with cosine ≥ 0.999 but
    // prefilter Hamming ≥ 1: some plane's projection sits near zero
    // for SOME single-component nudge direction — sweep (dim, eps) in
    // one job and take the first grid point that flips a plane while
    // the angle stays inside the threshold.
    val baseVec = (0 until 64).map(d => ((d * 29 % 13) - 6).toFloat)
    val grid = for {
      d <- 0 until 64; e <- 1 to 12
    } yield (d, e * 0.1f, baseVec.updated(d, baseVec(d) + e * 0.1f))
    val hit = grid.toDF("d", "e", "b")
      .withColumn("a", typedLit(baseVec))
      .select(col("d"), col("e"),
        bit_count(srpSignature(col("a"), 64, Dedup.PrefilterPlaneOffset)
          .bitwiseXOR(srpSignature(col("b"), 64, Dedup.PrefilterPlaneOffset)))
          .as("ham"),
        graft.functions.cosineSimilarity(col("a"), col("b")).as("cos"))
      .filter(col("ham") >= 1 && col("cos") >= 0.999)
      .orderBy(col("d"), col("e")).limit(1).collect().headOption
    assert(hit.nonEmpty, "no perturbation found with cos >= 0.999 and ham >= 1")
    val (dim, eps) = (hit.get.getInt(0), hit.get.getFloat(1))
    val corpus = Seq(
      (1L, baseVec), (2L, baseVec.updated(dim, baseVec(dim) + eps)))
      .toDF("vec_id", "embedding")
    def pairsAt(hamMax: Int): Set[(Long, Long)] =
      Dedup.embeddingNearDupsSrp(corpus, "vec_id", "embedding",
        threshold = 0.999, bits = 32, bands = 4, prefilterHamMax = hamMax)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsAt(64) === Set((1L, 2L)),
      "with the filter off the near-dup pair must survive the verify")
    assert(pairsAt(0) === Set.empty,
      "hamMax=0 must drop the pair whose prefilter signatures differ")
  }

  test("default prefilter preserves the full near-dup output on a " +
    "twin-planted corpus (filter-off differential)") {
    // 64-dim corpus + scaled twins — the q18/q53 shape. Twins have
    // Hamming 0 (scale-invariance), so the default cap changes nothing;
    // the differential against hamMax=64 proves it on all three kernels.
    val vecs = (0L until 40L).map { i =>
      (i, (0 until 64).map(d => (((i * 31 + d * 17) % 19) - 9).toFloat))
    }.toDF("vec_id", "embedding")
    val scaled = vecs.withColumn("vec_id", col("vec_id") + 1000L)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(2.0f)))
    val union = vecs.unionByName(scaled)
    def norm(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(
      norm(Dedup.embeddingNearDupsIvf(union, "vec_id", "embedding",
        threshold = 0.999, nProbe = 2)) ===
      norm(Dedup.embeddingNearDupsIvf(union, "vec_id", "embedding",
        threshold = 0.999, nProbe = 2, prefilterHamMax = 64)))
    assert(
      norm(Dedup.embeddingNearDupsSrp(union, "vec_id", "embedding",
        threshold = 0.999, bits = 32, bands = 4)) ===
      norm(Dedup.embeddingNearDupsSrp(union, "vec_id", "embedding",
        threshold = 0.999, bits = 32, bands = 4, prefilterHamMax = 64)))
    assert(
      norm(Dedup.semDedup(union, "vec_id", "embedding", threshold = 0.999)) ===
      norm(Dedup.semDedup(union, "vec_id", "embedding", threshold = 0.999,
        prefilterHamMax = 64)))
  }
}
