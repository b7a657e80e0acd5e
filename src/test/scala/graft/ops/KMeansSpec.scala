package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  // 3 well-separated blobs of 20 vectors each around fixed anchors
  private lazy val blobs = {
    val anchors = Seq(Seq(0.0, 0.0, 10.0), Seq(10.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0))
    val rows = for {
      (a, b) <- anchors.zipWithIndex
      i <- 0 until 20
    } yield (b * 100L + i,
      a.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat })
    rows.toDF("vec_id", "embedding")
  }

  test("kMeansCentroids recovers the blob anchors") {
    val cs = Similarity.kMeansCentroids(blobs, "vec_id", "embedding", k = 3, iters = 4)
      .collect().map(_.getSeq[Double](1))
    assert(cs.length == 3)
    // each anchor has exactly one centroid within distance 1 (blob radius ~0.7)
    Seq(Seq(0.0, 0.0, 10.0), Seq(10.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0)).foreach { a =>
      val near = cs.count(c =>
        math.sqrt(c.zip(a).map { case (x, y) => (x - y) * (x - y) }.sum) < 1.0)
      assert(near == 1, s"anchor $a matched $near centroids (centroids: ${cs.toSeq})")
    }
  }

  test("assignIvfCluster matches brute-force nearest centroid") {
    val centroids = Seq(
      (0L, Seq(0.0, 0.0, 10.0)), (1L, Seq(10.0, 0.0, 0.0)), (2L, Seq(0.0, 10.0, 0.0)))
    val cdf = centroids.toDF("centroid_id", "cv")
    val got = Similarity.assignIvfCluster(
      blobs.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
      cdf, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val vecs = blobs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = centroids.minBy { case (_, c) =>
        c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum
      }._1
      assert(got(id) == want, s"vec $id assigned ${got(id)}, nearest is $want")
    }
  }

  test("embeddingNearDupsIvf with k-means refinement: balanced buckets, full twin recall") {
    // adversarial id layout: EVERY seed the derived stride picks lands
    // in blob 0 (only blob 0 owns multiples; nCells 4 → stride 30 over
    // n=120 → seeds 0,150,300,450), so the unrefined index has no
    // centroid near blobs 1/2 and their vectors pile into blob-0
    // buckets; Lloyd rounds must migrate centroids out
    val anchors = Seq(Seq(0.0, 0.0, 10.0), Seq(10.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0))
    val rows = for {
      (a, b) <- anchors.zipWithIndex
      i <- 0 until 20
    } yield {
      val id = if (b == 0) i * 50L else b * 10000L + i * 2 + 1 // blob 0 owns all multiples
      (id, a.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat })
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val scaled = vecs.withColumn("vec_id", col("vec_id") + 100001) // odd shift: no new seeds
      .withColumn("embedding", transform(col("embedding"), x => x * lit(1.5f)))
    val union = vecs.unionByName(scaled)
    val base = union.select(col("vec_id").as("id"), col("embedding").as("v"))
    val seeds = base.filter(col("id") % 300 === 0)
      .select(col("id").as("centroid_id"), col("v").as("cv"))
    assert(seeds.collect().map(_.getLong(0)).forall(_ < 1000L)) // all in blob 0

    def maxBucketFrac(centroids: org.apache.spark.sql.DataFrame): Double = {
      val sizes = Similarity.assignIvfCluster(base, centroids, "id", "v")
        .groupBy("cluster").count().collect().map(_.getLong(1))
      sizes.max.toDouble / sizes.sum
    }
    val refined = Similarity.refineCentroids(base, seeds, "id", "v", iters = 3)
    assert(maxBucketFrac(refined) < maxBucketFrac(seeds),
      "refinement did not improve bucket balance")

    // with refinement on, every planted scaled twin is recovered
    val pairs = Dedup.embeddingNearDupsIvf(union, "vec_id", "embedding",
      threshold = 0.999, nCells = 4, nProbe = 2, kmeansIters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows.map { case (id, _) => (id, id + 100001) }.toSet
    assert(want.subsetOf(pairs),
      s"missing twins: ${(want -- pairs).take(5)} (found ${pairs.size})")
  }

  test("exactCosinePairs: threshold gate, a<b ordering, scale invariance") {
    // v1 ∥ v2 (cosine 1), v3 orthogonal to both; only the parallel pair
    // survives 0.999, emitted once with a_id < b_id
    val vecs = Seq(
      (7L, Seq(1.0f, 0.0f)), (3L, Seq(2.5f, 0.0f)), (5L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.exactCosinePairs(vecs, "vec_id", "embedding", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((3L, 7L, 1.0)), out.mkString(", "))
  }

  test("ivfTopK with k-means refinement: rank-1 neighbor of a corpus probe is itself") {
    val out = Similarity.ivfTopK(blobs, blobs.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 2, nCells = 3, kmeansIters = 2)
      .filter(col("rank") === 1).collect()
    assert(out.nonEmpty)
    out.foreach(r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("probe_id")))
  }

  test("pqEncode: same subspace value → same code, different value → different code") {
    // 2-dim, m=2 → 1-dim subspaces with values {0, 9}: after Lloyd the
    // two centroids sit at 0 and 9, so the code partitions by value
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 9.0f)),
      (3L, Seq(9.0f, 0.0f)), (4L, Seq(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      dim = 2, m = 2, ksub = 2, iters = 3)
    val codes = Similarity.pqEncode(vecs, cb, "vec_id", "embedding", dim = 2, m = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.forall(x => x >= 0 && x < 2)), codes.toString)
    assert(codes(1L)(0) == codes(2L)(0) && codes(3L)(0) == codes(4L)(0) &&
      codes(1L)(0) != codes(3L)(0), s"sub-0 codes: $codes")
    assert(codes(1L)(1) == codes(3L)(1) && codes(2L)(1) == codes(4L)(1) &&
      codes(1L)(1) != codes(2L)(1), s"sub-1 codes: $codes")
  }

  test("pqTopK: neighbors of a blob probe come from the probe's blob") {
    // 4-dim, 3 well-separated blobs, m=2/ksub=4: quantization error is
    // tiny next to the inter-blob distance, so ADC ranking stays in-blob
    val anchors = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(50.0, 50.0, 50.0, 50.0),
      Seq(100.0, 100.0, 0.0, 0.0))
    val rows = for {
      (a, b) <- anchors.zipWithIndex
      i <- 0 until 20
    } yield (b * 100L + i,
      a.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat })
    val vecs = rows.toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(vecs,
      vecs.filter(col("vec_id").isin(0L, 105L, 210L)),
      "vec_id", "embedding", k = 5, dim = 4, m = 2, ksub = 4, kmeansIters = 3)
      .collect()
    assert(out.length == 15, s"expected 3 probes × 5: ${out.length}")
    out.foreach { r =>
      val (p, n) = (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))
      assert(p / 100 == n / 100, s"probe $p got cross-blob neighbor $n")
      assert(r.getAs[Double]("adist") >= 0.0)
    }
  }

  test("pqTopKWithCodebook: one codebook build serves many probe batches identically") {
    val anchors = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(50.0, 50.0, 50.0, 50.0),
      Seq(100.0, 100.0, 0.0, 0.0))
    val rows = for {
      (a, b) <- anchors.zipWithIndex
      i <- 0 until 20
    } yield (b * 100L + i,
      a.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat })
    val vecs = rows.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding",
      dim = 4, m = 2, ksub = 4, iters = 3).localCheckpoint() // built ONCE
    def rank(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adist"))).sortBy(t => (t._1, t._2))
    // two probe batches served from the same build; batch 1 must equal
    // the self-contained pqTopK run (same iters → same codebook)
    val batch1 = vecs.filter(col("vec_id").isin(0L, 105L, 210L))
    val batch2 = vecs.filter(col("vec_id").isin(7L, 113L))
    val served1 = rank(Similarity.pqTopKWithCodebook(
      vecs, batch1, "vec_id", "embedding", k = 5, dim = 4, m = 2, cb))
    val solo = rank(Similarity.pqTopK(
      vecs, batch1, "vec_id", "embedding", k = 5, dim = 4, m = 2, ksub = 4,
      kmeansIters = 3))
    assert(served1.toSeq == solo.toSeq, "shared-build serving drifted from self-contained")
    val served2 = rank(Similarity.pqTopKWithCodebook(
      vecs, batch2, "vec_id", "embedding", k = 5, dim = 4, m = 2, cb))
    assert(served2.length == 10)
    served2.foreach { case (p, _, n, _) =>
      assert(p / 100 == n / 100, s"probe $p got cross-blob neighbor $n") }
  }

  test("ivfPqTopK: neighbors of a blob probe come from the probe's blob") {
    // 4-dim, 3 well-separated blobs; nCells 3 → derived stride 20 →
    // seeds 0, 100, 200 (one per blob); residual PQ
    // error is tiny next to inter-blob distance, so ranking stays in-blob
    val anchors = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(50.0, 50.0, 50.0, 50.0),
      Seq(100.0, 100.0, 0.0, 0.0))
    val rows = for {
      (a, b) <- anchors.zipWithIndex
      i <- 0 until 20
    } yield (b * 100L + i,
      a.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat })
    val vecs = rows.toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(vecs,
      vecs.filter(col("vec_id").isin(0L, 105L, 210L)),
      "vec_id", "embedding", k = 5, dim = 4, m = 2, ksub = 4,
      nProbe = 2, nCells = 3, kmeansIters = 2, pqIters = 3)
      .collect()
    assert(out.length == 15, s"expected 3 probes × 5: ${out.length}")
    out.foreach { r =>
      val (p, n) = (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))
      assert(p / 100 == n / 100, s"probe $p got cross-blob neighbor $n")
      assert(r.getAs[Double]("adist") >= 0.0)
    }
  }

  test("bruteForceTopKL2 matches hand-computed euclidean ranking") {
    val corpus = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(3.0f, 0.0f)), (4L, Seq(0.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    val got = Similarity.bruteForceTopKL2(corpus, probes, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("dist2")))
    assert(got.toSeq == Seq((1, 1L, 0.0), (2, 2L, 1.0), (3, 3L, 9.0)), got.toSeq.toString)
  }

  test("recallAtK counts hits and misses per probe") {
    val truth = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("probe_id", "rank", "neighbor_id")
    val approx = Seq((1L, 1, 10L), (1L, 2, 99L), (2L, 1, 21L), (2L, 2, 20L))
      .toDF("probe_id", "rank", "neighbor_id")
    val got = Similarity.recallAtK(truth, approx, k = 2)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toMap
    assert(got(1L) == (1L, 0.5), got.toString)   // 10 hit, 11 missed
    assert(got(2L) == (2L, 1.0), got.toString)   // order within k irrelevant
  }

  test("ivfPqTopK recall vs exact L2 truth is high on clustered data") {
    val anchors = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(50.0, 50.0, 50.0, 50.0),
      Seq(100.0, 100.0, 0.0, 0.0))
    val rows = for {
      (a, b) <- anchors.zipWithIndex
      i <- 0 until 20
    } yield (b * 100L + i,
      a.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat })
    val vecs = rows.toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopKL2(vecs, probes, "vec_id", "embedding", k = 5)
    val approx = Similarity.ivfPqTopK(vecs, probes, "vec_id", "embedding",
      k = 5, dim = 4, m = 2, ksub = 4, nProbe = 2, nCells = 3,
      kmeansIters = 2, pqIters = 3)
    val rec = Similarity.recallAtK(exact, approx, k = 5)
      .agg(avg("recall")).collect()(0).getDouble(0)
    assert(rec >= 0.8, s"mean recall@5 too low: $rec")
  }

  test("refineTopK exactly re-ranks the candidate set and nothing else") {
    val corpus = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
      (4L, Seq(4.0f, 0.0f)), (5L, Seq(0.5f, 0.0f))) // 5 = true nearest to probe
      .toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 1L)
    // candidate list deliberately EXCLUDES the true nearest (5): refine
    // must rank within the given candidates, never re-open the corpus
    val cand = Seq((1L, 1, 4L), (1L, 2, 2L), (1L, 3, 3L))
      .toDF("probe_id", "rank", "neighbor_id")
    val got = Similarity.refineTopK(cand, corpus, probes, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("dist2")))
    assert(got.toSeq == Seq((1, 3L, 1.0), (2, 2L, 4.0)), got.toSeq.toString)
  }

  test("refine lifts (or holds) IVF-PQ recall on clustered data") {
    val anchors = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(50.0, 50.0, 50.0, 50.0),
      Seq(100.0, 100.0, 0.0, 0.0))
    val rows = for {
      (a, b) <- anchors.zipWithIndex
      i <- 0 until 20
    } yield (b * 100L + i,
      a.zipWithIndex.map { case (x, d) => (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat })
    val vecs = rows.toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopKL2(vecs, probes, "vec_id", "embedding", k = 5)
    def meanRecall(approx: org.apache.spark.sql.DataFrame) =
      Similarity.recallAtK(exact, approx, k = 5)
        .agg(avg("recall")).collect()(0).getDouble(0)
    val cand = Similarity.ivfPqTopK(vecs, probes, "vec_id", "embedding",
      k = 15, dim = 4, m = 2, ksub = 4, nProbe = 2, nCells = 3,
      kmeansIters = 2, pqIters = 3)
    val unrefined = meanRecall(cand.filter(col("rank") <= 5))
    val refined = meanRecall(
      Similarity.refineTopK(cand, vecs, probes, "vec_id", "embedding", k = 5))
    assert(refined >= unrefined, s"refine dropped recall: $refined < $unrefined")
    assert(refined >= 0.9, s"refined recall@5 too low: $refined")
  }

  test("stride-seeded indexes refuse a string id (silent empty-index trap)") {
    // a string id nulls `id % stride` → zero seeds → an empty index that
    // returns nothing without error; the guard makes it loud
    val vecs = Seq(("a", Seq(0.0f, 0.0f)), ("b", Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      Similarity.ivfTopK(vecs, vecs, "vec_id", "embedding", k = 1))
    assert(e1.getMessage.contains("integral id"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.ivfPqTopK(vecs, vecs, "vec_id", "embedding",
        k = 1, dim = 2, m = 1, ksub = 2))
    assert(e2.getMessage.contains("integral id"))
    val e3 = intercept[IllegalArgumentException](
      Dedup.embeddingNearDupsIvf(vecs, "vec_id", "embedding"))
    assert(e3.getMessage.contains("integral id"))
  }

  test("mutualTopK keeps only reciprocated edges, drops self-edges") {
    // hand-built rankTopK-shaped frame: (1,2) reciprocated; 1→3 one-way;
    // 4's only hit is itself (must vanish entirely)
    val topk = Seq(
      (1L, 1, 1L, 1.0), (1L, 2, 2L, 0.9), (1L, 3, 3L, 0.8),
      (2L, 1, 2L, 1.0), (2L, 2, 1L, 0.9),
      (3L, 1, 3L, 1.0), (3L, 2, 2L, 0.7), // 3→2 one-way (2 never picks 3)
      (4L, 1, 4L, 1.0)
    ).toDF("probe_id", "rank", "neighbor_id", "score")
    val got = Similarity.mutualTopK(topk).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.9)), got.toSeq.toString)
  }

  test("int8QuantizeProfile kernel is bit-identical to the HOF spelling") {
    // adversarial values: exact .5 rounding boundaries, negatives,
    // zero vectors, max-magnitude elements, tiny scales
    val vecs = Seq(
      (1L, Seq(0.5f, -0.5f, 1.0f, -1.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(127.0f, -127.0f, 63.5f, -63.5f)),
      (4L, Seq(1e-8f, -1e-8f, 2e-8f, 3e-8f)),
      (5L, Seq(0.1f, 0.2f, 0.3f, 0.9f))).toDF("vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(
      canon(Similarity.int8QuantizeProfile(vecs, "vec_id", "embedding")) ==
        canon(Similarity.int8QuantizeProfileHof(vecs, "vec_id", "embedding")))
  }

  test("int8QuantizeProfile: exact audit columns, zero-vector passthrough") {
    val vecs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))  // zero vector: scale 0, no div-by-zero
    ).toDF("vec_id", "embedding")
    val got = Similarity.int8QuantizeProfile(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // expected values from the same IEEE double math the op specifies;
    // HALF_UP (away from zero) like Spark/DuckDB round, NOT scala
    // math.round (half toward +inf — differs on negative halves)
    def rnd(x: Double): Long = new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val scale = 1.0 / 127.0
    def q(x: Double) = math.max(-127L, math.min(127L, rnd(x / scale)))
    val qs = Seq(1.0, -0.5, 0.0).map(q)
    assert(qs.head == 127L && qs(2) == 0L && math.abs(qs(1) + 63.5) <= 0.5)
    val err = Seq(1.0, -0.5, 0.0).zip(qs).map { case (x, qi) =>
      val d = qi * scale - x; rnd(d * d * 1e12) }.sum
    assert(got(1L) == ((rnd(scale * 1e9), qs.sum, qs.map(math.abs).sum, err)))
    assert(got(2L) == ((0L, 0L, 0L, 0L)))
  }

  test("mutualTopK on real embeddings == reference mutual filter of the top-k list") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val topk = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 3)
      .localCheckpoint() // one scoring pass feeds both paths
    val got = Similarity.mutualTopK(topk).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: collect the directed lists and filter reciprocated pairs
    val directed = topk.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .filter { case (p, n) => p != n }.toSet
    val want = directed.filter { case (p, n) => p < n && directed((n, p)) }
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty, "fixture should produce at least one mutual edge")
  }

  test("int8QuantizeProfile invariants hold on real embeddings") {
    val dim = 64
    val rows = Similarity.int8QuantizeProfile(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scaleNano, sumQ, sumAbsQ, errPico) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(scaleNano >= 0)
      assert(math.abs(sumQ) <= sumAbsQ && sumAbsQ <= 127L * dim)
      // per-element error ≤ (scale/2)²; +1e-9 covers scale_nano's own
      // rounding, +2 pico-units/element the fixed-point rounding slack
      val scale = scaleNano / 1e9 + 1e-9
      val bound = dim * (scale * scale / 4 * 1e12 + 2)
      assert(errPico >= 0 && errPico <= bound,
        s"err_pico $errPico above bound $bound for vec ${r.getLong(0)}")
    }
  }

  test("hardNegatives never returns a same-label neighbor and matches the filtered brute force") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val anchors = vecs.filter(col("vec_id") < 10)
    val got = Similarity.hardNegatives(vecs, anchors,
      "vec_id", "embedding", "label", k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val labels = vecs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (p, _, n, _) =>
      assert(labels(p) != labels(n), s"anchor $p got same-label neighbor $n")
    }
    // differential: full brute-force top-k over a corpus pre-filtered to
    // the anchor's complement must agree (per anchor)
    labels.filterKeys(_ < 10).foreach { case (a, lab) =>
      val want = Similarity.bruteForceTopK(
          vecs.filter(col("label") =!= lab), anchors.filter(col("vec_id") === a),
          "vec_id", "embedding", k = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got.filter(_._1 == a).toSet == want, s"anchor $a diverged")
    }
  }

  test("tripletMine picks the hand-checkable positive/negative; lone-label anchor keeps null pos") {
    val vecs = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),     // anchor
      (2L, 0, Seq(0.9f, 0.1f)),     // same-label, closest → positive
      (3L, 0, Seq(0.0f, 1.0f)),     // same-label, far
      (4L, 1, Seq(0.95f, 0.05f)),   // diff-label, closest → negative
      (5L, 1, Seq(-1.0f, 0.0f)),    // diff-label, far
      (9L, 7, Seq(0.5f, 0.5f))      // the only label-7 vector: no positive
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.tripletMine(vecs, vecs.filter(col("vec_id").isin(1L, 9L)),
      "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    val a1 = got(1L)
    assert(a1.getLong(1) == 2L && a1.getLong(3) == 4L,
      s"anchor 1 picked pos=${a1.get(1)} neg=${a1.get(3)}")
    assert(a1.getDouble(5) == math.rint((a1.getDouble(2) - a1.getDouble(4)) * 1e6) / 1e6)
    val a9 = got(9L)
    assert(a9.isNullAt(1) && a9.isNullAt(2) && a9.isNullAt(5),
      "lone-label anchor must report null positive and margin")
    assert(!a9.isNullAt(3), "lone-label anchor still has a hardest negative")
  }

  test("knnLabelAgreement: tight blobs agree fully, a planted intruder agrees zero") {
    // two tight blobs of 6; vec 99 sits inside blob B but carries label 0
    val rows =
      (0 until 6).map(i => (i.toLong, 0, Seq(1.0f, 0.001f * i))) ++
      (10 until 16).map(i => (i.toLong, 1, Seq(0.001f * (i - 10), 1.0f))) :+
      ((99L, 0, Seq(0.002f, 1.0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.knnLabelAgreement(df, "vec_id", "embedding", "label", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == rows.size, "every vector must report a row")
    assert(got(99L) == ((0L, 0.0)), s"intruder should agree with none: ${got(99L)}")
    (0L until 6L).foreach(id =>
      assert(got(id) == ((5L, 1.0)), s"blob-A vec $id: ${got(id)}"))
    (10L until 16L).foreach(id =>
      assert(got(id)._1 >= 4L, s"blob-B vec $id lost its blob: ${got(id)}"))
  }

  test("prototypeAudit flags the planted mislabel and clears the clean rows") {
    // two tight blobs: label 0 near (1,0,0), label 1 near (0,1,0);
    // vec 99 sits in blob 1 but carries label 0 → must be flagged
    val rows =
      (0 until 8).map(i => (i.toLong, 0, Seq(1.0f, 0.01f * i, 0.0f))) ++
      (10 until 18).map(i => (i.toLong, 1, Seq(0.01f * (i - 10), 1.0f, 0.0f))) :+
      ((99L, 0, Seq(0.0f, 1.0f, 0.02f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.prototypeAudit(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.size == rows.size)
    assert(got(99L)._1 == 1 && got(99L)._3, s"planted mislabel not flagged: ${got(99L)}")
    (rows.map(_._1).toSet - 99L).foreach { id =>
      assert(!got(id)._3, s"clean vec $id falsely flagged: ${got(id)}")
      assert(got(id)._2 > 0.9, s"clean vec $id best_sim too low: ${got(id)}")
    }
  }

  test("prototypeAudit best_sim bounded and self-consistent on real embeddings") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = vecs.count()
    val got = Similarity.prototypeAudit(vecs, "vec_id", "embedding", "label").collect()
    assert(got.length == n, "audit must return every input row exactly once")
    got.foreach { r =>
      val sim = r.getDouble(3)
      assert(sim >= -1.000001 && sim <= 1.000001, s"cosine out of range: $sim")
      assert(r.getBoolean(4) == (r.getInt(1) != r.getInt(2)),
        "mislabeled flag inconsistent with label/pred columns")
    }
  }

  test("pqEncode raises loudly on a ragged (wrong-dimension) vector") {
    val good = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(9.0f, 9.0f))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(good, "vec_id", "embedding",
      dim = 2, m = 2, ksub = 2, iters = 1)
    val ragged = Seq((3L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      Similarity.pqEncode(ragged, cb, "vec_id", "embedding", dim = 2, m = 2).collect())
    assert(e.getMessage != null && e.getMessage.contains("PQ expects"),
      s"wrong error: ${e.getMessage}")
  }

  test("mmrRerankTopK: lambda=1 reproduces pure relevance order") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.8f, 0.2f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", 4)
    val mmr = Similarity.mmrRerankTopK(topk, vecs, "vec_id", "embedding",
      lambda = 1.0, k = 4).orderBy("mmr_rank")
      .collect().map(_.getLong(2)).toSeq
    val rel = topk.orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(mmr === rel, s"λ=1 must be relevance order: $mmr vs $rel")
  }

  test("mmrRerankTopK: diversity pick beats a redundant near-duplicate") {
    // probe ≈ (1,0). Candidates: 2 and 3 are near-duplicates of each
    // other and highly relevant; 4 is orthogonal and less relevant.
    // Pure relevance top-3 = (2, 3, 4); strong-diversity MMR (λ=0.3)
    // must pick 4 SECOND, before the near-duplicate 3.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f)), (3L, Seq(0.98f, 0.02f)),
      (4L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", 4).filter($"neighbor_id" =!= 1L)
    val mmr = Similarity.mmrRerankTopK(topk, vecs, "vec_id", "embedding",
      lambda = 0.3, k = 3).orderBy("mmr_rank")
      .collect().map(_.getLong(2)).toSeq
    assert(mmr.head == 2L, s"first pick must be most relevant: $mmr")
    assert(mmr(1) == 4L, s"diversity must outrank the near-duplicate: $mmr")
  }

  test("kCenterGreedy: farthest-point order, min-id seed, radius decay") {
    // seed = id 1 (min id, origin); farthest is id 3 at (10,0) d²=100;
    // then id 4 at (5,5): min(d² to 1, d² to 3) = min(50, 50) = 50;
    // id 2 at (0.1, 0) is never picked at k=3
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(0.1f, 0.0f)),
      (3L, Seq(10.0f, 0.0f)),
      (4L, Seq(5.0f, 5.0f))).toDF("vec_id", "embedding")
    val out = Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq((1, 1L, 0L), (2, 3L, 100000000L), (3, 4L, 50000000L)),
      out.mkString(", "))
  }

  test("kCenterGreedy: equidistant tie picks the lower id") {
    val vecs = Seq(
      (1L, Seq(0.0f)), (5L, Seq(-3.0f)), (4L, Seq(3.0f)))
      .toDF("vec_id", "embedding")
    val ids = Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(ids === Seq(1L, 4L), ids.mkString(", "))
  }

  test("kCenterGreedy stops early when only center-duplicates remain") {
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out === Seq(1L, 3L), s"duplicates of centers must not be selected: $out")
  }

  test("kCenterGreedy batched scan is bit-identical to one-at-a-time traversal") {
    // scanBatch=1 degenerates to the classic one-pick-per-scan loop;
    // the bound-guarded batch must reproduce its selection EXACTLY —
    // ranks, ids, and radii — on a corpus with repeated distances,
    // duplicates, and enough points to force several rescans
    val vecs = (1 to 60).map { i =>
      (i.toLong, Seq(((i * 37) % 11).toFloat, ((i * 53) % 7).toFloat,
        ((i * 29) % 5).toFloat))
    }.toDF("vec_id", "embedding")
    def run(b: Int) = Similarity
      .kCenterGreedy(vecs, "vec_id", "embedding", k = 24, scanBatch = b)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(16) === run(1))
  }

  test("kCenterGreedy adaptive pool + packed dmin update match " +
    "one-at-a-time exactly past the 64-center fold cutover") {
    // 80 picks from one adaptive scan exercises the packed
    // array-of-arrays update (> 64 new centers in a batch); the classic
    // scanBatch=1 traversal is the ground truth — ranks, ids, AND radii
    val vecs = (1 to 200).map { i =>
      (i.toLong, Seq(((i * 37) % 23).toFloat, ((i * 53) % 17).toFloat,
        ((i * 29) % 13).toFloat))
    }.toDF("vec_id", "embedding")
    def run(b: Int) = Similarity
      .kCenterGreedy(vecs, "vec_id", "embedding", k = 80, scanBatch = b)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val adaptive = run(0)
    assert(adaptive.size == 80)
    assert(adaptive === run(1))
  }

  test("kCenterGreedy rejects k and scanBatch outside the bounded-pool budget") {
    val vecs = Seq((1L, Seq(0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 65537))
    intercept[IllegalArgumentException](
      Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 0))
    intercept[IllegalArgumentException](
      Similarity.kCenterGreedy(vecs, "vec_id", "embedding", k = 2,
        scanBatch = 4097))
  }
}
