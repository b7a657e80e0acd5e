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
    // adversarial id layout: EVERY stride-300 seed lands in blob 0, so the
    // unrefined index has no centroid near blobs 1/2 and their vectors
    // pile into blob-0 buckets; Lloyd rounds must migrate centroids out
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
      threshold = 0.999, centroidStride = 300, nProbe = 2, kmeansIters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows.map { case (id, _) => (id, id + 100001) }.toSet
    assert(want.subsetOf(pairs),
      s"missing twins: ${(want -- pairs).take(5)} (found ${pairs.size})")
  }

  test("ivfTopK with k-means refinement: rank-1 neighbor of a corpus probe is itself") {
    val out = Similarity.ivfTopK(blobs, blobs.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 2, centroidStride = 25, kmeansIters = 2)
      .filter(col("rank") === 1).collect()
    assert(out.nonEmpty)
    out.foreach(r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("probe_id")))
  }
}
