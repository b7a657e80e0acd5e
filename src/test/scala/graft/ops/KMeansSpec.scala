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

  test("ivfTopK with k-means refinement: rank-1 neighbor of a corpus probe is itself") {
    val out = Similarity.ivfTopK(blobs, blobs.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 2, centroidStride = 25, kmeansIters = 2)
      .filter(col("rank") === 1).collect()
    assert(out.nonEmpty)
    out.foreach(r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("probe_id")))
  }
}
