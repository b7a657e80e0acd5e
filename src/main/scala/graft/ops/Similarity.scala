package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Scale design (100 TB): `bruteForceTopK` broadcasts the (small) probe
  * set and linearly scans the corpus — no corpus shuffle; the only wide
  * exchange is the per-probe top-k window over the scored candidates.
  * `ivfTopK` is the scale path: corpus rows are pre-assigned to the
  * nearest of C centroids (broadcast), and a probe only scores its own
  * cluster — a C-fold scan reduction, trading recall exactly like a
  * classical IVF-flat index. */
object Similarity {

  /** Exact top-k cosine neighbors for each probe (probe set must be small
    * enough to broadcast). Deterministic: ties broken by neighbor id on
    * the score rounded to 6 decimals.
    *
    * Ranking uses the [[graft.functions.TopKByScore]] bounded-heap
    * aggregate, not a row_number window: partial aggregation keeps top-k
    * per partition map-side, so only O(probes × k) rows cross the
    * shuffle instead of the full O(corpus × probes) scored set. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(p))
      .withColumn("score", round(cosineSimilarity(col("pv"), col("cv")), 6))
    rankTopK(scored, k)
  }

  /** groupBy(probe_id) + bounded-heap top-k → exploded (rank, id, score). */
  private[ops] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("probe_id"))
      .agg(topKByScore(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("probe_id"), posexplode(col("topk")).as(Seq("r0", "nb")))
      .select(col("probe_id"), (col("r0") + 1).cast("int").as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("score"))

  /** Assign each vector the id of its nearest centroid (L2). Centroids
    * must be a small broadcastable set with columns (centroid_id, cv).
    *
    * Argmin is `min(struct(dist2, centroid_id))` under a groupBy — a
    * PARTIAL (map-side) aggregate that collapses each vector's C scored
    * rows before the exchange, so the shuffle carries one row per vector.
    * (The round-1 row_number window shuffled corpus × C rows to sort
    * them; tie-break — smaller centroid_id — is identical.) */
  def assignIvfCluster(vecs: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val scored = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(centroids))
      .withColumn("dist2", l2DistanceSquared(col("v"), col("cv")))
    scored.groupBy(col("id"))
      .agg(first(col("v")).as("v"),
        min(struct(col("dist2"), col("centroid_id"))).as("best"))
      .select(col("id"), col("v"), col("best.centroid_id").as("cluster"))
  }

  /** Lloyd's k-means over the embedding column, as plain DataFrame
    * rounds: broadcast-assign every vector to its nearest centroid
    * ([[assignIvfCluster]] — map-side argmin), recompute each centroid
    * as the element-wise mean (posexplode → groupBy (cluster, dim) →
    * avg → rebuild, all partial-aggregated). Only (cluster, dim, sum)
    * rows cross the shuffle. Centroids (k × dim doubles) are collected
    * per round — they are the index's dimension table, driver-small by
    * definition — which also truncates the iterative lineage. Init is a
    * deterministic hash-ordered pick; empty clusters drop out. */
  def kMeansCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val init = vecs
      .select(col(idCol).as("centroid_id"), col(vecCol).cast("array<double>").as("cv"))
      .orderBy(xxhash64(col("centroid_id")), col("centroid_id")).limit(k)
    refineCentroids(vecs, init, idCol, vecCol, iters)
  }

  /** Lloyd rounds from a given initial centroid set (see
    * [[kMeansCentroids]] for the plan shape). */
  def refineCentroids(vecs: DataFrame, init: DataFrame, idCol: String,
      vecCol: String, iters: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val doubled = vecs.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    var centroids = init
      .select(col("centroid_id"), col("cv").cast("array<double>").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = assignIvfCluster(doubled, centroids, idCol, "__v")
      val means = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim")).agg(avg(col("x")).as("mx"))
        .groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("dim"), col("mx")))).as("ds"))
        .select(col("cluster").as("centroid_id"),
          transform(col("ds"), d => d.getField("mx")).as("cv"))
      centroids = spark.createDataFrame(
        means.select("centroid_id", "cv").as[(Long, Seq[Double])].collect().toSeq)
        .toDF("centroid_id", "cv")
    }
    centroids
  }

  /** IVF-flat approximate top-k: probes only score corpus vectors in
    * their own cluster. `centroidStride` deterministically picks every
    * Nth vector as a centroid; `kmeansIters` > 0 refines that pick with
    * Lloyd rounds over the corpus (same partitioning/shuffle shape
    * either way — refinement only moves the cluster boundaries). */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, centroidStride: Int = 50,
      kmeansIters: Int = 0): DataFrame = {
    val centroids0 = corpus.filter(col(idCol) % centroidStride === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
    val centroids =
      if (kmeansIters <= 0) centroids0
      else refineCentroids(corpus, centroids0, idCol, vecCol, kmeansIters)
    val corpusAssigned = assignIvfCluster(corpus, centroids, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("cv2"), col("cluster"))
    val probesAssigned = assignIvfCluster(probes, centroids, idCol, vecCol)
      .select(col("id").as("probe_id"), col("v").as("pv"), col("cluster"))
    val scored = corpusAssigned.join(broadcast(probesAssigned), Seq("cluster"))
      .withColumn("score", round(cosineSimilarity(col("pv"), col("cv2")), 6))
    rankTopK(scored, k)
  }
}
