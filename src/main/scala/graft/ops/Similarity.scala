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
    * must be a small broadcastable set with columns (centroid_id, cv). */
  def assignIvfCluster(vecs: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val scored = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(centroids))
      .withColumn("dist2", l2DistanceSquared(col("v"), col("cv")))
    val w = Window.partitionBy(col("id")).orderBy(col("dist2"), col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("v"), col("centroid_id").as("cluster"))
  }

  /** IVF-flat approximate top-k: probes only score corpus vectors in
    * their own cluster. `centroidStride` deterministically picks every
    * Nth vector as a centroid (a real system would run k-means; the
    * partitioning/shuffle shape is identical). */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, centroidStride: Int = 50): DataFrame = {
    val centroids = corpus.filter(col(idCol) % centroidStride === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
    val corpusAssigned = assignIvfCluster(corpus, centroids, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("cv2"), col("cluster"))
    val probesAssigned = assignIvfCluster(probes, centroids, idCol, vecCol)
      .select(col("id").as("probe_id"), col("v").as("pv"), col("cluster"))
    val scored = corpusAssigned.join(broadcast(probesAssigned), Seq("cluster"))
      .withColumn("score", round(cosineSimilarity(col("pv"), col("cv2")), 6))
    rankTopK(scored, k)
  }
}
