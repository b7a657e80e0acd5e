package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Near-duplicate detection operators for large-scale training-data
  * pipelines. All are pure DataFrame→DataFrame with LSH-style blocking so
  * the candidate set — never the full cross product — is what shuffles.
  *
  * Scale design (100 TB): candidate generation explodes each doc into a
  * few small (band, hash) keys and equi-joins on them; verification
  * re-joins the pair list back to the docs table on id (hash join on a
  * compact pair list) instead of carrying shingle arrays through the
  * band explode, which would multiply scan output by the band count.
  */
object Dedup {

  /** Exact duplicate groups by content hash; keeps the minimum id as the
    * canonical representative (deterministic). */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_dups"))

  /** MinHash+LSH near-dup pairs: word-shingle → k minhashes → `bands`
    * band keys → equi-join on band key → exact shingle-Jaccard verify.
    * Returns (a_id, b_id, jaccard) with a_id < b_id. */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, shingleLen: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    // shingle set is consumed three times (banding + both verify joins);
    // persist so the text is shingled once, not per consumer
    val base = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleLen).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base
      .withColumn("sig", minHashSignature(col("shingles"), k))
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
    val candidates = banded.as("x").join(banded.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    candidates
      .join(base.select(col("id").as("a_id"), col("shingles").as("a_sh")), "a_id")
      .join(base.select(col("id").as("b_id"), col("shingles").as("b_sh")), "b_id")
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into 4×16-bit chunks
    * (any pair within Hamming distance 3 of each other shares at least one
    * intact chunk; we use it as a recall-oriented blocker and verify with
    * the exact popcount). Returns (a_id, b_id, hamming), a_id < b_id. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val base = docs.select(col(idCol).as("id"), simHash(col(textCol)).as("sh"))
    val banded = base.select(col("id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL)).as("chunk"))): _*)).as("bk"))
    banded.as("x").join(banded.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        hamming64(col("x.sh"), col("y.sh")).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard pairs. Candidates come from MinHash-LSH
    * banding over the SAME char n-gram sets (not a quadratic in-block
    * pairing — a 500-doc block is already 125k exact Jaccards, which is
    * what turns this O(block²) at scale); the exact n-gram Jaccard then
    * verifies each candidate. Band geometry trades recall at the
    * threshold against candidate volume from background similarity —
    * 8 bands × 4 rows keeps pairs at background j≈0.1 to ~1e-3
    * collision probability; pick a shingle length n at which unrelated
    * docs actually look different (char-3 saturates on small
    * vocabularies; char-6 separates). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 6, threshold: Double = 0.6,
      k: Int = 32, bands: Int = 8): DataFrame = {
    val rows = k / bands
    val base = docs.select(col(idCol).as("id"),
      charShingles(col(textCol), n).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base
      .withColumn("sig", minHashSignature(col("grams"), k))
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
    val candidates = banded.as("x").join(banded.as("y"), col("x.bk") === col("y.bk"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    candidates
      .join(base.select(col("id").as("a_id"), col("grams").as("a_g")), "a_id")
      .join(base.select(col("id").as("b_id"), col("grams").as("b_g")), "b_id")
      .withColumn("jaccard", jaccard(col("a_g"), col("b_g")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact pairwise n-gram Jaccard within a caller-supplied block —
    * only for blocks known to be small (the reference-style state/chamber
    * blocking); prefer [[ngramJaccardPairs]] otherwise. */
  def ngramJaccardPairsBlocked(docs: DataFrame, idCol: String, textCol: String,
      blockCol: Column, n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      charShingles(col(textCol), n).as("grams"), blockCol.as("block"))
    base.as("x").join(base.as("y"), col("x.block") === col("y.block"))
      .filter(col("x.id") < col("y.id"))
      .withColumn("jaccard", jaccard(col("x.grams"), col("y.grams")))
      .filter(col("jaccard") >= threshold)
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Connected components over a near-dup pair list by iterative
    * min-label propagation: every doc adopts the smallest id reachable
    * through pairs. Converges in O(log(longest chain)) rounds because
    * labels hop through both endpoints each round; each round is two
    * hash joins + one aggregation (no driver-side graph). Returns
    * (id, component) where component = min id of the cluster. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true) // materialize once; truncate upstream lineage
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("component"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // propagate: my new label = min(my label, min over neighbors' labels).
      // Each round is checkpointed eagerly — iterative plans otherwise grow
      // a doubling lineage that drowns the optimizer.
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("nbr_component"))
      val next = labels.join(neighborLabels, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Apply a dedup decision: keep one representative per component (the
    * minimum id) and every doc not in any pair. */
  def applyDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("component")).select(col("id"))
    docs.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** Embedding cosine near-dup pairs within a blocking key. The scale
    * path replaces the block column with an LSH/IVF bucket id (see
    * [[Similarity.assignIvfCluster]]). */
  def embeddingNearDups(vecs: DataFrame, idCol: String, vecCol: String,
      blockCol: Column, threshold: Double = 0.99): DataFrame = {
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"), blockCol.as("block"))
    base.as("x").join(base.as("y"), col("x.block") === col("y.block"))
      .filter(col("x.id") < col("y.id"))
      .withColumn("cosine", cosineSimilarity(col("x.v"), col("y.v")))
      .filter(col("cosine") >= threshold)
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
