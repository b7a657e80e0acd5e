package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an embedding column — the
  * dimensionality-reduction step an embedding pipeline runs before
  * indexing (ANN in a 16-dim whitened space is both faster and often
  * higher-recall than raw 64-dim cosine) and the drift gauge a corpus
  * monitor watches (an eigenspectrum shift is an early signal the
  * embedding distribution moved).
  *
  * Scale design (100 TB): the corpus is touched by ONE map-side-combined
  * aggregation pass that reduces to dimension-scale state — d mean sums
  * plus the d(d+1)/2 upper-triangle Gram sums (64-dim → 2 144 cells).
  * Only (cell, partial-sum) rows cross the exchange; the eigensolve runs
  * on the driver over the collected d×d matrix (microseconds — the same
  * "codebooks are the only collected state" discipline as
  * [[Similarity.pqCodebooks]]). Projection/whitening is a broadcast-free
  * map-only pass (the model rides the plan as a literal).
  *
  * Determinism discipline (the q29/q88 integer rule): elements are
  * quantized to integer MICROS per element and the moment sums
  * accumulate as DECIMAL(38,0) — exact integer arithmetic at any corpus
  * size, so the fitted model (and the pinned spectrum golden) cannot
  * move with partitioning or task order. The only float math is the
  * driver-side covariance division and the Jacobi eigensolve, both
  * deterministic functions of the exact integer sums. */
object Pca {

  /** Quantization scale: 1e6 keeps per-element error at 5e-7 while the
    * per-cell products (≤ ~1e12 for unit-range embeddings) stay far
    * inside DECIMAL(38,0) even at 1e12 rows. */
  private val Q = 1e6

  /** A fitted PCA model: `components(j)` is the j-th eigenvector (unit
    * norm, sign-fixed so its largest-magnitude element is positive),
    * `eigenvalues(j)` the matching population variance, both sorted
    * descending. */
  final case class PcaModel(dim: Int, n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]]) {
    def explainedVariance: Array[Double] = {
      val tot = eigenvalues.sum
      if (tot <= 0) eigenvalues.map(_ => 0.0)
      else eigenvalues.map(_ / tot)
    }
  }

  private def quantized(v: Column, dim: Int): Column = {
    val checked = when(size(v) === dim, v).otherwise(raise_error(
      concat(lit(s"PCA expects $dim-dim vectors, got "), size(v).cast("string"))))
    transform(checked.cast("array<double>"), x => round(x * Q).cast("long"))
  }

  /** One distributed pass → exact integer moment sums → driver-side
    * covariance + cyclic-Jacobi eigensolve. Population covariance
    * (divide by n), matching the spectral convention where eigenvalues
    * sum to the total per-element variance.
    *
    * The moment pass is the [[graft.functions.VectorMomentsAgg]]
    * imperative kernel: per input row it does the d(d+1)/2 + d
    * multiply-adds into a flat long buffer (BigInteger spill before any
    * overflow — exact at any n), so only one partial buffer per task
    * crosses the exchange; the earlier explode+groupBy formulation
    * materialized 2 144 cell rows per VECTOR before the partial
    * aggregate and priced the fit ~20× higher. Results are bit-identical
    * (both are exact integer sums). */
  def fit(vecs: DataFrame, vecCol: String, dim: Int): PcaModel = {
    val row = vecs.select(quantized(col(vecCol), dim).as("vm"))
      .agg(graft.functions.vectorMoments(col("vm"), dim).as("m"))
      .select(col("m.n").as("n"), col("m.sums").as("sums"))
      .head()
    val n = row.getLong(0)
    require(n > 0, "PCA fit on an empty corpus")
    val sums = row.getSeq[java.math.BigDecimal](1)
    val mean = new Array[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim) mean(i) = sums(i).doubleValue() / (n * Q)
    var k = dim
    for (i <- 0 until dim; j <- i until dim) {
      cov(i)(j) = sums(k).doubleValue() / (n * Q * Q)
      cov(j)(i) = cov(i)(j)
      k += 1
    }
    for (i <- 0 until dim; j <- 0 until dim)
      cov(i)(j) -= mean(i) * mean(j)
    val (eigVals, eigVecs) = jacobiEigen(cov)
    PcaModel(dim, n, mean, eigVals, eigVecs)
  }

  /** Project (and optionally whiten) onto the top `p` components — a
    * map-only pass; the (p × d) matrix and mean ride the plan as
    * literals, every dot product is a fixed-order in-row fold (no
    * cross-row float sums, so output is partitioning-independent). */
  def project(df: DataFrame, model: PcaModel, vecCol: String,
      outCol: String, p: Int, whiten: Boolean = false): DataFrame = {
    require(p >= 1 && p <= model.dim, s"p=$p outside 1..${model.dim}")
    val rows: Array[Array[Double]] = (0 until p).map { j =>
      val scale = if (whiten) 1.0 / math.sqrt(math.max(model.eigenvalues(j), 1e-12)) else 1.0
      model.components(j).map(_ * scale)
    }.toArray
    // the codegen'd one-pass kernel: quantize+center once per row, then
    // a p×d mat-vec — bit-identical to (and ~10× cheaper than) the HOF
    // transform/zip_with/aggregate spelling, which re-evaluated the
    // centering chain per component
    df.withColumn(outCol,
      graft.functions.pcaProject(col(vecCol).cast("array<double>"),
        model.mean, rows, Q))
  }

  /** Mahalanobis distance of every vector to the corpus mean — the
    * embedding-space outlier score a curation pipeline thresholds to
    * catch off-manifold junk (corrupt encodes, wrong-modality rows,
    * adversarial inputs): the L2 norm of the FULL-rank whitened
    * projection is exactly the Mahalanobis distance under the fitted
    * covariance. Map-only given a model (the fit is the only corpus
    * pass); in-row fixed-order folds keep it partitioning-independent,
    * round(6) makes it golden-pinnable. */
  def mahalanobis(df: DataFrame, model: PcaModel, vecCol: String,
      outCol: String): DataFrame =
    project(df, model, vecCol, "__w", model.dim, whiten = true)
      .withColumn(outCol, round(sqrt(aggregate(
        transform(col("__w"), v => v * v), lit(0.0), _ + _)), 6))
      .drop("__w")

  /** Spectrum profile rows for a fitted model: (component, eig_pico,
    * cumvar_micro) — integer-rounded so the golden pins exactly. */
  def spectrumRows(model: PcaModel): Seq[(Int, Long, Long)] = {
    val ev = model.explainedVariance
    var cum = 0.0
    model.eigenvalues.zipWithIndex.map { case (l, j) =>
      cum += ev(j)
      (j, math.round(l * 1e12), math.round(cum * 1e6))
    }.toSeq
  }

  /** The build-once half of the deployment split: a fitted model as a
    * tiny frame (one mean row idx = -1 + one row per component) that
    * writes to the warehouse next to the corpus it was fitted on — the
    * same artifact discipline as the PQ codebook
    * ([[Similarity.pqTopKWithCodebook]]). Serving paths restore with
    * [[modelFromFrame]] and pay only the map-only [[project]]. */
  def modelToFrame(spark: org.apache.spark.sql.SparkSession,
      model: PcaModel): DataFrame = {
    import spark.implicits._
    val rows = (-1, 0.0, model.mean.toSeq, model.dim, model.n) +:
      model.eigenvalues.zip(model.components).zipWithIndex.map {
        case ((l, v), j) => (j, l, v.toSeq, model.dim, model.n)
      }.toSeq
    rows.toDF("idx", "eigenvalue", "values", "dim", "n")
  }

  /** Restore a model persisted via [[modelToFrame]]; collects only the
    * dimension-scale artifact rows. */
  def modelFromFrame(df: DataFrame): PcaModel = {
    val rows = df.select(col("idx"), col("eigenvalue"), col("values"),
      col("dim"), col("n")).collect()
    require(rows.nonEmpty, "empty PCA model frame")
    val dim = rows.head.getInt(3)
    val n = rows.head.getLong(4)
    val mean = rows.find(_.getInt(0) == -1)
      .getOrElse(throw new IllegalArgumentException("model frame has no mean row"))
      .getSeq[Double](2).toArray
    val comps = rows.filter(_.getInt(0) >= 0).sortBy(_.getInt(0))
    require(comps.nonEmpty, "model frame has no component rows")
    PcaModel(dim, n, mean, comps.map(_.getDouble(1)),
      comps.map(_.getSeq[Double](2).toArray))
  }

  /** Cyclic Jacobi eigensolve for a symmetric matrix: deterministic
    * sweep order, converges quadratically; d=64 solves in microseconds.
    * Returns (eigenvalues desc, matching unit eigenvectors sign-fixed so
    * each vector's largest-|x| element is positive — the conventional
    * determinism fix, since an eigenvector's sign is arbitrary). */
  private[ops] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 100) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
          val t = math.signum(theta) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
            case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1))
          }
          val c = 1.0 / math.sqrt(t * t + 1)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      val imax = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      val fixed = if (vec(imax) < 0) vec.map(-_) else vec
      (a(j)(j), fixed)
    }.sortBy { case (l, vec) => (-l, vec.headOption.getOrElse(0.0)) }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    val d = a.length
    for (i <- 0 until d; j <- 0 until d if i != j) s += a(i)(j) * a(i)(j)
    s
  }
}
