package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobiEigen recovers a known symmetric spectrum") {
    // A = [[2,1],[1,2]] → eigenvalues 3 (vec ∝ (1,1)) and 1 (vec ∝ (1,-1))
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s = math.sqrt(0.5)
    assert(vecs(0).zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(math.abs(math.abs(vecs(1)(0)) - s) < 1e-12 &&
      math.abs(vecs(1)(0) + vecs(1)(1)) < 1e-12)
  }

  test("jacobiEigen eigenvectors are orthonormal on a random symmetric matrix") {
    val rnd = new scala.util.Random(7)
    val d = 16
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) { m(i)(j) = rnd.nextGaussian(); m(j)(i) = m(i)(j) }
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "eigenvalues not descending")
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => vecs(a)(i) * vecs(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<v$a, v$b> = $dot")
    }
    // Σλ = trace
    assert(math.abs(vals.sum - (0 until d).map(i => m(i)(i)).sum) < 1e-9)
  }

  // anisotropic 3-D fixture: variance concentrated along x, then y, ~none z
  private lazy val aniso = {
    val rows = (0 until 200).map { i =>
      val t = (i % 41) - 20
      val u = (i % 13) - 6
      (i.toLong, Seq((3.0 * t * 0.05 + 1.0).toFloat, (u * 0.05 - 0.5).toFloat,
        (0.01 * ((i % 3) - 1)).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fit recovers the dominant axes and the mean; spectrum rows are sane") {
    val model = Pca.fit(aniso, "embedding", dim = 3)
    assert(model.n == 200)
    assert(math.abs(model.mean(0) - 1.0) < 0.08 && math.abs(model.mean(1) + 0.5) < 0.08)
    assert(model.eigenvalues(0) > model.eigenvalues(1) &&
      model.eigenvalues(1) > model.eigenvalues(2))
    // dominant component ≈ ±x axis
    assert(math.abs(model.components(0)(0)) > 0.99,
      s"top component not x-aligned: ${model.components(0).toSeq}")
    val spec = Pca.spectrumRows(model)
    assert(spec.length == 3 && spec.last._3 == 1000000L,
      "cumulative explained variance must end at exactly 1e6 micro")
  }

  test("whitened projection has ~identity covariance and matches a driver-side reference") {
    val model = Pca.fit(aniso, "embedding", dim = 3)
    val proj = Pca.project(aniso, model, "embedding", "y", p = 2, whiten = true)
      .select(col("vec_id"), col("y")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // sample covariance of the whitened projection ≈ I (population scaling)
    val ys = proj.values.toArray
    val n = ys.length.toDouble
    for (a <- 0 until 2; b <- 0 until 2) {
      val ma = ys.map(_(a)).sum / n
      val mb = ys.map(_(b)).sum / n
      val c = ys.map(y => (y(a) - ma) * (y(b) - mb)).sum / n
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(c - want) < 0.05, s"whitened cov($a,$b) = $c")
    }
    // reference: quantize exactly like the op, center, dot with scaled component
    val vecs = aniso.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, v) =>
      val xq = v.map(x => math.rint(x * 1e6) / 1e6)
      (0 until 2).foreach { j =>
        val scale = 1.0 / math.sqrt(math.max(model.eigenvalues(j), 1e-12))
        val want = xq.zip(model.mean).zip(model.components(j))
          .foldLeft(0.0) { case (acc, ((x, mu), w)) => acc + (x - mu) * w * scale }
        assert(math.abs(proj(id)(j) - want) < 1e-9, s"vec $id comp $j")
      }
    }
  }

  test("vectorMoments: exact through long-overflow spill paths, partitioning-independent") {
    // mixed magnitudes force every accumulator path: ~2.5e9 products are
    // ~6.2e18 (one row fits a long, two must spill), 5e9 products
    // overflow a long outright (the direct-BigInteger row path)
    val rows = (0 until 60).map { i =>
      val base = if (i % 3 == 2) 5000000000L else 2500000000L
      Tuple1(Seq(base + i, -base + 7 * i))
    }
    val df = rows.toDF("vm")
    def run(parts: Int) = df.repartition(parts)
      .agg(graft.functions.vectorMoments(col("vm"), 2).as("m"))
      .select(col("m.n"), col("m.sums")).head()
    val a = run(1)
    val b = run(32)
    assert(a.getLong(0) == 60L && b.getLong(0) == 60L)
    assert(a.getSeq[java.math.BigDecimal](1) == b.getSeq[java.math.BigDecimal](1),
      "moments depend on partitioning")
    val xs = rows.map(_._1)
    val want = Seq(
      xs.map(v => BigInt(v(0))).sum, xs.map(v => BigInt(v(1))).sum,
      xs.map(v => BigInt(v(0)) * BigInt(v(0))).sum,
      xs.map(v => BigInt(v(0)) * BigInt(v(1))).sum,
      xs.map(v => BigInt(v(1)) * BigInt(v(1))).sum)
    val got = a.getSeq[java.math.BigDecimal](1).map(bd => BigInt(bd.toBigInteger))
    assert(got == want, s"got $got want $want")
  }

  test("model frame round-trip restores the model exactly; projection agrees") {
    val model = Pca.fit(aniso, "embedding", dim = 3)
    val back = Pca.modelFromFrame(Pca.modelToFrame(spark, model))
    assert(back.dim == model.dim && back.n == model.n)
    assert(back.mean.toSeq == model.mean.toSeq)
    assert(back.eigenvalues.toSeq == model.eigenvalues.toSeq)
    assert(back.components.map(_.toSeq).toSeq == model.components.map(_.toSeq).toSeq)
    val a = Pca.project(aniso, model, "embedding", "y", p = 2, whiten = true)
      .select("vec_id", "y").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Pca.project(aniso, back, "embedding", "y", p = 2, whiten = true)
      .select("vec_id", "y").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b, "restored model projects differently")
  }

  test("mahalanobis ranks the planted off-manifold vector first") {
    // inliers live on the (x, y) pattern of the aniso fixture; vec 999
    // sticks out along the near-dead z axis, which whitening amplifies
    val outlier = Seq((999L, Seq(1.0f, -0.5f, 5.0f))).toDF("vec_id", "embedding")
    val df = aniso.union(outlier)
    val model = Pca.fit(df, "embedding", dim = 3)
    val got = Pca.mahalanobis(df, model, "embedding", "mdist")
      .orderBy(col("mdist").desc, col("vec_id")).collect()
    assert(got.head.getLong(0) == 999L,
      s"planted outlier not ranked first: ${got.take(3).map(_.toSeq).toSeq}")
    val scores = got.map(r => r.getLong(0) -> r.getAs[Double]("mdist")).toMap
    assert(scores(999L) > 3 * scores.filterKeys(_ != 999L).values.max / 2,
      s"outlier score not separated: ${scores(999L)} vs inlier max")
    // inlier Mahalanobis distances concentrate near sqrt(dim)
    val inliers = scores.filterKeys(_ != 999L).values
    assert(inliers.max < 3 * math.sqrt(3) && inliers.min >= 0.0)
  }

  test("fit raises on ragged vectors and on an empty corpus") {
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](Pca.fit(ragged, "embedding", dim = 2))
    assert(e.getMessage != null && e.getMessage.contains("PCA expects"),
      s"wrong error: ${e.getMessage}")
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException](Pca.fit(empty, "embedding", dim = 2))
    assert(e2.getMessage.contains("empty"))
  }

  test("full-rank unwhitened projection preserves L2 ranking (recall@k = 1)") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Pca.fit(vecs, "embedding", dim = 64)
    val red = Pca.project(vecs, model, "embedding", "y", p = 64)
      .select(col("vec_id"), col("y"))
    val probes = col("vec_id") < 5
    val truth = Similarity.bruteForceTopKL2(vecs, vecs.filter(probes),
      "vec_id", "embedding", k = 3)
    val approx = Similarity.bruteForceTopKL2(red, red.filter(probes),
      "vec_id", "y", k = 3)
    val rec = Similarity.recallAtK(truth, approx, k = 3).collect()
    assert(rec.length == 5)
    rec.foreach { r =>
      val recall = r.getDouble(r.fieldIndex("recall"))
      assert(recall == 1.0, s"probe ${r.get(0)} recall $recall — rotation broke L2 ranking")
    }
  }

  test("fit is partitioning-independent (exact integer moments)") {
    val m1 = Pca.fit(aniso.repartition(1), "embedding", dim = 3)
    val m32 = Pca.fit(aniso.repartition(32), "embedding", dim = 3)
    assert(m1.eigenvalues.toSeq == m32.eigenvalues.toSeq)
    assert(m1.mean.toSeq == m32.mean.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m32.components.map(_.toSeq).toSeq)
  }

  test("pcaProject kernel is bit-identical to the HOF spelling it replaced") {
    // the pinned q103/q104/q105/q111 goldens ride on this equivalence:
    // same HALF_UP element quantization, same ascending fold order
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Pca.fit(vecs, "embedding", dim = 64)
    for (whiten <- Seq(false, true)) {
      val p = 16
      val rows: Seq[Seq[Double]] = (0 until p).map { j =>
        val s = if (whiten) 1.0 / math.sqrt(math.max(model.eigenvalues(j), 1e-12)) else 1.0
        model.components(j).map(_ * s).toSeq
      }
      val hof = vecs.withColumn("__proj", transform(typedlit(rows), row =>
        aggregate(zip_with(zip_with(
          transform(col("embedding").cast("array<double>"),
            x => round(x * 1e6).cast("long")),
          typedlit(model.mean.toSeq), (x, mu) => x / 1e6 - mu),
          row, _ * _), lit(0.0), _ + _)))
        .select(col("vec_id"), col("__proj"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val kernel = Pca.project(vecs, model, "embedding", "__proj", p, whiten)
        .select(col("vec_id"), col("__proj"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(kernel == hof, s"whiten=$whiten: kernel diverged from HOF")
    }
  }
}
