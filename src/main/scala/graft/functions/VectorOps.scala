package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass vector math over array<float|double> columns. The HOF
  * formulation (`aggregate(zip_with(...))`) is interpreted and allocates
  * a zipped array per row-pair; these run inside whole-stage codegen —
  * the difference between an ANN scan being compute-bound and
  * allocation-bound.
  *
  * Accumulation order matches the HOF/DuckDB sequential element order so
  * cosine scores stay bit-identical to the oracle. */
object VectorOps {

  private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aFloat)
      val y = get(b, i, bFloat)
      dot += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += get(a, i, aFloat) * get(b, i, bFloat)
      i += 1
    }
    s
  }

  def l2(a: ArrayData, isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = get(a, i, isFloat)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  def l2dist2(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, i, aFloat) - get(b, i, bFloat)
      s += d * d
      i += 1
    }
    s
  }

  private[functions] def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }
}

abstract class BinaryVectorExpression extends BinaryExpression {
  protected lazy val lFloat: Boolean = VectorOps.isFloatArray(left)
  protected lazy val rFloat: Boolean = VectorOps.isFloatArray(right)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def fn: String
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalVec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalVec(a: ArrayData, b: ArrayData): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.$fn($a, $b, $lFloat, $rFloat)")
}

case class CosineSim(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def fn: String = "cosine"
  override protected def evalVec(a: ArrayData, b: ArrayData): Double =
    VectorOps.cosine(a, b, lFloat, rFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def fn: String = "dot"
  override protected def evalVec(a: ArrayData, b: ArrayData): Double =
    VectorOps.dot(a, b, lFloat, rFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

case class L2Dist2(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def fn: String = "l2dist2"
  override protected def evalVec(a: ArrayData, b: ArrayData): Double =
    VectorOps.l2dist2(a, b, lFloat, rFloat)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Dist2 =
    copy(left = l, right = r)
  override def prettyName: String = "l2_dist2"
}

case class L2Norm(child: Expression) extends UnaryExpression {
  private lazy val isFloat: Boolean = VectorOps.isFloatArray(child)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.l2(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.l2($c, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
  override def prettyName: String = "l2_norm"
}

/** One-pass PCA projection kernel: quantize + center ONCE per row, then
  * a tight p×d mat-vec with zero per-component allocation. Replaces the
  * HOF spelling `transform(rows, r => aggregate(zip_with(centered, r,
  * _*_), 0.0, _+_))`, which re-evaluated the centize-and-center chain
  * and allocated a zipped array for EVERY component (p× the work,
  * 2p allocations per row — the q103 moment-explode lesson applied to
  * the projection side).
  *
  * Bit-exactness contract (pinned goldens depend on it): the element
  * quantization replicates Spark's `round(x*Q)` exactly
  * (BigDecimal.valueOf HALF_UP — same code path the Round expression
  * takes for doubles), and each dot product folds elements in ascending
  * index order, matching the zip_with/aggregate evaluation order. */
object PcaKernel {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def project(v: ArrayData, mean: Array[Double], rows: Array[Array[Double]],
      q: Double, isFloat: Boolean): GenericArrayData = {
    val d = mean.length
    if (v.numElements() != d) throw new IllegalArgumentException(
      s"PCA expects $d-dim vectors, got ${v.numElements()}")
    val centered = new Array[Double](d)
    var i = 0
    while (i < d) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val qi = java.math.BigDecimal.valueOf(x * q)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      centered(i) = qi / q - mean(i)
      i += 1
    }
    val p = rows.length
    val out = new Array[Double](p)
    var j = 0
    while (j < p) {
      val row = rows(j)
      var acc = 0.0
      var k = 0
      while (k < d) {
        acc += centered(k) * row(k)
        k += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class PcaProject(child: Expression, mean: Array[Double],
    rows: Array[Array[Double]], q: Double) extends UnaryExpression {
  private lazy val isFloat: Boolean = VectorOps.isFloatArray(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    PcaKernel.project(input.asInstanceOf[ArrayData], mean, rows, q, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val rowsRef = ctx.addReferenceObj("pcaRows", rows, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PcaKernel.project($c, $meanRef, $rowsRef, $q, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
  override def prettyName: String = "pca_project"
}

/** Maximal-marginal-relevance greedy re-rank (Carbonell & Goldstein
  * 1998): from a per-probe candidate list (id, relevance, vector),
  * select k items maximizing λ·relevance − (1−λ)·max-cosine-to-already-
  * selected — the standard serving-side diversity re-rank that keeps a
  * result page from being k near-duplicates. The first pick is the most
  * relevant candidate (score desc, id asc); every later pick maintains
  * the max-similarity column INCREMENTALLY (one cosine per remaining
  * candidate per pick — O(k·n), never the full n² matrix). Ties break
  * to the lower id, so the selection is a pure function of the input
  * list. */
object MmrKernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def rerank(cands: ArrayData, lam: Double, k: Int): GenericArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val scores = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = cands.get(i, null).asInstanceOf[InternalRow]
      ids(i) = row.getLong(0)
      scores(i) = row.getDouble(1)
      val v = row.getArray(2)
      val d = v.numElements()
      val arr = new Array[Double](d)
      var j = 0
      while (j < d) { arr(j) = v.getDouble(j); j += 1 }
      vecs(i) = arr
      i += 1
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = math.min(a.length, b.length)
      var dot = 0.0; var aa = 0.0; var bb = 0.0; var j = 0
      while (j < d) { dot += a(j) * b(j); aa += a(j) * a(j); bb += b(j) * b(j); j += 1 }
      val den = math.sqrt(aa) * math.sqrt(bb)
      if (den == 0.0) 0.0 else dot / den
    }
    val take = math.min(k, n)
    val out = new Array[Long](take)
    val chosen = new Array[Boolean](n)
    val maxSim = new Array[Double](n)
    var t = 0
    while (t < take) {
      var best = -1
      var bestVal = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!chosen(c)) {
          // first pick: pure relevance; later picks: the MMR objective
          val obj = if (t == 0) scores(c)
            else lam * scores(c) - (1.0 - lam) * maxSim(c)
          if (obj > bestVal || (obj == bestVal && (best < 0 || ids(c) < ids(best)))) {
            best = c; bestVal = obj
          }
        }
        c += 1
      }
      chosen(best) = true
      out(t) = ids(best)
      var r = 0
      while (r < n) {
        if (!chosen(r)) {
          val s = cos(vecs(r), vecs(best))
          if (s > maxSim(r)) maxSim(r) = s
        }
        r += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class MmrRerank(child: Expression, lam: Double, k: Int)
    extends UnaryExpression {
  require(lam >= 0.0 && lam <= 1.0, s"mmr_rerank: lambda must be in [0, 1], got $lam")
  require(k >= 1, s"mmr_rerank: k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    MmrKernel.rerank(input.asInstanceOf[ArrayData], lam, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MmrKernel.rerank($c, $lam, $k)")
  override protected def withNewChildInternal(newChild: Expression): MmrRerank =
    copy(child = newChild)
  override def prettyName: String = "mmr_rerank"
}

/** Signed-random-projection (SRP) LSH signature: bit b is the sign of
  * the vector's dot product with a deterministic pseudo-random ±1
  * hyperplane (component (b, d) derived by splitmix64 — no hyperplane
  * materialization, reproducible across runs and engines). Cosine-close
  * vectors agree on most bits (P[bit differs] = angle/π), and the
  * signature is SCALE-INVARIANT: v and c·v (c>0) produce identical
  * signatures. Charikar, STOC 2002. */
object SrpHash {
  // one splitmix64 kernel for the whole package — see NgramHash
  private def splitmix(i: Long): Long = NgramHash.splitmix(i)

  def signature(v: ArrayData, bits: Int, isFloat: Boolean): Long =
    signature(v, bits, isFloat, 0)

  /** `planeOffset` selects a disjoint hyperplane family (plane index =
    * offset + b): a signature used as a near-dup PREFILTER must not
    * share planes with one used for BUCKETING, or in-bucket pairs
    * auto-agree on the shared bits and the prefilter loses exactly
    * that much discriminating power. */
  def signature(v: ArrayData, bits: Int, isFloat: Boolean, planeOffset: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        acc += (if (splitmix((planeOffset + b).toLong * 131071L + d) < 0) -x else x)
        d += 1
      }
      if (acc >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class SrpSignature(child: Expression, bits: Int, planeOffset: Int = 0)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"srp_signature: bits must be in [1, 64], got $bits")
  require(planeOffset >= 0, s"srp_signature: planeOffset must be >= 0, got $planeOffset")
  private lazy val isFloat: Boolean = VectorOps.isFloatArray(child)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    SrpHash.signature(input.asInstanceOf[ArrayData], bits, isFloat, planeOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpHash.signature($c, $bits, $isFloat, $planeOffset)")
  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
  override def prettyName: String = "srp_signature"
}

/** One-pass int8 symmetric-quantization profile kernel — the PcaKernel
  * lesson applied to q29: the HOF spelling re-evaluated
  * `array_max(transform(v, abs))` (and the derived scale) inside EVERY
  * per-element lambda of THREE aggregate folds, O(3d²) array scans per
  * row. This kernel computes max|x| once, then one tight loop for
  * sum_q / sum_abs_q / err_pico — arithmetic bit-identical to the HOF:
  * Spark `round` on doubles is BigDecimal.valueOf HALF_UP, the long
  * cast truncates the already-integral double, and per-element rounding
  * happens BEFORE the integer sums (the oracle discipline). Output
  * struct: (scale_nano, sum_q, sum_abs_q, err_pico); an EMPTY vector
  * yields (null, 0, 0, 0) exactly like array_max's null propagating
  * through round while the aggregate inits stay 0. */
object Int8QuantKernel {
  import org.apache.spark.sql.catalyst.InternalRow

  private def sparkRound(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def profile(v: ArrayData, isFloat: Boolean): InternalRow = {
    val n = v.numElements()
    if (n == 0) return InternalRow(null, 0L, 0L, 0L)
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      // java.lang.Double.compare ordering = Spark's array_max on doubles
      if (java.lang.Double.compare(a, maxabs) > 0) maxabs = a
      i += 1
    }
    val scale = maxabs / 127.0
    var sumQ = 0L
    var sumAbsQ = 0L
    var errPico = 0L
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val q =
        if (maxabs == 0.0) 0L
        else {
          val r = sparkRound(x / scale).toLong
          math.max(-127L, math.min(127L, r))
        }
      sumQ += q
      sumAbsQ += math.abs(q)
      val d = q.toDouble * scale - x
      errPico += sparkRound(d * d * 1e12).toLong
      i += 1
    }
    InternalRow(sparkRound(scale * 1e9).toLong, sumQ, sumAbsQ, errPico)
  }
}

case class Int8QuantProfile(child: Expression) extends UnaryExpression {
  private lazy val isFloat: Boolean = VectorOps.isFloatArray(child)
  override def dataType: DataType = StructType(Seq(
    StructField("scale_nano", LongType, nullable = true),
    StructField("sum_q", LongType, nullable = false),
    StructField("sum_abs_q", LongType, nullable = false),
    StructField("err_pico", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Int8QuantKernel.profile(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Int8QuantKernel.profile($c, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): Int8QuantProfile =
    copy(child = newChild)
  override def prettyName: String = "int8_quant_profile"
}
