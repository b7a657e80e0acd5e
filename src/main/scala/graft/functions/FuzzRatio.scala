package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Indel similarity ratio 0–100, the scorer family of thefuzz/`fuzz.ratio`
  * used by the reference's entity-resolution join
  * (reference: scripts/bills/vote_matching.py:156-168, requirements.txt:29,38).
  *
  * ratio = round(100 * 2*LCS(a,b) / (|a|+|b|)) — equivalently Levenshtein
  * with substitution cost 2. Implemented as a codegen-friendly binary
  * expression; the DP is O(|a|*|b|) with two rolling rows.
  */
object FuzzRatio {
  def ratio(a: UTF8String, b: UTF8String): Int =
    ratioStr(a.toString, b.toString)

  private def ratioStr(s: String, t: String): Int = {
    val la = s.length
    val lb = t.length
    if (la == 0 && lb == 0) return 100
    if (la == 0 || lb == 0) return 0
    val m = lcsLength(s, t)
    math.round(200.0 * m / (la + lb)).toInt
  }

  /** `fuzz.partial_ratio`: best indel ratio of the shorter string against
    * every len(shorter)-length window of the longer (the optimal-alignment
    * semantics of thefuzz's rapidfuzz backend; an exhaustive window sweep
    * rather than fuzzywuzzy's difflib block anchors). Early-exits on a
    * perfect window. O(|t|·|s|²) — fine for name-length strings; ratio is
    * monotone under max, so per-window rounding equals round-of-max. */
  def partialScore(a: UTF8String, b: UTF8String): Int = {
    val s0 = a.toString
    val t0 = b.toString
    val (s, t) = if (s0.length <= t0.length) (s0, t0) else (t0, s0)
    if (s.isEmpty) return if (t.isEmpty) 100 else 0
    var best = 0
    var i = 0
    val last = t.length - s.length
    while (i <= last && best < 100) {
      val r = ratioStr(s, t.substring(i, i + s.length))
      if (r > best) best = r
      i += 1
    }
    best
  }

  private def lcsLength(s: String, t: String): Int = {
    val n = t.length
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i < s.length) {
      val ci = s.charAt(i)
      var j = 0
      while (j < n) {
        cur(j + 1) =
          if (ci == t.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(n)
  }
}

case class FuzzRatio(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzRatio.ratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FuzzRatio.ratio($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FuzzRatio =
    copy(left = l, right = r)
  override def prettyName: String = "fuzz_ratio"
}

case class PartialRatio(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzRatio.partialScore(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FuzzRatio.partialScore($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PartialRatio =
    copy(left = l, right = r)
  override def prettyName: String = "fuzz_partial_ratio"
}
