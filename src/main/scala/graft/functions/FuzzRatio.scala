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
  // math.rint = HALF_EVEN, matching thefuzz's int(round(x)) under
  // CPython banker's rounding — math.round (HALF_UP) diverges by 1 on
  // exact .5 ratios like 200*1/16
  def ratio(a: UTF8String, b: UTF8String): Int =
    math.rint(ratioStr(a.toString, b.toString)).toInt

  /** Unrounded indel similarity in [0,100] — WRatio composes float
    * sub-scores and rounds only once at the end (rapidfuzz semantics). */
  private[functions] def ratioStr(s: String, t: String): Double = {
    val la = s.length
    val lb = t.length
    if (la == 0 && lb == 0) return 100.0
    if (la == 0 || lb == 0) return 0.0
    200.0 * lcsLength(s, t) / (la + lb)
  }

  /** `fuzz.partial_ratio`: best indel ratio of the shorter string against
    * every len(shorter)-length window of the longer (the optimal-alignment
    * semantics of thefuzz's rapidfuzz backend; an exhaustive window sweep
    * rather than fuzzywuzzy's difflib block anchors). Early-exits on a
    * perfect window. O(|t|·|s|²) — fine for name-length strings; ratio is
    * monotone under max, so per-window rounding equals round-of-max. */
  def partialScore(a: UTF8String, b: UTF8String): Int =
    math.rint(partialStr(a.toString, b.toString)).toInt

  private[functions] def partialStr(s0: String, t0: String): Double = {
    val (s, t) = if (s0.length <= t0.length) (s0, t0) else (t0, s0)
    if (s.isEmpty) return if (t.isEmpty) 100.0 else 0.0
    var best = 0.0
    var i = 0
    val last = t.length - s.length
    while (i <= last && best < 100.0) {
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

/** `fuzz.WRatio`, the `process.extractOne` default scorer the reference
  * matches voters with (reference: scripts/bills/vote_matching.py:161).
  *
  * Faithful to thefuzz 0.22 / rapidfuzz: full_process both sides; when
  * lengths are within 1.5× return max(ratio, 0.95·max(token_sort,
  * token_set)); otherwise fold in partial_ratio scaled by 0.9 (0.6
  * beyond an 8× length gap) and — crucially — the PARTIAL token
  * variants (partial_token_sort / partial_token_set), not the full
  * token ratios, scaled by 0.95·pscale. Reordered length-mismatched
  * names ("masto cortez" vs "catherine cortez masto") score 86 here
  * (partial_token_sort = 100 · 0.95 · 0.9), where full token_sort
  * under-scores them to ~61 and silently breaks voter matching at the
  * 80 threshold. Sub-scores stay floats; the single final round is
  * HALF_EVEN, matching CPython round().
  *
  * One fused kernel (no 10-deep regexp/array Column tree): processed
  * strings and token splits are computed once per row, and every
  * sub-scorer early-exits at 100, so the common exact-token-overlap
  * case never runs a DP. Cross-checked golden-for-golden against the
  * independent float-faithful reimplementation in tools/wratio_ref.py.
  */
object WRatio {

  /** thefuzz `utils.full_process(force_ascii=True)`: drop non-ASCII
    * (no space left behind), non-alphanumeric → space, lowercase, trim. */
  private[functions] def fullProcess(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 128) {
        val lc = Character.toLowerCase(c)
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          sb.append(lc)
          pendingSpace = false
        } else pendingSpace = true
      }
      i += 1
    }
    sb.toString
  }

  private def tokenSortJoin(s: String): String =
    s.split(' ').sorted.mkString(" ")

  /** token_set_ratio over processed inputs: ratios among {sorted token
    * intersection, intersection + each side's sorted leftovers}. */
  private def tokenSetRatio(a: String, b: String): Double = {
    val ta = a.split(' ').toSet
    val tb = b.split(' ').toSet
    val inter = ta.intersect(tb).toSeq.sorted.mkString(" ")
    val c1 = (inter + " " + ta.diff(tb).toSeq.sorted.mkString(" ")).trim
    val c2 = (inter + " " + tb.diff(ta).toSeq.sorted.mkString(" ")).trim
    math.max(FuzzRatio.ratioStr(inter, c1),
      math.max(FuzzRatio.ratioStr(inter, c2), FuzzRatio.ratioStr(c1, c2)))
  }

  /** partial_token_set_ratio: any shared token → 100, else partial_ratio
    * of the sorted symmetric-difference joins. */
  private def partialTokenSetRatio(a: String, b: String): Double = {
    val ta = a.split(' ').toSet
    val tb = b.split(' ').toSet
    if (ta.exists(tb.contains)) 100.0
    else FuzzRatio.partialStr(
      ta.diff(tb).toSeq.sorted.mkString(" "),
      tb.diff(ta).toSeq.sorted.mkString(" "))
  }

  def score(a: UTF8String, b: UTF8String): Int = {
    val s1 = fullProcess(a.toString)
    val s2 = fullProcess(b.toString)
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0
    val lenRatio = math.max(l1, l2).toDouble / math.min(l1, l2)
    val base = FuzzRatio.ratioStr(s1, s2)
    val result =
      if (lenRatio < 1.5) {
        val tok = math.max(
          FuzzRatio.ratioStr(tokenSortJoin(s1), tokenSortJoin(s2)),
          tokenSetRatio(s1, s2))
        math.max(base, tok * 0.95)
      } else {
        val pScale = if (lenRatio < 8.0) 0.9 else 0.6
        val part = FuzzRatio.partialStr(s1, s2) * pScale
        val pTok = math.max(
          FuzzRatio.partialStr(tokenSortJoin(s1), tokenSortJoin(s2)),
          partialTokenSetRatio(s1, s2)) * 0.95 * pScale
        math.max(base, math.max(part, pTok))
      }
    math.rint(result).toInt
  }
}

case class WRatioScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    WRatio.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.WRatio.score($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WRatioScore =
    copy(left = l, right = r)
  override def prettyName: String = "wratio"
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
