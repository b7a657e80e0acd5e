package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass Jaccard similarity of two set-valued array columns.
  *
  * `size(array_intersect)/size(array_union)` builds two hash sets and two
  * result arrays per row (~ms on 10²–10³-element shingle sets); this
  * builds one set and counts hits (~µs). Inputs are assumed
  * element-distinct (true for all shingle producers in this package —
  * [[WordShingles]]/[[CharShingles]] emit de-duplicated arrays).
  *
  * CodegenFallback: the surrounding stage stays codegen'd and calls
  * `eval` directly; the loop itself is plain JVM code, so the fallback
  * costs one virtual call per row, not interpretation of the loop. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 && ny == 0) return 0.0
    val set = new java.util.HashSet[Any](nx * 2)
    var i = 0
    while (i < nx) { set.add(x.get(i, elemType)); i += 1 }
    var inter = 0
    var j = 0
    while (j < ny) { if (set.contains(y.get(j, elemType))) inter += 1; j += 1 }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sim"
}

/** Static kernel for [[SortedLongIntersectCount]] — kept as plain JVM
  * code so whole-stage codegen calls it with primitive array access. */
object SortedLongOps {
  /** Intersection cardinality of two ASCENDING long arrays (element-
    * distinct inputs — every producer in this package dedups). A plain
    * two-pointer merge: no per-row hash set, no boxing, no result
    * array — the hot loop is long compares over unsafe array data. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** |A ∩ B| of two SORTED-ascending array<long> columns (round 14).
  *
  * The set-similarity verify stage runs `size(array_intersect)` once
  * per CANDIDATE — and the prefix filter at tau = 0.6 over char-gram
  * sets passes tens of millions of candidates (22.8M at sf0.1 for
  * q225), so the per-pair constant IS the query. `array_intersect`
  * builds a per-row hash set with boxed generic element access and
  * materializes the intersection array nobody reads; this merge-counts
  * two pre-sorted primitive arrays instead. Sorting happens ONCE per
  * document (`sort_array` on the collected token array), not per pair.
  * Callers MUST sort both inputs — unsorted input silently
  * undercounts, which is why the expression is package-internal and
  * only reachable through [[graft.ops.SetSimilarity]]'s docArrs path. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongOps.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedLongOps.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_long_intersect_count"
}
