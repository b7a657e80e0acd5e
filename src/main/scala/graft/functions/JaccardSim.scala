package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
