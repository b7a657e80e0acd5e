package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index (the xy2d walk): maps a (x, y) cell in a
  * 2^order × 2^order grid to its position along the Hilbert
  * space-filling curve. Same job as the Morton z-value
  * ([[graft.ops.Layout.zValue]]) — a 1-D clustering key giving both
  * dimensions locality for min/max file skipping — but with strictly
  * better locality: consecutive curve positions are always GRID
  * NEIGHBORS (unit steps, no Z-shape jumps), so range-partitioned files
  * cover tighter bounding boxes at the same file count. The price is
  * that the index is an iterative quadrant walk (rotate/reflect per
  * level) rather than pure mask arithmetic — hence a codegen kernel
  * rather than a Column expression chain, and goldens rather than a SQL
  * oracle. */
object HilbertKernel {
  /** `order` levels (grid side 2^order); x, y are masked into range. */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val side = 1L << order
    var x = x0 & (side - 1)
    var y = y0 & (side - 1)
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation is preserved
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31,
    s"hilbert_index: order must be in [1, 31], got $order")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.xy2d(order, a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKernel.xy2d($order, $a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
  override def prettyName: String = "hilbert_index"
}
