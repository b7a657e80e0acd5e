package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-level Shannon entropy in nano-nats — the cheap gibberish /
  * compression-proxy quality signal (near-zero entropy = repeated-char
  * padding, abnormally high = base64/binary junk) next to q81's actual
  * deflate ratio.
  *
  * Oracle-exact discipline: one term floor(p·ln(p)·10⁹ + 0.5) per
  * DISTINCT code point (p = cnt/n in IEEE doubles built from exact
  * integers, multiplications in the same left-assoc order the SQL twin
  * writes), summed as longs — commutative, so partitioning and char
  * order can't change the result. Code-POINT semantics: equals the SQL
  * `string_split(text, '')` twin on BMP text (all the corpus's — it is
  * ASCII); astral graphemes would count as their surrogate halves here
  * and as one char there.
  */
object CharEntropy {
  def nanos(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    val counts = new java.util.HashMap[Integer, Array[Int]](64)
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      val p = c / n.toDouble
      acc += math.floor(p * math.log(p) * 1e9 + 0.5).toLong
    }
    -acc
  }
}

case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.nanos(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.nanos($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
  override def prettyName: String = "char_entropy_nanos"
}
