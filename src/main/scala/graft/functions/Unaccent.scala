package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Strip diacritics: Unicode NFD decomposition, then drop combining marks
  * (category Mn) — the semantics of the reference's `remove_accents`
  * (reference: scripts/bills/vote_matching.py:88-92).
  *
  * Codegen-friendly unary expression; the fast path returns the input
  * untouched when it is pure ASCII (the overwhelmingly common case).
  */
object Unaccent {
  def unaccent(s: UTF8String): UTF8String = {
    // ASCII fast path: numBytes == numChars implies no combining marks.
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class Unaccent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Unaccent.unaccent(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Unaccent.unaccent($c)")
  override protected def withNewChildInternal(newChild: Expression): Unaccent =
    copy(child = newChild)
  override def prettyName: String = "unaccent"
}
