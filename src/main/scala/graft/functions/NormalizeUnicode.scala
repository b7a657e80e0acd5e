package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus text: web crawl HTML carries the
  * same visible string in composed (NFC) and decomposed (NFD) forms —
  * "é" as U+00E9 or as e + U+0301 — which breaks exact dedup, line
  * hashing, and any gram computation unless every doc is canonicalized
  * first. NFKC additionally folds compatibility characters (ligatures,
  * full-width forms, superscripts) into their plain equivalents — the
  * aggressive form most training-corpus pipelines run.
  *
  * Codegen-friendly unary expression with the same ASCII fast path as
  * [[Unaccent]] (ASCII is already normalized in every form). The form
  * is bound at planning time — one branch-free kernel per call site. */
object NormalizeUnicode {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def nfc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFC)
  def nfkc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFKC)
}

case class NormalizeUnicode(child: Expression, form: String) extends UnaryExpression {
  require(form == "NFC" || form == "NFKC", s"unsupported form: $form")
  private val jform = Normalizer.Form.valueOf(form)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    NormalizeUnicode.normalize(input.asInstanceOf[UTF8String], jform)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (form == "NFC") "nfc" else "nfkc"
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeUnicode.$fn($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
  override def prettyName: String = s"normalize_$form".toLowerCase
}
