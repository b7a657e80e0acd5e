package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BPE encode kernel — the [[UnigramKernel]]/PcaKernel lesson
  * applied to merge application. The HOF spelling (32 sequential
  * `aggregate` folds per word, each rebuilding the accumulator array
  * with `concat(slice(...))`) allocates O(len²) per merge per word and
  * was the whole cost of the tokenizer-fertility queries once the bench
  * harness stopped letting count() prune it (q112/q141: ~39 s each at
  * sf0.1). This kernel does the identical computation in tight loops:
  * per whitespace word of the lowercased text, char-split + the
  * end-of-word sentinel, then each merge rule applied as ONE
  * left-to-right scan with the exact greedy fold semantics of the HOF
  * (after a merge the new symbol becomes the accumulator tail and is
  * immediately eligible as the LEFT of the same rule). BpeSpec pins
  * kernel ≡ HOF on planted and corpus texts. */
object BpeKernel {

  /** merges: flattened (left, right) pairs in application order. */
  def encode(text: UTF8String, merges: Array[String],
      eow: String): GenericArrayData = {
    // Locale.ROOT deliberately (the UnigramKernel choice): Spark's
    // lower() slow path uses the default JVM locale, so on a tr_TR host
    // the two could disagree on dotted/dotless I — ROOT keeps the
    // kernel deterministic across hosts, which matters more here than
    // matching an environment-dependent mapping
    val words = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        // CODE-POINT split + sentinel: regex split on the empty pattern
        // (the HOF's split(w, "")) advances per code point, keeping
        // surrogate pairs whole — a charAt loop would shear an emoji
        // into two lone surrogates and silently change the token stream
        val nCp = word.codePointCount(0, word.length)
        var syms = new Array[String](nCp + 1)
        var c = 0
        var ci = 0
        while (c < word.length) {
          val cp = word.codePointAt(c)
          syms(ci) = new String(Character.toChars(cp))
          c += Character.charCount(cp)
          ci += 1
        }
        syms(nCp) = eow
        var m = 0
        while (m < merges.length) {
          val l = merges(m)
          val r = merges(m + 1)
          val next = new Array[String](syms.length)
          var n = 0
          var i = 0
          while (i < syms.length) {
            val x = syms(i)
            if (n > 0 && next(n - 1) == l && x == r) {
              next(n - 1) = l + r
            } else {
              next(n) = x
              n += 1
            }
            i += 1
          }
          syms = java.util.Arrays.copyOf(next, n)
          m += 2
        }
        var k = 0
        while (k < syms.length) {
          out += UTF8String.fromString(syms(k))
          k += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class BpeEncode(child: Expression, merges: Array[String], eow: String)
    extends UnaryExpression {
  require(merges.length % 2 == 0,
    s"bpe_encode: merges must be (left, right) pairs, got ${merges.length} entries")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[UTF8String], merges, eow)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mergesRef = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[]")
    val eowLit = ctx.addReferenceObj("bpeEow", eow, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.encode($c, $mergesRef, $eowLit)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
  override def prettyName: String = "bpe_encode"
}
