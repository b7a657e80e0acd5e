package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi word segmentation under a unigram piece model (Kudo 2018 —
  * the SentencePiece unigram family): best[i] = max over admissible
  * last pieces word[j..i) of best[j] + logprob(piece). Log
  * probabilities are INTEGER MICRO-NATS (longs), so the DP is exact
  * arithmetic with a deterministic tie-break (equal score → the LONGER
  * last piece, i.e. the smaller j, wins) — the segmentation is a pure
  * function of (word, vocab), independent of hash-map iteration order.
  * Single-character pieces must be in the vocab (the trainer
  * guarantees it), so every word segments. */
object UnigramKernel {

  /** vocab: piece → micro-nat log probability (≤ 0). */
  def segment(word: String, vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val NegInf = java.lang.Long.MIN_VALUE / 4
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = NegInf
      back(i) = -1
      var j = math.max(0, i - maxPieceLen)
      // ascending j: on ties the FIRST (smallest j = longest piece)
      // candidate is kept because later equal scores do not replace it
      while (j < i) {
        val lp = vocab.get(word.substring(j, i))
        if (lp != null && best(j) > NegInf) {
          val cand = best(j) + lp.longValue()
          if (cand > best(i)) {
            best(i) = cand
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    if (back(n) < 0) return Array(word) // unreachable (char missing) — opaque
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val j = back(p)
      out += word.substring(j, p)
      p = j
    }
    out.reverse.toArray
  }

  /** Segment every whitespace word of a lowercased text; returns the
    * flat piece sequence (word boundaries never crossed). */
  def encode(text: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): GenericArrayData = {
    val words = text.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val ps = segment(words(i), vocab, maxPieceLen)
        var k = 0
        while (k < ps.length) { out += UTF8String.fromString(ps(k)); k += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class UnigramEncode(child: Expression,
    vocab: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int)
    extends UnaryExpression {
  require(maxPieceLen >= 1, s"unigram_encode: maxPieceLen must be >= 1, got $maxPieceLen")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.encode(input.asInstanceOf[UTF8String], vocab, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab,
      "java.util.HashMap<String, Long>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramKernel.encode($c, $vocabRef, $maxPieceLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
  override def prettyName: String = "unigram_encode"
}
