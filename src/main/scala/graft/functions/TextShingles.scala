package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** One-pass shingling + MinHash expressions.
  *
  * The HOF formulation (`transform(sequence(0,k-1), i -> array_min(
  * transform(shingles, s -> xxhash64(s, i))))`) evaluates interpreted and
  * re-walks the shingle array k times with per-element boxing — measured
  * ~14 ms/row on 80-token docs. These expressions do the same work in one
  * tight loop inside whole-stage codegen (~10³× less overhead), which is
  * what makes MinHash dedup viable at 100 TB scan rates.
  */
object TextShingles {

  /** Distinct word n-gram shingles of the lowercased text. */
  def wordShingles(s: UTF8String, n: Int): GenericArrayData = {
    val text = s.toString.toLowerCase
    val toks = tokenize(text)
    val out = new mutable.LinkedHashSet[UTF8String]
    if (toks.length <= n) {
      out += UTF8String.fromString(toks.mkString(" "))
    } else {
      var i = 0
      while (i + n <= toks.length) {
        out += UTF8String.fromString(toks.slice(i, i + n).mkString(" "))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Distinct character n-gram shingles of the whitespace-normalized,
    * lowercased text. */
  def charShingles(s: UTF8String, n: Int): GenericArrayData = {
    val norm = s.toString.toLowerCase.trim.replaceAll("\\s+", " ")
    val out = new mutable.LinkedHashSet[UTF8String]
    if (norm.length <= n) {
      out += UTF8String.fromString(norm)
    } else {
      var i = 0
      while (i + n <= norm.length) {
        out += UTF8String.fromString(norm.substring(i, i + n))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def tokenize(text: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var start = -1
    var i = 0
    while (i <= text.length) {
      if (i == text.length || Character.isWhitespace(text.charAt(i))) {
        if (start >= 0) { out += text.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  /** k-permutation MinHash signature over a shingle array: seed i’s hash
    * of shingle s is murmur3(s, seed=i) widened and mixed to 64 bits —
    * deterministic across runs and engines. One pass: k running minima. */
  def minHashSig(shingles: ArrayData, k: Int): GenericArrayData = {
    val sig = Array.fill[Long](k)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      if (s != null) {
        var i = 0
        while (i < k) {
          val h32 = Murmur3_x86_32.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes(), i)
          // Stafford mix to spread the 32-bit murmur into 64 bits
          var h = (h32.toLong << 32) ^ (s.numBytes().toLong * 0x9e3779b97f4a7c15L) ^ i
          h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
          h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
          h ^= (h >>> 31)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextShingles.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextShingles.charShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.charShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
  override def prettyName: String = "char_shingles"
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextShingles.minHashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.minHashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}
