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

/** Fused n-gram hashing: shingle → 64-bit rolling hash → k-permutation
  * MinHash in ONE pass with ZERO per-shingle allocations. The array-based
  * [[TextShingles]] path materializes ~1000 UTF8Strings per document and
  * murmurs each one k times; at 100 TB scan rates that allocation + k-fold
  * hashing IS the dedup cost (round-2 profiling: 9 s of a 32 s bench in
  * one query). Here each window costs one rolling-hash update plus k
  * multiply-adds, and the exact-Jaccard verify compares sorted hash sets
  * (64-bit collisions are negligible against shingle-set sizes ~10³). */
object NgramHash {
  private val P = 0x100000001b3L // FNV-64 prime as polynomial multiplier

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[functions] def splitmix(i: Long): Long =
    mix(i * 0x9e3779b97f4a7c15L + 0x2545f4914f6cdd1dL)

  val MaxK = 64
  // k affine permutations (odd multiplier + offset), fixed + deterministic
  private val A: Array[Long] = Array.tabulate(MaxK)(i => splitmix(2L * i) | 1L)
  private val B: Array[Long] = Array.tabulate(MaxK)(i => splitmix(2L * i + 1))

  /** Rolling hashes of char n-gram windows over the lowercased,
    * whitespace-collapsed text (multiset; minhash needs no dedupe —
    * duplicate windows cannot change a minimum). */
  def charWindowHashes(s: UTF8String, n: Int): Array[Long] = {
    val raw = s.toString.toLowerCase(java.util.Locale.ROOT)
    // manual trim+collapse into a char array (no regex, no new String)
    val buf = new Array[Char](raw.length)
    var len = 0
    var pendingSpace = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isWhitespace(c)) { if (len > 0) pendingSpace = true }
      else {
        if (pendingSpace) { buf(len) = ' '; len += 1; pendingSpace = false }
        buf(len) = c; len += 1
      }
      i += 1
    }
    if (len <= n) {
      var h = 0L
      var j = 0
      while (j < len) { h = h * P + buf(j); j += 1 }
      return Array(mix(h))
    }
    val out = new Array[Long](len - n + 1)
    var pow = 1L
    i = 0
    while (i < n - 1) { pow *= P; i += 1 }
    var h = 0L
    i = 0
    while (i < n) { h = h * P + buf(i); i += 1 }
    out(0) = mix(h)
    i = 1
    while (i + n <= len) {
      h = (h - buf(i - 1) * pow) * P + buf(i + n - 1)
      out(i) = mix(h)
      i += 1
    }
    out
  }

  /** Rolling hashes of word n-gram windows: per-token polynomial hash,
    * then a polynomial over n consecutive token hashes. Token walk is a
    * single pass over the lowercased chars — no substring allocation. */
  def wordWindowHashes(s: UTF8String, n: Int): Array[Long] = {
    val text = s.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new scala.collection.mutable.ArrayBuffer[Long]
    var h = 0L
    var inTok = false
    var i = 0
    while (i <= text.length) {
      if (i == text.length || Character.isWhitespace(text.charAt(i))) {
        if (inTok) { toks += mix(h); h = 0L; inTok = false }
      } else { h = h * P + text.charAt(i); inTok = true }
      i += 1
    }
    val m = toks.length
    if (m <= n) {
      var g = 0L
      var j = 0
      while (j < m) { g = g * P + toks(j); j += 1 }
      return Array(mix(g))
    }
    val out = new Array[Long](m - n + 1)
    var pow = 1L
    i = 0
    while (i < n - 1) { pow *= P; i += 1 }
    var g = 0L
    i = 0
    while (i < n) { g = g * P + toks(i); i += 1 }
    out(0) = mix(g)
    i = 1
    while (i + n <= m) {
      g = (g - toks(i - 1) * pow) * P + toks(i + n - 1)
      out(i) = mix(g)
      i += 1
    }
    out
  }

  /** STRICT word n-gram hashes: one 64-bit rolling hash per n-token
    * window, EMPTY when the doc has fewer than n tokens — the key-exact
    * twin of [[graft.ops.Corpus.wordNgrams]] (whose window set the SQL
    * oracles mirror). [[wordWindowHashes]] instead collapses a short doc
    * to one whole-doc hash, which is right for the near-dup kernels but
    * wrong for exact set arithmetic. Kept as its own walk rather than a
    * flag on wordWindowHashes: the q15/q17/q74 pinned goldens ride that
    * kernel byte-for-byte (the pqCodebooks/refineCentroids
    * golden-coupling precedent). */
  def wordNgramHashesStrict(s: UTF8String, n: Int): GenericArrayData = {
    val text = s.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new scala.collection.mutable.ArrayBuffer[Long]
    var h = 0L
    var inTok = false
    var i = 0
    while (i <= text.length) {
      if (i == text.length || Character.isWhitespace(text.charAt(i))) {
        if (inTok) { toks += mix(h); h = 0L; inTok = false }
      } else { h = h * P + text.charAt(i); inTok = true }
      i += 1
    }
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var pow = 1L
    i = 0
    while (i < n - 1) { pow *= P; i += 1 }
    var g = 0L
    i = 0
    while (i < n) { g = g * P + toks(i); i += 1 }
    out(0) = mix(g)
    i = 1
    while (i + n <= m) {
      g = (g - toks(i - 1) * pow) * P + toks(i + n - 1)
      out(i) = mix(g)
      i += 1
    }
    new GenericArrayData(out)
  }

  def sigFromWindows(ws: Array[Long], k: Int): GenericArrayData = {
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var j = 0
    while (j < ws.length) {
      val w = ws(j)
      var i = 0
      while (i < k) {
        val v = A(i) * w + B(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  def charMinHash(s: UTF8String, n: Int, k: Int): GenericArrayData =
    sigFromWindows(charWindowHashes(s, n), k)

  def wordMinHash(s: UTF8String, n: Int, k: Int): GenericArrayData =
    sigFromWindows(wordWindowHashes(s, n), k)

  /** Exact set-Jaccard over two window-hash multisets (sort + dedupe +
    * merge; runs only on LSH-surviving candidate pairs). */
  def hashedJaccard(a0: Array[Long], b0: Array[Long]): Double = {
    java.util.Arrays.sort(a0)
    java.util.Arrays.sort(b0)
    var ia = 0; var ib = 0
    var inter = 0L; var union = 0L
    while (ia < a0.length && ib < b0.length) {
      val x = a0(ia); val y = b0(ib)
      union += 1
      if (x == y) {
        inter += 1
        while (ia < a0.length && a0(ia) == x) ia += 1
        while (ib < b0.length && b0(ib) == y) ib += 1
      } else if (x < y) { while (ia < a0.length && a0(ia) == x) ia += 1 }
      else { while (ib < b0.length && b0(ib) == y) ib += 1 }
    }
    while (ia < a0.length) { val x = a0(ia); union += 1; while (ia < a0.length && a0(ia) == x) ia += 1 }
    while (ib < b0.length) { val y = b0(ib); union += 1; while (ib < b0.length && b0(ib) == y) ib += 1 }
    if (union == 0) 1.0 else inter.toDouble / union
  }

  def charJaccard(a: UTF8String, b: UTF8String, n: Int): Double =
    hashedJaccard(charWindowHashes(a, n), charWindowHashes(b, n))

  def wordJaccard(a: UTF8String, b: UTF8String, n: Int): Double =
    hashedJaccard(wordWindowHashes(a, n), wordWindowHashes(b, n))

  /** DISTINCT window-hash count — |A| in the sets [[hashedJaccard]]
    * compares (the verify dedups both sides, so this is the exact
    * cardinality the Jaccard length filter needs, NOT the multiset
    * window count, which over-counts duplicated windows and would make
    * the filter lossy). Sort + unique over the same rolling-hash walk
    * the signature pass runs — one extra linear pass per document. */
  private def distinctCount(ws0: Array[Long]): Long = {
    if (ws0.isEmpty) return 0L
    val ws = ws0 // charWindowHashes/wordWindowHashes return fresh arrays
    java.util.Arrays.sort(ws)
    var c = 1L
    var i = 1
    while (i < ws.length) { if (ws(i) != ws(i - 1)) c += 1; i += 1 }
    c
  }

  def charDistinctWindows(s: UTF8String, n: Int): Long =
    distinctCount(charWindowHashes(s, n))

  def wordDistinctWindows(s: UTF8String, n: Int): Long =
    distinctCount(wordWindowHashes(s, n))
}

case class NgramMinHash(child: Expression, n: Int, k: Int, word: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"ngram_minhash: n must be >= 1, got $n")
  require(k >= 1 && k <= NgramHash.MaxK,
    s"ngram_minhash: k must be in [1, ${NgramHash.MaxK}], got $k " +
      "(raise NgramHash.MaxK to widen the permutation table)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    if (word) NgramHash.wordMinHash(input.asInstanceOf[UTF8String], n, k)
    else NgramHash.charMinHash(input.asInstanceOf[UTF8String], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (word) "wordMinHash" else "charMinHash"
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHash.$fn($c, $n, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): NgramMinHash =
    copy(child = newChild)
  override def prettyName: String = "ngram_minhash"
}

/** Distinct n-gram window count of a text — the exact set cardinality
  * the Jaccard LENGTH FILTER prunes candidate pairs with (j >= tau ⟹
  * tau·max(|A|,|B|) <= min(|A|,|B|), so a failing pair is provably
  * below threshold and dropping it cannot change any verified pair
  * set). Rides the LSH bucket payload so the prune runs INSIDE the
  * candidate explode stage, before the dedup exchange. */
case class NgramDistinctCount(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"ngram_distinct_count: n must be >= 1, got $n")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    if (word) NgramHash.wordDistinctWindows(input.asInstanceOf[UTF8String], n)
    else NgramHash.charDistinctWindows(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (word) "wordDistinctWindows" else "charDistinctWindows"
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHash.$fn($c, $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): NgramDistinctCount =
    copy(child = newChild)
  override def prettyName: String = "ngram_distinct_count"
}

case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngram_hashes: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    NgramHash.wordNgramHashesStrict(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramHash.wordNgramHashesStrict($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
  override def prettyName: String = "word_ngram_hashes"
}

case class NgramJaccard(left: Expression, right: Expression, n: Int, word: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (word) NgramHash.wordJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
    else NgramHash.charJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (word) "wordJaccard" else "charJaccard"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NgramHash.$fn($a, $b, $n)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NgramJaccard =
    copy(left = l, right = r)
  override def prettyName: String = "ngram_jaccard"
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
