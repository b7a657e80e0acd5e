package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The ONE whitespace tokenizer shared by the heavy-hitter aggregates
  * (Misra-Gries [[HeavyHittersAgg]] and count-min [[CmsHeavyHitters]]).
  * Its agreement with q51's exact `split(lower(text), '\\s+')` twin is
  * load-bearing: both sketches' counts must bound the exact counts of
  * the SAME token stream, or the error-bound contract is meaningless —
  * which is why the tokenizer lives in exactly one place.
  *
  *  - Locale.ROOT lowercase: Spark's `lower()` is locale-independent;
  *    default-locale toLowerCase would diverge under e.g. tr_TR
  *    ('I' → dotless 'ı').
  *  - Boundary = Java regex \s — [ \t\n\x0B\f\r] — NOT
  *    Character.isWhitespace: Unicode separators like U+2028 are
  *    isWhitespace-true but \s-false, and the exact twin splits on \s+.
  *  - Tokens are materialized as fresh UTF8Strings, safe to retain in
  *    an aggregation buffer (the input may point into a reused row). */
object Tokenize {
  def foreachToken(raw: UTF8String)(f: UTF8String => Unit): Unit = {
    val text = raw.toString.toLowerCase(java.util.Locale.ROOT)
    var start = -1
    var i = 0
    def isBoundary(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i <= text.length) {
      if (i == text.length || isBoundary(text.charAt(i))) {
        if (start >= 0) {
          f(UTF8String.fromString(text.substring(start, i)))
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
  }
}
