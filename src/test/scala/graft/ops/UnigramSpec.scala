package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel: exact Viterbi with longest-piece tie-break; unreachable is opaque") {
    import graft.functions.UnigramKernel.segment
    val v = new java.util.HashMap[String, java.lang.Long]()
    v.put("a", -2000000L); v.put("b", -2000000L)
    v.put("ab", -3000000L) // better than a+b (-4e6)
    assert(segment("abab", v, 4).toSeq == Seq("ab", "ab"))
    // tie: "ab"+"ab" (-6e6) vs "abab" if priced equal — longer piece wins
    v.put("abab", -6000000L)
    assert(segment("abab", v, 4).toSeq == Seq("abab"))
    // word with a char missing from the vocab comes back opaque
    assert(segment("xyz", v, 4).toSeq == Seq("xyz"))
  }

  test("learnVocab: frequent multi-char pieces survive, chars guarantee coverage") {
    val docs = (1L to 30L).map(i => (i, "ababab ababab cdcd"))
      .toDF("doc_id", "text")
    val vocab = Unigram.learnVocab(docs, "text",
      seedSize = 100, targetSize = 20, emRounds = 2, maxPieceLen = 6)
    val pieces = vocab.map(_._1).toSet
    assert(Set("a", "b", "c", "d").subsetOf(pieces), s"chars missing: $pieces")
    assert(pieces.exists(_.length > 1), s"no multi-char piece survived: $pieces")
    // the trained tokenizer segments the corpus words into few pieces
    val enc = docs.select(explode(
      Unigram.encode(col("text"), vocab, 6)).as("p"))
      .groupBy("p").count().collect().map(r => r.getString(0)).toSet
    assert(enc.exists(_.length > 1), s"encode never used a multi piece: $enc")
    // lossless: concatenating each word's pieces reconstructs the word
    val words = Seq("ababab", "cdcd", "abcd", "dcba") // incl. unseen orders
    words.foreach { w =>
      val ps = graft.functions.UnigramKernel.segment(w,
        { val m = new java.util.HashMap[String, java.lang.Long]()
          vocab.foreach { case (p, lp) => m.put(p, lp) }; m }, 6)
      assert(ps.mkString == w, s"$w segmented lossily: ${ps.toSeq}")
    }
  }

  test("learnVocab is partitioning-independent") {
    val docs = (1L to 40L).map(i => (i, s"the quick brown fox item$i jumps"))
      .toDF("doc_id", "text")
    val v1 = Unigram.learnVocab(docs.repartition(1), "text", 200, 50, 2, 5)
    val v32 = Unigram.learnVocab(docs.repartition(32), "text", 200, 50, 2, 5)
    assert(v1 == v32, "vocab moved with partitioning")
  }

  test("learnVocab rejects out-of-regime parameters") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Unigram.learnVocab(docs, "text", 10, 20, 2, 5)) // seed < target
    intercept[IllegalArgumentException](
      Unigram.learnVocab(docs, "text", 20, 10, 0, 5)) // no EM rounds
    intercept[IllegalArgumentException](
      Unigram.learnVocab(docs, "text", 20, 10, 2, 32)) // piece too long
  }
}
