package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference BPE (classic get_stats/merge_vocab over a
    * word-frequency dict), used differentially against the distributed
    * implementation. */
  private def refBpe(wordFreq: Map[String, Long], nMerges: Int,
      minFreq: Long): Seq[(Int, String, String, Long, Long)] = {
    var vocab: Vector[(Vector[String], Long)] = wordFreq.toVector.map {
      case (w, f) => (w.map(_.toString).toVector :+ Bpe.Eow, f)
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val stats = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => stats((a, b)) += f
          case _ =>
        }
      }
      if (stats.isEmpty || stats.values.max < minFreq) done = true
      else {
        val ((l, r), f) = stats.minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.map { case (syms, wf) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
          (merged, wf)
        }
        step += 1
        out += ((step, l, r, f, vocab.flatMap(_._1).distinct.size.toLong))
      }
    }
    out.toSeq
  }

  private def corpusDf(wordFreq: Map[String, Long]) =
    wordFreq.toSeq.zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, (Seq.fill(f.toInt)(w)).mkString(" "))
    }.toDF("doc_id", "text")

  // the Sennrich et al. worked example's word-frequency dict
  private val classic = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
    "widest" -> 3L)

  private def gotMerges(wordFreq: Map[String, Long], n: Int, minFreq: Long) =
    Bpe.learnMerges(corpusDf(wordFreq), "text", n, minFreq)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_freq"),
        r.getAs[Long]("vocab_size_after")))

  test("learnMerges matches the reference BPE on the classic corpus") {
    val want = refBpe(classic, 8, minFreq = 2)
    assert(want.size == 8, s"fixture should sustain 8 merges: $want")
    assert(gotMerges(classic, 8, 2).toSeq == want, "distributed != reference")
  }

  test("learnMerges first merge on the classic corpus is (e,s) with freq 9") {
    val first = gotMerges(classic, 1, 2).head
    assert((first._2, first._3, first._4) == (("e", "s", 9L)), first.toString)
  }

  test("learnMerges matches the reference on a messier corpus (ties, 1-char words)") {
    val freqs = Map("a" -> 7L, "ab" -> 4L, "abab" -> 3L, "banana" -> 5L,
      "bandana" -> 2L, "nab" -> 6L, "x" -> 1L)
    assert(gotMerges(freqs, 10, 2).toSeq == refBpe(freqs, 10, 2))
  }

  test("learnMerges stops early when no pair reaches minFreq") {
    val got = gotMerges(Map("ab" -> 1L, "cd" -> 1L), 5, minFreq = 2)
    assert(got.isEmpty, got.toSeq.toString)
  }

  test("encodeBpe kernel is bit-identical to the HOF fold spelling") {
    // overlapping rules, chained merges (a+a then aa+a-less chains via
    // successive rules), mixed case, extra whitespace, unicode
    // the emoji is a supplementary-plane code point: regex split on the
    // empty pattern keeps the surrogate pair whole, and the kernel must
    // match (a charAt loop would shear it into two lone surrogates)
    val texts = Seq("aaa aaaa", "the theater theme", "  ab AB aB  ",
      "über naïve café", "x", "", "ab ab ba", "aaaa", "a😀b 😀😀")
    val merges = Seq(("a", "a"), ("t", "h"), ("th", "e"), ("aa", "a"),
      ("b", Bpe.Eow), ("the", "a"))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val kernel = df.select(col("id"), Bpe.encodeBpe(col("text"), merges).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = df.select(col("id"), Bpe.encodeBpeHof(col("text"), merges).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(kernel == hof,
      texts.indices.map(i => s"$i: ${kernel(i.toLong)} vs ${hof(i.toLong)}")
        .mkString("\n"))
  }

  test("encodeBpe applies merges greedily left-to-right, non-overlapping") {
    val merges = Seq(("a", "a"))
    val got = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
      .select(Bpe.encodeBpe(col("text"), merges).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("aa", "a", Bpe.Eow, "aa", "aa", Bpe.Eow), got.toString)
  }

  test("encodeBpe with learned merges is lossless and shrinks token counts") {
    val docs = corpusDf(classic)
    val merges = gotMerges(classic, 8, 2).map(m => (m._2, m._3)).toSeq
    val row = docs.select(
      col("text"),
      Bpe.bpeTokenCount(col("text"), Seq.empty).as("n0"),
      Bpe.bpeTokenCount(col("text"), merges).as("n1"),
      array_join(Bpe.encodeBpe(col("text"), merges), "").as("glued"))
      .collect()
    row.foreach { r =>
      val original = r.getAs[String]("text").trim.toLowerCase
        .split("\\s+").mkString(Bpe.Eow) + Bpe.Eow
      assert(r.getAs[String]("glued") == original, "merge lost characters")
      assert(r.getAs[Int]("n1") < r.getAs[Int]("n0"),
        s"merges should shrink the token count: $r")
    }
  }

  test("learnMerges refuses a non-positive merge budget") {
    val e = intercept[IllegalArgumentException](
      Bpe.learnMerges(corpusDf(classic), "text", 0))
    assert(e.getMessage.contains("merges > 0"))
  }

  test("learnMerges refuses tokenizer-scale merge counts, pointing at the local path") {
    val e = intercept[IllegalArgumentException](
      Bpe.learnMerges(corpusDf(classic), "text", Bpe.MaxDistributedMerges + 1))
    assert(e.getMessage.contains("learnMergesLocal"))
  }

  private def gotMergesLocal(wordFreq: Map[String, Long], n: Int, minFreq: Long) =
    Bpe.learnMergesLocal(corpusDf(wordFreq), "text", n, minFreq)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_freq"),
        r.getAs[Long]("vocab_size_after")))

  test("learnMergesLocal == learnMerges on the classic corpus (full table)") {
    assert(gotMergesLocal(classic, 8, 2).toSeq == refBpe(classic, 8, 2))
    assert(gotMergesLocal(classic, 8, 2).toSeq == gotMerges(classic, 8, 2).toSeq)
  }

  test("learnMergesLocal == reference on the messy corpus, and runs past the distributed bound") {
    val freqs = Map("a" -> 7L, "ab" -> 4L, "abab" -> 3L, "banana" -> 5L,
      "bandana" -> 2L, "nab" -> 6L, "x" -> 1L)
    assert(gotMergesLocal(freqs, 10, 2).toSeq == refBpe(freqs, 10, 2))
    // tokenizer-scale budget: exhausts the corpus long before the budget,
    // proving the loop runs (and stops) with merges >> MaxDistributedMerges
    val big = gotMergesLocal(freqs, Bpe.MaxDistributedMerges * 4, 1)
    assert(big.toSeq == refBpe(freqs, Bpe.MaxDistributedMerges * 4, 1))
  }

  test("tokenizer e2e: learn (local) -> encode -> pack over real documents") {
    // the full tokenizer-side pipeline a training-data run executes:
    // induce merges from the corpus, encode every doc with them, pack
    // encoded docs into fixed token-budget bins
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.learnMergesLocal(docs, "text", merges = 40, minFreq = 2)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty, "corpus should sustain at least one merge")
    val encoded = docs.select(col("doc_id"), col("source"),
      Bpe.encodeBpe(col("text"), merges).as("toks"))
      .withColumn("n_tok", size(col("toks")))
    val packed = Corpus.packBins(encoded, "source", "doc_id",
      col("n_tok").cast("long"), budget = 2048)
    val bins = packed.groupBy(col("source"), col("bin"))
      .agg(sum(col("n_tok")).as("bin_tok"), max(col("n_tok")).as("max_doc"))
      .collect()
    assert(bins.nonEmpty)
    // packing contract: a bin exceeds the budget only via its boundary
    // doc (bounded overflow), never by more than one doc's tokens
    bins.foreach { b =>
      assert(b.getAs[Long]("bin_tok") < 2048L + b.getAs[Long]("max_doc"),
        s"bin overflows beyond the boundary-doc contract: $b")
    }
    // encoding is lossless on token counts: merges only shrink
    val shrunk = encoded.agg(sum(col("n_tok"))).collect()(0).getLong(0)
    val chars = docs.select(Bpe.encodeBpe(col("text"), Seq.empty).as("t"))
      .agg(sum(size(col("t")))).collect()(0).getLong(0)
    assert(shrunk < chars, s"merges should shrink total tokens: $shrunk vs $chars")
  }

  test("fertility invariants: >= 1 token/word, non-increasing as the vocab grows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def fertility(nMerges: Int): (Long, Long) = {
      val merges =
        if (nMerges == 0) Seq.empty
        else Bpe.learnMergesLocal(docs, "text", merges = nMerges, minFreq = 2)
          .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val r = docs.select(
          graft.functions.tokenCount(col("text")).cast("long").as("nw"),
          size(Bpe.encodeBpe(col("text"), merges)).cast("long").as("nb"))
        .agg(sum(col("nw")), sum(col("nb"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (w0, b0) = fertility(0)
    val (w16, b16) = fertility(16)
    val (w32, b32) = fertility(32)
    assert(w0 == w16 && w16 == w32, "word count must not depend on the vocab")
    assert(b32 <= b16 && b16 <= b0, s"more merges must not grow tokens: $b0/$b16/$b32")
    assert(b32 >= w32, "every word is at least one token")
  }

  test("learnMergesLocal maxWords cap keeps the highest-frequency words") {
    // cap to 2 words: "newest"(6) and "low"(5) survive; merges must match
    // the reference run on exactly that truncated dict
    val capped = Bpe.learnMergesLocal(corpusDf(classic), "text", 8,
        minFreq = 2, maxWords = 2)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_freq"),
        r.getAs[Long]("vocab_size_after")))
    assert(capped.toSeq == refBpe(Map("newest" -> 6L, "low" -> 5L), 8, 2))
  }
}
