package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich, Haddow, Birch
  * 2016) — the learned-tokenizer side of a training-data stack. The
  * library's token counting (F19) approximates a FIXED external vocab;
  * this LEARNS one from the corpus, which is what a pipeline needs to
  * budget tokens, pack sequences, and estimate compression for a
  * tokenizer that will actually be trained on this data.
  *
  * Scale design (100 TB): the corpus is scanned ONCE into a
  * (word, freq) vocabulary frame — classic BPE trains on word
  * frequencies, not running text — so every merge round runs on the
  * vocabulary (Zipf-tailed: far smaller than the corpus but still
  * potentially billions of rows, so it is never collected and never
  * broadcast). A round is one partial-aggregated pair-count over the
  * vocabulary plus a driver-side argmax of exactly ONE row (the chosen
  * pair — the same dimension-scale eager action as
  * contaminationBloom's sketch collect), then a map-only array fold
  * applies the merge. Rounds are localCheckpoint-ed with superseded
  * blocks dropped, the [[Dedup.connectedComponents]] discipline, so M
  * merges cost M small shuffles, not an M-deep lineage.
  */
object Bpe {

  /** End-of-word marker (standard BPE): merges never cross word
    * boundaries, and a symbol sequence decodes unambiguously. */
  val Eow = "</w>"

  /** Greedy left-to-right non-overlapping merge of adjacent (left,
    * right) pairs inside one symbol array — after "a a a" merges its
    * first pair, the result "aa" cannot re-merge with the scanned tail
    * ("aa" ≠ "a"), which is exactly classic BPE's replace order. */
  private def mergeFold(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  private def wordsOf(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)

  /** Learn up to `merges` BPE merge rules from the corpus, stopping
    * early when no pair reaches `minFreq`. Pair counts are weighted by
    * word frequency and count every adjacent position (classic
    * get_stats). Ties break deterministically: highest count, then
    * lexicographic (left, right).
    *
    * Returns (step, left, right, pair_freq, vocab_size_after) — the
    * merge table IS the tokenizer artifact; `vocab_size_after` (distinct
    * symbol count once the merge is applied) pins that each round's
    * merge was applied corpus-wide, not just chosen. */
  def learnMerges(docs: DataFrame, textCol: String, merges: Int,
      minFreq: Long = 2): DataFrame = {
    require(merges > 0, s"learnMerges needs merges > 0, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs
    def dropBlocks(ids: scala.collection.Set[Int]): Unit =
      ids.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = false)))

    val preexisting = persisted.keySet
    var cur = docs
      .select(explode(wordsOf(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(split(col("word"), ""), array(lit(Eow))).as("syms"))
      .localCheckpoint(true)
    var curIds = persisted.keySet -- preexisting
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      val pairs = cur.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (l, r) => struct(l.as("left"), r.as("right")))).as("p"))
        .groupBy(col("p.left").as("left"), col("p.right").as("right"))
        .agg(sum(col("freq")).as("pair_freq"))
      val best = pairs
        .orderBy(col("pair_freq").desc, col("left"), col("right"))
        .limit(1).collect() // ONE row per round — the driver argmax
      if (best.isEmpty || best(0).getAs[Long]("pair_freq") < minFreq)
        exhausted = true
      else {
        val l = best(0).getAs[String]("left")
        val r = best(0).getAs[String]("right")
        val f = best(0).getAs[Long]("pair_freq")
        val beforeNext = persisted.keySet
        val next = cur
          .select(col("freq"), mergeFold(col("syms"), l, r).as("syms"))
          .localCheckpoint(true)
        val nextIds = persisted.keySet -- beforeNext
        val vocabAfter = next.select(explode(col("syms")).as("s"))
          .agg(countDistinct(col("s"))).collect()(0).getLong(0)
        dropBlocks(curIds) // previous round superseded
        cur = next; curIds = nextIds
        step += 1
        out += ((step, l, r, f, vocabAfter))
      }
    }
    dropBlocks(curIds)
    out.toSeq.toDF("step", "left", "right", "pair_freq", "vocab_size_after")
  }

  /** Encode a text column with a learned merge list: per word, start
    * from characters + [[Eow]] and apply every merge in learned order;
    * the result flattens to the document's token sequence. Pure
    * map-side expression — no join against the vocabulary, no shuffle;
    * the merge list is query-compile-time small (a tokenizer has a
    * bounded merge table), so the fold chain stays a static expression
    * tree. */
  def encodeBpe(text: Column, merges: Seq[(String, String)]): Column = {
    val init = transform(wordsOf(text),
      w => concat(split(w, ""), array(lit(Eow))))
    val merged = merges.foldLeft(init) { case (ws, (l, r)) =>
      transform(ws, a => mergeFold(a, l, r))
    }
    flatten(merged)
  }

  /** Post-BPE token count of a text column — the budget/packing input
    * once a vocabulary has been learned. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encodeBpe(text, merges))
}
