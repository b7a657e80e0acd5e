package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.ops.Pin.PinSyntax

/** Sparse (BM25) retrieval and rank fusion — the retrieval side of a
  * training-data stack: decontamination lookups ("which corpus docs
  * match this eval question"), targeted curation, and hybrid
  * keyword+vector search next to [[Similarity]]'s dense indexes.
  *
  * Scale shape: the posting list and document-frequency tables are
  * CORPUS-DERIVED (a Zipf-tailed vocabulary reaches billions of terms
  * at 100 TB) so neither is ever broadcast — the q61/stripBoilerplate
  * discipline; the query-term set is probe-sized and rides a
  * broadcast, so only postings matching some query term survive the
  * first join. Per-query ranking uses the bounded-heap
  * [[graft.functions.TopKByScore]] aggregate: partial aggregation
  * keeps top-k map-side and only O(queries × k) rows cross the final
  * exchange.
  *
  * Determinism (DuckDB-oracle-exact, not rows-only): every per-term
  * score contribution is rounded to integer MICRO-units before the
  * per-doc aggregation — the per-doc sum is exact integer math, so
  * float summation order (which differs across engines and across
  * partitionings of the same engine) can never move a rank; ranking
  * compares those exact integers. The q88 bigram-LM trick applied to
  * retrieval. */
object Retrieval {

  private def toks(df: DataFrame, textCol: String): DataFrame = df
    .filter(length(trim(col(textCol))) > 0)
    .withColumn("__toks", split(lower(trim(col(textCol))), "\\s+"))

  /** Okapi BM25 top-k: score every document against every query on
    * their shared terms and keep each query's k best (ties broken by
    * smaller doc id — the heap's order matches the oracle's
    * `ORDER BY score DESC, doc_id`).
    *
    * Model (the Lucene always-positive idf variant):
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1), and a matched term
    * contributes idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    * N and avgdl are computed over tokenizable docs (a doc with no
    * tokens can match nothing and is excluded from the collection
    * stats too). Query terms are DISTINCT — BM25 is a set-of-terms
    * model; repeating a term in the query must not double its weight.
    *
    * Plan: one corpus scan builds postings with dl carried THROUGH the
    * groupBy key (functionally dependent on doc_id — no second
    * corpus-sized join to re-attach lengths); df aggregates off the
    * postings; the collection stats are one row riding a cross join. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, queryIdCol: String, queryTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val postings = toks(docs.select(col(idCol).as("doc_id"), col(textCol)), textCol)
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // one map-only scan — no exchange; N/avgdl over tokenizable docs
    val stats = toks(docs.select(col(idCol).as("doc_id"), col(textCol)), textCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__toks")).cast("long")).as("sum_dl"))
    val qterms = toks(
      queries.select(col(queryIdCol).as("query_id"), col(queryTextCol)), queryTextCol)
      .select(col("query_id"), explode(col("__toks")).as("term"))
      .distinct()
    val idf = log(
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    val scored = postings
      .join(broadcast(qterms), Seq("term"))
      .join(dfreq, Seq("term")) // both corpus-derived: AQE decides
      .crossJoin(stats) // one row — auto-broadcast
      .withColumn("__m", floor(
        idf * (col("tf").cast("double") * lit(k1 + 1.0)) / denom
          * lit(1000000.0) + lit(0.5)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__m")).as("__sm"))
    rankByScore(scored, col("__sm").cast("double"), k)
      .withColumn("score", col("__score") / 1000000.0)
      .drop("__score")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke, Büttcher 2009): fuse any
    * number of ranked lists — each (query_id, rank, doc_id) — into one
    * ranking by sum of 1/(c + rank), the standard hybrid-search merge
    * for a sparse (BM25) and a dense (ANN) list. Contributions are
    * exact-rounded to integer NANO-units per list entry, so the fused
    * score is integer math: rank agreement with any SQL oracle cannot
    * be lost to float sum order. Inputs are already O(queries × k)
    * small; the fusion is a toy aggregation. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contrib = lists.map(_.select(col("query_id"), col("doc_id"),
      floor(lit(1000000000.0) / (lit(c) + col("rank")).cast("double") + lit(0.5))
        .as("__m")))
    val fused = contrib.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__m")).as("__sm"))
    rankByScore(fused, col("__sm").cast("double"), k)
      .withColumn("rrf_score", col("__score") / 1000000000.0)
      .drop("__score")
  }

  /** Ranking-quality gauge: per-query reciprocal rank, nDCG@k, and hit
    * count of a ranked list against a graded relevance truth — the
    * retrieve side's analog of [[Similarity.recallAtK]], closing the
    * build→search→evaluate loop (tune BM25/RRF/ANN parameters against a
    * labeled or cross-modal truth set).
    *
    * `ranked` is (query_id, rank, doc_id); `truth` is (query_id,
    * doc_id, rel) with integer grades (higher = more relevant). Output:
    * one row per truth query — rr (1/rank of the first relevant hit, 0
    * if none in the top k), ndcg (DCG/IDCG over the top k), hits.
    *
    * Both inputs are already O(queries × k) — every join and window
    * here runs on gauge-sized frames; the corpus is never touched.
    *
    * Determinism (oracle-exact): each position's gain rel/ln(pos+1) is
    * rounded to integer MICRO-units before summation (log base cancels
    * in the DCG/IDCG ratio, and ln is the one log both engines compute
    * bit-identically — the q93 idf precedent), so DCG and IDCG are
    * exact integers and nDCG is one deterministic double division. */
  def evalRanking(ranked: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    def gain(rel: Column, pos: Column): Column =
      floor(rel.cast("double") / log(pos.cast("double") + lit(1.0))
        * lit(1000000.0) + lit(0.5)).cast("long")
    val r = ranked.filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val tr = truth.select(col("query_id"), col("doc_id"), col("rel"))
    val hits = r.join(tr, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(
        floor(lit(1000000.0) / min(col("rank")).cast("double") + lit(0.5))
          .cast("long").as("__rrm"),
        sum(gain(col("rel"), col("rank"))).as("__dcg"),
        count(lit(1)).as("__hits"))
    val ideal = tr
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rel").desc, col("doc_id"))))
      .filter(col("__rn") <= k)
      .groupBy(col("query_id"))
      .agg(sum(gain(col("rel"), col("__rn"))).as("__idcg"))
    ideal.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("__rrm"), lit(0L)).cast("double") / 1000000.0).as("rr"),
        (floor(coalesce(col("__dcg"), lit(0L)).cast("double")
          / col("__idcg").cast("double") * 1000000.0 + 0.5) / 1000000.0)
          .as("ndcg"),
        coalesce(col("__hits"), lit(0L)).as("hits"))
  }

  /** Bounded-heap per-query top-k over (query_id, doc_id, score) →
    * (query_id, rank, doc_id, __score), ties broken by smaller doc id. */
  private def rankByScore(scored: DataFrame, score: Column, k: Int): DataFrame =
    scored.withColumn("__score", score)
      .groupBy(col("query_id"))
      .agg(topKByScore(col("__score"), col("doc_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r0", "nb")))
      .select(col("query_id"), (col("r0") + 1).cast("int").as("rank"),
        col("nb.id").as("doc_id"), col("nb.score").as("__score"))

  /** Exact PHRASE search over positional postings — the operator BM25's
    * bag-of-words scoring cannot express: "hash join" must match those
    * two tokens ADJACENT and in order. Builds (id, pos, token) postings
    * and intersects the per-term position lists with the classic
    * pos+offset equi-join (each term joins at its phrase offset).
    * Returns (id, n_matches) for documents containing the phrase, with
    * n_matches = the number of distinct start positions.
    *
    * Scale shape: the postings frame is filtered to the phrase's terms
    * BEFORE any join (term-selective scans of a corpus-derived posting
    * table — never broadcast); each of the m−1 joins is an (id, pos)
    * equi-join between position lists of single terms, so work is
    * bounded by the rarest term's postings, the same reason inverted
    * indexes intersect rarest-first. Semi-joins keep only start
    * positions — no payload rides the intersections. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val terms = phrase.trim.toLowerCase.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty,
      "phraseSearch needs a non-empty phrase")
    // one consumer per phrase term — tokenize once, keep only the
    // phrase's terms, and serve every per-term position list from the
    // materialized slice instead of re-exploding the corpus per term
    val post = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("pos", "token")))
      .filter(col("token").isin(terms.distinct: _*))
      .pinned
    var starts = post.filter(col("token") === terms.head)
      .select(col("id"), col("pos"))
    for ((t, j) <- terms.tail.zipWithIndex) {
      val atOffset = post.filter(col("token") === t)
        .select(col("id"), (col("pos") - (j + 1)).as("pos"))
      starts = starts.join(atOffset, Seq("id", "pos"), "left_semi")
    }
    starts.groupBy(col("id")).agg(count(lit(1)).as("n_matches"))
  }
}
