package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "apple banana banana"),
    (2L, "apple apple apple"),
    (3L, "cherry date egg"))
    .toDF("doc_id", "text")

  test("bm25TopK ranks the doc matching the rare term + more terms first") {
    val queries = Seq((10L, "apple banana")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, queries, "doc_id", "text",
      "query_id", "qtext", k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score")))
    // d3 shares no term → absent; d1 matches both terms (one rare) → first
    assert(got.map(_._2).toSeq == Seq(1L, 2L), got.toSeq.toString)
    assert(got.forall(_._3 > 0.0), got.toSeq.toString)
    assert(got(0)._3 > got(1)._3, got.toSeq.toString)
  }

  test("bm25TopK treats the query as a term SET (repeats don't double-weight)") {
    val once = Seq((10L, "apple")).toDF("query_id", "qtext")
    val twice = Seq((10L, "apple apple")).toDF("query_id", "qtext")
    def scores(q: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(corpus, q, "doc_id", "text", "query_id", "qtext", k = 5)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scores(once) == scores(twice))
  }

  test("bm25TopK: higher tf wins between same-length docs on a one-term query") {
    val queries = Seq((10L, "apple")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(corpus, queries, "doc_id", "text",
      "query_id", "qtext", k = 5)
      .orderBy("rank").collect().map(_.getAs[Long]("doc_id"))
    assert(got.toSeq == Seq(2L, 1L), got.toSeq.toString) // tf 3 beats tf 1
  }

  test("bm25TopK drops untokenizable docs and queries") {
    val docs = corpus.unionByName(Seq((4L, "   ")).toDF("doc_id", "text"))
    val queries = Seq((10L, "apple"), (11L, "  ")).toDF("query_id", "qtext")
    val got = Retrieval.bm25TopK(docs, queries, "doc_id", "text",
      "query_id", "qtext", k = 5).collect()
    assert(got.forall(_.getAs[Long]("query_id") == 10L))
    assert(!got.exists(_.getAs[Long]("doc_id") == 4L))
  }

  test("rrfFuse sums exact nano-rounded reciprocal ranks across lists") {
    val l1 = Seq((1L, 1, 100L), (1L, 2, 200L)).toDF("query_id", "rank", "doc_id")
    val l2 = Seq((1L, 1, 300L), (1L, 2, 100L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(Seq(l1, l2), k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf_score")))
    // 100 in both lists: floor(1e9/61+.5)+floor(1e9/62+.5) = 16393443+16129032;
    // 200 and 300 tie on a single rank-1/rank-2 entry → smaller doc_id first
    val both = (16393443L + 16129032L).toDouble / 1e9
    val r1 = 16393443L.toDouble / 1e9
    val r2 = 16129032L.toDouble / 1e9
    assert(got.toSeq == Seq((1, 100L, both), (2, 300L, r1), (3, 200L, r2)),
      got.toSeq.toString)
  }

  test("rrfFuse refuses an empty list set") {
    val e = intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq.empty, k = 3))
    assert(e.getMessage.contains("at least one"))
  }

  private def evalRow(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("query_id"), r.getAs[Double]("rr"),
      r.getAs[Double]("ndcg"), r.getAs[Long]("hits"))

  test("evalRanking: the ideal ordering scores rr 1, ndcg 1, full hits") {
    val ranked = Seq((1L, 1, 20L), (1L, 2, 40L), (1L, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val truth = Seq((1L, 20L, 3), (1L, 40L, 2), (1L, 30L, 1))
      .toDF("query_id", "doc_id", "rel")
    val got = Retrieval.evalRanking(ranked, truth, k = 5).collect().map(evalRow)
    assert(got.toSeq == Seq((1L, 1.0, 1.0, 3L)), got.toSeq.toString)
  }

  test("evalRanking: misranking discounts ndcg; rr is the first hit's rank") {
    // hits at ranks 2 (rel 3) and 3 (rel 1); rel-2 doc 40 missed entirely
    val ranked = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val truth = Seq((1L, 20L, 3), (1L, 40L, 2), (1L, 30L, 1))
      .toDF("query_id", "doc_id", "rel")
    val got = Retrieval.evalRanking(ranked, truth, k = 5).collect().map(evalRow)
    val (q, rr, ndcg, hits) = got.head
    assert((q, rr, hits) == ((1L, 0.5, 2L)), got.toSeq.toString)
    val want = (3.0 / math.log(3) + 1.0 / math.log(4)) /
      (3.0 / math.log(2) + 2.0 / math.log(3) + 1.0 / math.log(4))
    assert(math.abs(ndcg - want) < 2e-6, s"ndcg $ndcg != $want")
    assert(ndcg < 1.0)
  }

  test("evalRanking: a truth query with no ranked hits still reports a zero row") {
    val ranked = Seq((1L, 1, 20L)).toDF("query_id", "rank", "doc_id")
    val truth = Seq((1L, 20L, 2), (2L, 99L, 3))
      .toDF("query_id", "doc_id", "rel")
    val got = Retrieval.evalRanking(ranked, truth, k = 5)
      .orderBy("query_id").collect().map(evalRow)
    assert(got.toSeq == Seq((1L, 1.0, 1.0, 1L), (2L, 0.0, 0.0, 0L)),
      got.toSeq.toString)
  }

  test("evalRanking: hits beyond k are excluded from every metric") {
    val ranked = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val truth = Seq((1L, 30L, 3)).toDF("query_id", "doc_id", "rel")
    val got = Retrieval.evalRanking(ranked, truth, k = 2).collect().map(evalRow)
    assert(got.toSeq == Seq((1L, 0.0, 0.0, 0L)), got.toSeq.toString)
  }
}
