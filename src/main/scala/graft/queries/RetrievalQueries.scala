package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.ops.{Retrieval, Similarity}

/** Retrieval over the documents corpus: BM25 keyword search and hybrid
  * sparse+dense rank fusion — the decontamination-lookup / targeted-
  * curation side of a training-data stack. Both DuckDB-oracle-exact:
  * per-term contributions are integer-micro-rounded before any
  * aggregation (the q88 discipline), so ranks compare exact integers
  * on both engines.
  *
  * The query set is derived from the corpus itself (every 97th doc's
  * first-6-token prefix) — deterministic, present at every SF, and
  * shaped like a real decontamination probe. */
object RetrievalQueries {

  private def prefixQueries(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ")
          .as("qtext"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact phrase search over positional postings ("hash join",
    // adjacent and in order — what bag-of-words BM25 cannot express):
    // per-term position lists intersected at phrase offsets, postings
    // filtered to the phrase's terms before any join
    "q179_phrase_search" -> ((s, dir) => {
      Retrieval.phraseSearch(t(s, dir, "documents"), "doc_id", "text",
        "hash join")
        .orderBy(col("id"))
    }),

    // Okapi BM25 top-5 per probe query (Lucene always-positive idf,
    // k1=1.2, b=0.75) — posting/df tables corpus-derived and never
    // broadcast; bounded-heap per-query ranking
    "q93_bm25_retrieval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Retrieval.bm25TopK(docs, prefixQueries(docs), "doc_id", "text",
        "query_id", "qtext", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hybrid search: BM25 top-10 and dense cosine top-10 fused by
    // reciprocal-rank fusion (c=60) into a top-5 — the production
    // hybrid-retrieval shape (doc_id ≡ vec_id in the testdata)
    "q94_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vecs = t(s, dir, "embeddings")
      val sparse = Retrieval.bm25TopK(docs, prefixQueries(docs), "doc_id",
        "text", "query_id", "qtext", k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"))
      val dense = Similarity.bruteForceTopK(vecs,
        vecs.filter(col("vec_id") % 97 === 0), "vec_id", "embedding", k = 10)
        .select(col("probe_id").as("query_id"), col("rank"),
          col("neighbor_id").as("doc_id"))
      Retrieval.rrfFuse(Seq(sparse, dense), k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Retrieval evaluation gauge: the BM25 top-5 scored against a
    // cross-modal truth — exact dense-cosine top-3 per probe, graded
    // rel = 4 − rank — yielding per-query MRR / nDCG@5 / hit count.
    // The sparse-vs-dense agreement check a hybrid stack runs before
    // trusting either ranker alone; gauge-sized frames only.
    "q96_retrieval_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vecs = t(s, dir, "embeddings")
      val sparse = Retrieval.bm25TopK(docs, prefixQueries(docs), "doc_id",
        "text", "query_id", "qtext", k = 5)
        .select(col("query_id"), col("rank"), col("doc_id"))
      val truth = Similarity.bruteForceTopK(vecs,
        vecs.filter(col("vec_id") % 97 === 0), "vec_id", "embedding", k = 3)
        .select(col("probe_id").as("query_id"),
          col("neighbor_id").as("doc_id"), (lit(4) - col("rank")).as("rel"))
      Retrieval.evalRanking(sparse, truth, k = 5)
        .orderBy(col("query_id"))
    })
  )

  // Shared oracle CTE prefix: tokenized docs, collection stats,
  // postings with doc length, document frequencies, probe-query terms.
  // Float discipline mirrors the Spark side expression-for-expression;
  // per-term scores round to integer micro-units BEFORE summing.
  private val bm25Ctes =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS l
      |  FROM documents WHERE length(trim(text)) > 0),
      |stats AS (SELECT count(*) AS n_docs, sum(len(l)) AS sum_dl FROM toks),
      |post AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
      |           SELECT doc_id, len(l) AS dl, unnest(l) AS term FROM toks)
      |         GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
      |qt AS (SELECT DISTINCT query_id, term FROM (
      |         SELECT doc_id AS query_id, unnest(l[1:6]) AS term
      |         FROM toks WHERE doc_id % 97 = 0)),
      |sc AS (SELECT qt.query_id, p.doc_id,
      |    CAST(floor(
      |      ln((CAST(s.n_docs - d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
      |         / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
      |      * (CAST(p.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
      |      / (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |         * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
      |            + CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE)
      |              / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))
      |      * 1000000.0 + 0.5) AS BIGINT) AS m
      |  FROM post p JOIN qt USING (term) JOIN dfreq d USING (term)
      |  CROSS JOIN stats s),
      |agg AS (SELECT query_id, doc_id, sum(m) AS sm FROM sc GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    // positions are engine-internal (1-based here, 0-based in Spark) —
    // only (doc, match-count) crosses the contract, so the twin is free
    // to intersect with explicit pos+1 joins
    "q179_phrase_search" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS l
        |  FROM documents WHERE length(trim(text)) > 0),
        |p AS (SELECT doc_id, i AS pos, l[i] AS token
        |  FROM t, unnest(generate_series(1, len(l))) AS u(i)),
        |m0 AS (SELECT doc_id, pos FROM p WHERE token = 'hash'),
        |m1 AS (SELECT m0.doc_id, m0.pos FROM m0
        |  JOIN p ON p.doc_id = m0.doc_id AND p.pos = m0.pos + 1
        |    AND p.token = 'join')
        |SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_matches
        |FROM m1 GROUP BY 1 ORDER BY id""".stripMargin,
    "q93_bm25_retrieval" -> (bm25Ctes +
      """
        |SELECT query_id, rank, doc_id, score FROM (
        |  SELECT query_id, doc_id, CAST(sm AS DOUBLE) / 1000000.0 AS score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sm DESC, doc_id) AS rank
        |  FROM agg) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin),
    "q94_hybrid_rrf" -> (bm25Ctes +
      """,
        |sparse AS (SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sm DESC, doc_id) AS rank
        |    FROM agg) WHERE rank <= 10),
        |dense AS (SELECT query_id, doc_id, rank FROM (
        |    SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
        |      row_number() OVER (PARTITION BY p.vec_id
        |        ORDER BY round(list_cosine_similarity(
        |          CAST(p.embedding AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS rank
        |    FROM embeddings p CROSS JOIN embeddings c
        |    WHERE p.vec_id % 97 = 0) WHERE rank <= 10),
        |fused AS (SELECT query_id, doc_id, sum(m) AS sm FROM (
        |    SELECT query_id, doc_id,
        |      CAST(floor(1000000000.0 / CAST(60 + rank AS DOUBLE) + 0.5)
        |        AS BIGINT) AS m
        |    FROM (SELECT * FROM sparse UNION ALL SELECT * FROM dense))
        |  GROUP BY 1, 2)
        |SELECT query_id, rank, doc_id, rrf_score FROM (
        |  SELECT query_id, doc_id,
        |    CAST(sm AS DOUBLE) / 1000000000.0 AS rrf_score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sm DESC, doc_id) AS rank
        |  FROM fused) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin),
    "q96_retrieval_eval" -> (bm25Ctes +
      """,
        |sparse AS (SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sm DESC, doc_id) AS rank
        |    FROM agg) WHERE rank <= 5),
        |truth AS (SELECT query_id, doc_id, 4 - rank AS rel FROM (
        |    SELECT p.vec_id AS query_id, c.vec_id AS doc_id,
        |      row_number() OVER (PARTITION BY p.vec_id
        |        ORDER BY round(list_cosine_similarity(
        |          CAST(p.embedding AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])), 6) DESC, c.vec_id) AS rank
        |    FROM embeddings p CROSS JOIN embeddings c
        |    WHERE p.vec_id % 97 = 0) WHERE rank <= 3),
        |hagg AS (SELECT s.query_id,
        |    CAST(floor(1000000.0 / CAST(min(s.rank) AS DOUBLE) + 0.5)
        |      AS BIGINT) AS rrm,
        |    sum(CAST(floor(CAST(t.rel AS DOUBLE)
        |      / ln(CAST(s.rank + 1 AS DOUBLE)) * 1000000.0 + 0.5)
        |      AS BIGINT)) AS dcg,
        |    count(*) AS hits
        |  FROM sparse s JOIN truth t USING (query_id, doc_id)
        |  GROUP BY 1),
        |ideal AS (SELECT query_id,
        |    sum(CAST(floor(CAST(rel AS DOUBLE)
        |      / ln(CAST(rn + 1 AS DOUBLE)) * 1000000.0 + 0.5)
        |      AS BIGINT)) AS idcg
        |  FROM (SELECT query_id, rel, row_number() OVER (
        |          PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
        |        FROM truth)
        |  WHERE rn <= 5 GROUP BY 1)
        |SELECT i.query_id,
        |  CAST(coalesce(h.rrm, 0) AS DOUBLE) / 1000000.0 AS rr,
        |  floor(CAST(coalesce(h.dcg, 0) AS DOUBLE)
        |    / CAST(i.idcg AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS ndcg,
        |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits
        |FROM ideal i LEFT JOIN hagg h USING (query_id)
        |ORDER BY query_id""".stripMargin)
  )
}
