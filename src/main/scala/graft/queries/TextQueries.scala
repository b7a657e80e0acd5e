package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions._

/** Text-analysis operators over the documents table (north-star ops:
  * token counting, quality scoring, language-ID, fingerprinting). */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q12_token_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("len_chars"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring — identical arithmetic on both engines so the
    // rounded double hash-matches
    "q22_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID heuristic: stopword-marker hit ratio, argmax language
    // (deterministic integer-ratio math, so it carries a full DuckDB
    // oracle — the marker lists and the (score, lang) tie-break are
    // mirrored exactly in the SQL below)
    // Flesch reading-ease readability: vowel-group syllable heuristic,
    // sentence count from terminal-punctuation runs, micro-rounded
    // fixed-order float formula — oracle-exact
    "q130_readability" -> ((s, dir) => {
      val text = col("text")
      val nWords = when(length(trim(text)) === 0, lit(0L))
        .otherwise(size(split(trim(text), "\\s+")).cast("long"))
      val nSent = greatest(lit(1L),
        regexp_count(text, lit("[.!?]+")).cast("long"))
      val nSyl = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
      t(s, dir, "documents").select(
        col("doc_id"), nWords.as("n_words"), nSent.as("n_sentences"),
        nSyl.as("n_syllables"),
        when(nWords > 0,
          floor((lit(206.835)
            - lit(1.015) * (nWords.cast("double") / nSent.cast("double"))
            - lit(84.6) * (nSyl.cast("double") / nWords.cast("double")))
            * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
          .otherwise(lit(null).cast("double")).as("flesch"))
        .orderBy(col("doc_id"))
    }),

    "q21_lang_id" -> ((s, dir) => {
      // widened (round 15): the per-doc marker-vocabulary scan is the
      // single-split scan stage's compute — see ops/Fan
      graft.ops.Fan.widen(
          t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")))
        .select(col("doc_id"), col("lang"), langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Rolling-hash document fingerprint (custom codegen expression;
    // no SQL oracle — golden-tested in FunctionsSpec)
    "q23_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), fingerprint(col("text")).as("fp"),
        subwordCount(col("text")).as("n_subwords"))
        .orderBy(col("doc_id"))
    }),

    // Exact corpus vocabulary top-k: explode → groupBy token — the
    // oracle-checked twin of q52's bounded-memory sketch. Whitespace
    // tokenization on the lowercased text; total order (count desc, token)
    "q51_token_topk" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    }),

    // Misra-Gries heavy hitters: the 100 TB path for q51's question —
    // O(partitions × m) rows cross the shuffle instead of every token
    // occurrence (rows-only; SemanticsSpec proves containment vs exact)
    "q52_heavy_hitters" -> ((s, dir) => {
      t(s, dir, "documents")
        .agg(heavyHitters(col("text"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token").as("token"), col("e.count").as("count_lb"))
        .orderBy(col("count_lb").desc, col("token"))
        .limit(20)
    }),

    // Count-min-sketch heavy hitters: the mergeable twin of q52 — exact
    // cell-wise table merge makes counts partition-count independent,
    // where Misra-Gries merge error compounds with executor count
    // (rows-only; CountMinSpec proves the upper-bound contract vs exact)
    "q85_cms_heavy_hitters" -> ((s, dir) => {
      t(s, dir, "documents")
        .agg(cmsHeavyHitters(col("text"), 20).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token").as("token"), col("e.count").as("count_ub"))
        .orderBy(col("count_ub").desc, col("token"))
    }),

    // Sliding-window token chunking — the training-sample splitter:
    // 64-token chunks, stride 48 (16-token overlap), one row per chunk.
    // The last start is rounded UP to the next stride multiple so the
    // tail past the final full window still lands in a (truncated)
    // chunk — a splitter that silently drops up to chunk-1 trailing
    // tokens per doc is data loss at corpus scale. Pure builtins
    // (split/sequence/slice/array_join), all codegen'd; explode is
    // narrow, so chunking adds NO shuffle before whatever aggregation
    // or writer consumes the chunks.
    "q55_token_chunks" -> ((s, dir) => {
      val chunk = 64
      val stride = 48
      val toks = split(trim(col("text")), "\\s+")
      val over = greatest(size(col("t")) - chunk, lit(0))
      val lastStart = over + (lit(stride) - over % stride) % stride
      t(s, dir, "documents")
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          explode(sequence(lit(0), lastStart, lit(stride))).as("chunk_start"), col("t"))
        .select(col("doc_id"),
          col("chunk_start").cast("long").as("chunk_start"), // pin to i64: DuckDB generate_series yields BIGINT
          array_join(slice(col("t"), col("chunk_start") + 1, lit(chunk)), " ").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_start"))
    }),

    // PII scrub over text with deterministic synthesized contact info
    "q56_pii_scrub" -> ((s, dir) => {
      val dirty = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ssn 123-45-6789"))
      t(s, dir, "documents").select(
        col("doc_id"), piiScrub(dirty).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // HTML strip + entity decode over synthesized web-scraped text
    "q54_html_strip" -> ((s, dir) => {
      val webby = concat(lit("<p class=\"x\">"), col("text"),
        lit("</p> <a href=\"y\">&amp; more &lt;tags&gt;</a>"))
      t(s, dir, "documents").select(
        col("doc_id"), htmlStrip(webby).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Deflate-ratio quality signal (codegen CompressionRatio): natural
    // prose vs the same text made degenerate by self-repetition — the
    // information-theoretic filter next to q22's lexical score. No
    // DuckDB deflate exists, so this is golden-pinned, with the
    // repetition-monotonicity semantics tested in FunctionsSpec
    "q81_compression_ratio" -> ((s, dir) => {
      val repeated = concat_ws(" ", col("text"), col("text"), col("text"))
      t(s, dir, "documents").select(col("doc_id"),
        round(compressionRatio(col("text")), 4).as("ratio"),
        round(compressionRatio(repeated), 4).as("ratio_3x"))
        .orderBy(col("doc_id"))
    }),

    // BPE vocabulary induction: 10 merges learned from the corpus's
    // word-frequency table (one corpus scan; every round runs on the
    // vocabulary frame). Golden-pinned — the iterative argmax+merge
    // loop has no portable SQL twin; vocab_size_after pins that each
    // merge was applied corpus-wide, not just chosen.
    "q97_bpe_merges" -> ((s, dir) => {
      graft.ops.Bpe.learnMerges(t(s, dir, "documents"), "text",
        merges = 10, minFreq = 2)
        .orderBy(col("step"))
    }),

    // F12 — multi-format date parsing (ISO datetime, else bare date)
    "q28_flexible_dates" -> ((s, dir) => {
      val raw = t(s, dir, "orders").withColumn("date_str",
        when(col("o_orderkey") % 2 === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"))
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
      // widened (round 15): the lenient multi-format parse is the
      // single-split scan stage's compute — see ops/Fan
      graft.ops.Fan.widen(raw.select(col("o_orderkey"), col("date_str")))
        .select(col("o_orderkey"),
          parseFlexibleTimestamp(col("date_str")).as("parsed"))
        .orderBy(col("o_orderkey"))
    }),

    // Character-level Shannon entropy (functions/CharEntropy — one-pass
    // codegen kernel): the gibberish/padding gauge next to q81's
    // deflate ratio; nano-nat integer terms keep a float-free sum, so
    // the SQL twin's per-char explode hash-matches the kernel exactly
    "q152_char_entropy" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          charEntropyNanos(col("text")).as("entropy_nano"))
        .orderBy(col("doc_id"))
    })
  )

  /** DuckDB twin of [[graft.functions.qualityScore]] over a `text`
    * column — shared by q22 and the quality-band filter (q64). */
  val qualityScoreSql: String =
    """floor(greatest(0.0, least(1.0,
      |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.25
      |    + (CASE WHEN length(text) > 0
      |         THEN CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) AS DOUBLE)
      |              / CAST(length(text) AS DOUBLE) ELSE 0.0 END) * 0.35
      |    + (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
      |                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END) > 0
      |         THEN CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS DOUBLE)
      |              / CAST((CASE WHEN length(trim(text)) = 0 THEN 0
      |                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS DOUBLE)
      |         ELSE 0.0 END) * 0.3
      |    + (1.0 - (CASE WHEN length(text) > 0
      |         THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}]', '', 'g')) AS DOUBLE)
      |              / CAST(length(text) AS DOUBLE) ELSE 0.0 END)) * 0.1))
      |    * 1000000.0 + 0.5) / 1000000.0""".stripMargin

  /** q21's oracle is generated from [[graft.functions.LangMarkers]] so
    * the SQL marker lists can never drift from the Spark expression;
    * tie-break (score DESC, lang DESC) mirrors array_max over
    * struct(score, lang). */
  private val langIdSql: String = {
    val langs = LangMarkers.keys.toSeq.sorted
    val scoreCols = langs.map { lang =>
      // escape apostrophes so an elision marker ("l'", "don't") can't
      // generate unparseable oracle SQL
      val inList = LangMarkers(lang)
        .map(m => "'" + m.replace("'", "''") + "'").mkString(", ")
      s"""CAST(len(list_filter(toks, x -> x IN ($inList))) AS DOUBLE)
         |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS s_$lang""".stripMargin
    }.mkString(",\n    ")
    val unions = langs.map(l =>
      s"SELECT doc_id, lang, '$l' AS cand, s_$l AS score FROM sc").mkString("\n  UNION ALL ")
    s"""WITH d AS (SELECT doc_id, lang,
       |  regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
       |sc AS (SELECT doc_id, lang,
       |    $scoreCols
       |  FROM d),
       |u AS (
       |  $unions),
       |best AS (SELECT doc_id, lang, cand, score,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cand DESC) AS rn FROM u)
       |SELECT doc_id, lang,
       |  CASE WHEN score >= 0.05 THEN cand ELSE 'und' END AS lang_pred
       |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q130_readability" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(n_syllables AS BIGINT) AS n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    floor((206.835
        |        - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |        - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0
        |  ELSE NULL END AS flesch
        |FROM d ORDER BY doc_id""".stripMargin,
    "q21_lang_id" -> langIdSql,
    "q12_token_stats" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  length(text) AS len_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_quality" ->
      s"""SELECT doc_id,
         |  $qualityScoreSql AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q56_pii_scrub" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  text || ' contact user' || doc_id || '@example.com or 555-'
        |    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ssn 123-45-6789',
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |  '\d{3}-\d{2}-\d{4}', '[SSN]', 'g'),
        |  '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q55_token_chunks" ->
      """SELECT doc_id, s AS chunk_start,
        |  array_to_string(t[s + 1 : s + 64], ' ') AS chunk
        |FROM (SELECT doc_id, t, greatest(len(t) - 64, 0) AS ov
        |      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |            FROM documents)),
        |  UNNEST(generate_series(0, ov + (48 - ov % 48) % 48, 48)) AS u(s)
        |ORDER BY doc_id, chunk_start""".stripMargin,
    "q54_html_strip" ->
      """SELECT doc_id, trim(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    '<p class="x">' || text || '</p> <a href="y">&amp; more &lt;tags&gt;</a>',
        |    '<[^>]*>', ' ', 'g'),
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'), '&amp;', '&', 'g'), '\s+', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q51_token_topk" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        |  FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "q28_flexible_dates" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0
        |    THEN try_strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S')
        |    ELSE try_strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') END AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // per-distinct-char term floor(p·ln(p)·1e9 + 0.5), the identical
    // left-assoc double pipeline the kernel runs; empty docs coalesce
    // to zero entropy
    "q152_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
        |  FROM documents),
        |cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM cc GROUP BY 1),
        |terms AS (SELECT cc.doc_id,
        |    CAST(floor((CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n)
        |      * 1e9 + 0.5) AS BIGINT) AS t
        |  FROM cc JOIN tot USING (doc_id)),
        |e AS (SELECT doc_id, -CAST(sum(t) AS BIGINT) AS entropy_nano
        |  FROM terms GROUP BY 1)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  coalesce(entropy_nano, 0) AS entropy_nano
        |FROM documents LEFT JOIN e USING (doc_id)
        |ORDER BY doc_id""".stripMargin
  )
}
