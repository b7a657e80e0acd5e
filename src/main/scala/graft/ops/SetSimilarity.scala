package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinSyntax

/** EXACT Jaccard-threshold set-similarity self-join via prefix filtering
  * (the PPJoin family — Xiao et al., WWW 2008; public algorithm). The
  * MinHash/SimHash paths in [[Dedup]] are probabilistic; this is the
  * exact counterpart for token-set similarity: every emitted pair has
  * true Jaccard >= tau AND no qualifying pair is missed. The q170 DuckDB
  * brute-force oracle is the empirical losslessness proof at sf0.01.
  *
  * Scale shape (100 TB story):
  *  - one shuffle to distinct (id, token);
  *  - token frequencies via one aggregation — no global vocabulary sort
  *    or dense rank is materialized: the canonical token order is the
  *    (frequency asc, token asc) TUPLE, applied per-document by a window
  *    partitioned on the document id;
  *  - prefix filter: a document with s distinct tokens keeps only its
  *    first  s - ceil(tau*s) + 1  tokens in canonical order. Two sets
  *    with Jaccard >= tau MUST share a prefix token (pigeonhole on the
  *    (1-tau)*s tokens a match may miss), so the candidate equi-join on
  *    prefix tokens is lossless. Rare tokens sort first, so hub tokens
  *    almost never enter a prefix — the join cannot blow up on "the";
  *  - size-ratio pruning inside the candidate join: Jaccard >= tau
  *    implies tau * max(|A|,|B|) <= min(|A|,|B|);
  *  - the exact intersection count runs ONLY over surviving candidates:
  *    candidates fan out by the a-side token list and equi-join
  *    (b_id, token) against the token table — |candidates| * avg-set-size
  *    rows, never a token-keyed all-pairs explosion.
  *
  * All comparisons are integer (tau in micro-units); no floating point
  * anywhere, so results are partitioning- and platform-independent.
  */
object SetSimilarity {

  /** Exact Jaccard >= tauMicro/1e6 pairs over (idCol, tokenCol) rows
    * (rows need not be distinct — the op dedups). Returns
    * (a_id, b_id, inter, uni, jac_micro) with a_id < b_id.
    */
  def jaccardJoinExact(tokens: DataFrame, idCol: String, tokenCol: String,
      tauMicro: Long): DataFrame = {
    require(tauMicro > 0 && tauMicro <= 1000000L,
      s"tauMicro must be in (0, 1e6], got $tauMicro")
    // Token strings leave the pipeline immediately: every downstream
    // join/group keys on a 64-bit xxhash of the token, not the string —
    // narrow shuffles, long-keyed hash joins. A hash collision would
    // merge two tokens corpus-WIDE (slightly overcounting some
    // intersections); at 64 bits that needs ~10^9 distinct tokens to
    // become likely — swap in the 128-bit md5 pair beyond that.
    // Five consumers (sizes, freq, prefix build, both intersection
    // sides) — materialize the distinct frame once or the whole
    // tokenize+explode+distinct pipeline re-runs per consumer.
    val tok = tokens
      .select(col(idCol).cast("long").as("id"), col(tokenCol).as("token"))
      .where(col("token").isNotNull && length(col("token")) > 0)
      .select(col("id"), xxhash64(col("token")).as("token"))
      .distinct()
      .pinned

    val sizes = tok.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("tf"))

    // Prefix length: sz - ceil(tau*sz) + 1, all-integer ceil.
    val prefixLen = col("sz") -
      expr(s"(($tauMicro * sz + 999999) div 1000000)") + 1L
    val canonical = Window.partitionBy(col("id"))
      .orderBy(col("tf"), col("token"))
    // two consumers (candidate join a/b sides): don't sort twice
    val prefixes = tok
      .join(freq, "token")
      .join(sizes, "id")
      .withColumn("pos", row_number().over(canonical))
      .where(col("pos") <= prefixLen)
      .select(col("id"), col("token"), col("sz"), col("pos"))
      .pinned

    val a = prefixes.select(col("id").as("a_id"), col("token"),
      col("sz").as("sa"), col("pos").as("pa"))
    val b = prefixes.select(col("id").as("b_id"), col("token"),
      col("sz").as("sb"), col("pos").as("pb"))
    // PPJoin's positional filter rides the candidate join: a pair's
    // overlap can't exceed 1 + min(remaining tokens after the match on
    // each side), and Jaccard >= tau needs overlap >= ceil(tau·(sa+sb)
    // / (1+tau)). For the pair's FIRST shared prefix token the bound is
    // tight-and-valid, so filtering per collision row then dedup loses
    // nothing (the first-occurrence row always survives).
    val alpha = expr(s"(($tauMicro * (sa + sb) + ${1000000L + tauMicro} - 1)" +
      s" div ${1000000L + tauMicro})")
    // the dedup exchange carries BARE (a_id, b_id) pairs: at char-gram
    // operating points the prefix join emits one row per SHARED prefix
    // token (22.8M rows at sf0.1 for q225) and that stream IS the
    // query's dominant shuffle — sa/sb ride only the pre-exchange
    // filters and are recovered after dedup as size(toks) from the doc
    // arrays the verify joins in anyway (identical values: sz is the
    // distinct-token count and toks is the distinct-token array)
    // NOT pinned (measured, round 15): the dedup aggregation does run
    // twice at sf0.1 (AQE rebuilds it for the second verify join's
    // broadcast), but an eager pin here priced 1.6x WORSE wall on every
    // PPJoin consumer — the pin job serializes the pipeline and forfeits
    // AQE's runtime join choices for the verify tail; the duplicate
    // dedup is the cheaper evil at every measured size
    val candidates = a.join(b, Seq("token"))
      .where(col("a_id") < col("b_id") &&
        lit(tauMicro) * greatest(col("sa"), col("sb")) <=
          lit(1000000L) * least(col("sa"), col("sb")) &&
        lit(1L) + least(col("sa") - col("pa"), col("sb") - col("pb")) >= alpha)
      .select(col("a_id"), col("b_id"))
      .distinct()

    // Exact verification restricted to candidates, PPJoin-style: each
    // doc's token-hash ARRAY rides two id-keyed joins onto the
    // candidate pair and the intersection is computed IN-ROW — no
    // row-per-shared-token fanout through an exchange. Work is
    // |candidates| rows carrying two set-size arrays; for huge
    // documents (arrays too wide for a row) fall back to the
    // fanout-and-count join on (id, token). The arrays are SORTED once
    // per document so the per-candidate intersect is a primitive
    // merge-count (graft.functions.sortedLongIntersectCount) instead
    // of array_intersect's per-row hash set — at tau = 0.6 over
    // char-gram sets the prefix filter passes tens of millions of
    // candidates (22.8M at sf0.1 for q225), so this per-pair constant
    // IS the query's cost center.
    val docArrs = tok.groupBy(col("id"))
      .agg(sort_array(collect_list(col("token"))).as("toks"))
    val inter = candidates
      .join(docArrs.select(col("id").as("a_id"), col("toks").as("__ta")),
        Seq("a_id"))
      .join(docArrs.select(col("id").as("b_id"), col("toks").as("__tb")),
        Seq("b_id"))
      .withColumn("inter",
        graft.functions.sortedLongIntersectCount(col("__ta"), col("__tb")))

    inter
      .withColumn("uni",
        (size(col("__ta")) + size(col("__tb"))).cast("long") - col("inter"))
      .where(col("inter") * 1000000L >= lit(tauMicro) * col("uni"))
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"),
        expr("(inter * 1000000 div uni)").as("jac_micro"))
  }

  /** EXACT containment join: pairs where C(A→B) = |A∩B| / |A| >= tau —
    * the ASYMMETRIC near-dup relation Jaccard misses (a paragraph
    * quoted inside a much larger document has high containment and
    * negligible Jaccard). Directed output: (a_id, b_id, inter, sa,
    * cont_micro) with a_id ≠ b_id, A the contained side.
    *
    * Losslessness: C >= tau means A misses at most (1−tau)·|A| of its
    * tokens in B, so of A's floor((1−tau)|A|)+1 rarest tokens (its
    * containment prefix) at least one is in B — candidates come from
    * prefix(A) ⋈ ALL tokens(B). The B side is deliberately
    * unrestricted (that is what makes small-in-big detectable); the
    * prefix side's tokens are globally rare, which is what keeps the
    * probe join hub-safe. Verification is the same in-row
    * array-intersect as [[jaccardJoinExact]]. The q211 brute-force
    * oracle is the empirical proof. */
  def containmentJoinExact(tokens: DataFrame, idCol: String, tokenCol: String,
      tauMicro: Long): DataFrame = {
    require(tauMicro > 0 && tauMicro <= 1000000L,
      s"tauMicro must be in (0, 1e6], got $tauMicro")
    val tok = tokens
      .select(col(idCol).cast("long").as("id"), col(tokenCol).as("token"))
      .where(col("token").isNotNull && length(col("token")) > 0)
      .select(col("id"), xxhash64(col("token")).as("token"))
      .distinct()
      .pinned
    val sizes = tok.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    // containment prefix: floor((1-tau)*sz) + 1 rarest tokens
    val prefixLen =
      expr(s"((${1000000L - tauMicro} * sz) div 1000000)") + 1L
    val canonical = Window.partitionBy(col("id"))
      .orderBy(col("tf"), col("token"))
    val prefixes = tok
      .join(freq, "token")
      .join(sizes, "id")
      .withColumn("pos", row_number().over(canonical))
      .where(col("pos") <= prefixLen)
      .select(col("id"), col("token"), col("sz"))
    // bare-pair dedup exchange, same rationale as jaccardJoinExact:
    // sa is recovered as size(__ta) after the verify join
    val candidates = prefixes
      .select(col("id").as("a_id"), col("token"))
      .join(tok.select(col("id").as("b_id"), col("token")), Seq("token"))
      .where(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    // same sorted-merge verify as jaccardJoinExact (see the note there)
    val docArrs = tok.groupBy(col("id"))
      .agg(sort_array(collect_list(col("token"))).as("toks"))
    candidates
      .join(docArrs.select(col("id").as("a_id"), col("toks").as("__ta")),
        Seq("a_id"))
      .join(docArrs.select(col("id").as("b_id"), col("toks").as("__tb")),
        Seq("b_id"))
      .withColumn("inter",
        graft.functions.sortedLongIntersectCount(col("__ta"), col("__tb")))
      .withColumn("sa", size(col("__ta")).cast("long"))
      .where(col("inter") * 1000000L >= lit(tauMicro) * col("sa"))
      .select(col("a_id"), col("b_id"), col("inter"), col("sa"),
        expr("(inter * 1000000 div sa)").as("cont_micro"))
  }

  /** Word-token view of a text column: distinct lowercase alphanumeric
    * runs per id — mirrored in SQL with DuckDB's string_split_regex. */
  def wordTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Fan.widen(df.select(col(idCol).as(idCol), col(textCol).as(textCol)))
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("token"))
      .where(length(col("token")) > 0)

  /** Word n-gram (shingle) view of a text column: each set element is n
    * consecutive whitespace-separated words joined by one space — the
    * q170 oracle mirrors it with array_to_string(t[s:s+n-1], ' ').
    * Order-sensitive, so template corpora sharing a small vocabulary
    * still get discriminative sets (plain word sets do not). */
  def shingleTokens(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1 && n <= 16, s"shingle n must be in [1, 16], got $n")
    // widen: tokenize+shingle is the scan stage's compute — see Fan
    Fan.widen(df.select(col(idCol).as(idCol), col(textCol).as(textCol)))
      .select(col(idCol).as("id"),
        split(trim(col(textCol)), "\\s+").as("t"))
      // guard: sequence(1, 0) counts BACKWARDS in Spark, so short texts
      // must take the empty-array branch, not a degenerate sequence
      .select(col("id"), explode(expr(
        s"CASE WHEN size(t) >= $n THEN transform(sequence(1, size(t) - ${n - 1})," +
          s" i -> concat_ws(' ', slice(t, i, $n))) ELSE array() END")).as("token"))
  }
}
