package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinSyntax

/** Corpus-preparation operators for training-data pipelines:
  * deterministic hash splits, benchmark-contamination scoring, and
  * sequence packing. All set-oriented (no driver loops), shuffle-minimal,
  * and engine-portable — each has an exact SQL twin, so every one is
  * DuckDB-oracle-checked rather than rows-only.
  */
object Corpus {

  /** Deterministic hash-bucket assignment: compare the md5 hex prefix of
    * (salt + key) against ascending per-split hex thresholds. Properties
    * that matter at 100 TB: a doc's split never changes as other docs
    * arrive (pure function of the key), the operator is map-only (zero
    * shuffles, no global sort, no sampling pass), and md5-hex +
    * lexicographic compare behave identically in any engine. `cuts` are
    * (exclusive-upper-hex-threshold, label) pairs; a 2-hex-digit prefix
    * gives 1/256 resolution ("cd" ≈ 80.1%, "e6" ≈ 89.8%). Rows past the
    * last cut get `rest`. For near-duplicate-aware splitting (no twin
    * straddles the boundary) see [[Dedup]] + the q50 leakage-safe split —
    * this operator is the plain i.i.d. baseline. */
  def hashSplit(key: Column, salt: String, cuts: Seq[(String, String)],
      rest: String): Column = {
    // md5 yields lowercase hex and the chained when() evaluates in list
    // order, so a misordered or uppercase cut list would silently
    // mis-assign every row — reject it at entry instead
    val thresholds = cuts.map(_._1)
    require(thresholds.forall(_.matches("[0-9a-f]+")),
      s"hashSplit cuts must be lowercase hex, got: ${thresholds.mkString(", ")}")
    require(thresholds == thresholds.sorted,
      s"hashSplit cuts must be ascending, got: ${thresholds.mkString(", ")}")
    val h = substring(md5(concat(lit(salt), key.cast("string"))), 1, 2)
    val chained = cuts.foldLeft(Option.empty[Column]) {
      case (None, (cut, label)) => Some(when(h < cut, label))
      case (Some(c), (cut, label)) => Some(c.when(h < cut, label))
    }
    chained.map(_.otherwise(rest)).getOrElse(lit(rest))
  }

  /** All word n-grams of a token-array column as space-joined strings
    * (possibly with repeats — wrap in `array_distinct` for the set).
    * The `size >= n` guard matters: an unguarded `sequence(1, size-n+1)`
    * silently becomes a DESCENDING sequence [1, 0] on short docs. */
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Benchmark-contamination scoring: for every probe doc, how many of
    * its distinct word n-grams appear in ANY benchmark doc. The standard
    * train-set decontamination check (n-gram overlap against eval sets).
    *
    * Scale shape: the benchmark gram set is tiny relative to the corpus
    * (eval suites vs 100 TB of training text) and is broadcast — the
    * probe side is exploded ONCE, left-joined against the broadcast
    * gram set, and aggregated in a single pass (count of grams + count
    * of membership hits); the only wide exchange is that per-doc count
    * aggregation on the doc id, which partitions evenly. Docs shorter
    * than n tokens have no grams and are absent from the output. */
  def contamination(docs: DataFrame, isBench: Column, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val ex = docs.select(col(idCol), toks.as("t"), isBench.as("is_bench"))
      .select(col(idCol), col("is_bench"),
        explode(array_distinct(wordNgrams(col("t"), n))).as("gram"))
    val bench = ex.filter(col("is_bench")).select("gram").distinct()
      .withColumn("hit", lit(1))
    ex.filter(!col("is_bench"))
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_contaminated"))
  }

  /** Scale path for [[contamination]] when the benchmark gram set is too
    * large to broadcast as a join build side (a full eval-suite union at
    * 100 TB corpus scale): the bench grams collapse into Spark's native
    * Bloom-filter sketch ([[graft.functions.bloomFilterAgg]] — partial
    * aggregation OR-merges per-partition filters, so only O(partitions)
    * sketch blobs cross the exchange and one blob reaches the driver, the
    * same collect-a-sketch shape as Spark's own runtime filtering). Probe
    * grams are prefiltered MAP-SIDE against the sketch literal; only the
    * tiny maybe-contaminated survivor set pays the exact gram join, so a
    * Bloom false positive can never inflate a count — output is
    * value-identical to [[contamination]]. The exact-verify join shuffles
    * the bench grams once; the probe side that reaches it is the survivor
    * set, not the corpus.
    *
    * Cost accounting vs [[contamination]] (the recompute-over-cache
    * stance this library takes everywhere): the probe side is shingled
    * twice (n_grams aggregate + prefilter branch) and the bench side
    * twice (sketch build + exact verify) — the win is that neither the
    * bench gram set nor the probe stream is ever a broadcast build side;
    * sketch construction is also an EAGER action (the one driver collect
    * a sketch literal requires), unlike the library's otherwise-lazy
    * ops. */
  def contaminationBloom(docs: DataFrame, isBench: Column, idCol: String,
      textCol: String, n: Int, expectedItems: Long = 1L << 20): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val ex = docs.select(col(idCol), toks.as("t"), isBench.as("is_bench"))
      .select(col(idCol), col("is_bench"),
        explode(array_distinct(wordNgrams(col("t"), n))).as("gram"))
    val probe = ex.filter(!col("is_bench")).select(col(idCol), col("gram"))
    val benchGrams = ex.filter(col("is_bench")).select("gram").distinct()
    val nGrams = probe.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val bloom = benchGrams
      .agg(graft.functions.bloomFilterAgg(xxhash64(col("gram")), expectedItems))
      .head.get(0)
    if (bloom == null) // empty benchmark set: nothing can be contaminated
      return nGrams.withColumn("n_contaminated", lit(0L))
        .select(col(idCol), col("n_grams"), col("n_contaminated"))
    val survivors = probe.filter(
      graft.functions.bloomMightContain(lit(bloom.asInstanceOf[Array[Byte]]),
        xxhash64(col("gram"))))
    val hits = survivors.join(benchGrams, Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    nGrams.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
  }

  /** Scale path for percentile-band filtering: two narrow passes instead
    * of a per-group sort — approx_percentile bounds per group (a tiny
    * aggregate, broadcast back), then a map-side filter. The cume_dist
    * ranking (q64) is exact but sorts each group on one reducer, which
    * caps parallelism at the group count; this variant keeps arbitrarily
    * large groups parallel at the cost of sketch-accuracy bounds.
    * Contract differences vs the rank path, beyond sketch error: banding
    * is VALUE-inclusive, so a group whose scores all tie keeps every row
    * ([lo,hi] collapses onto the tied value) where a cume_dist band may
    * keep none; and a NULL group value is a group like any other (the
    * bounds join is null-safe). */
  def quantileBand(docs: DataFrame, groupCol: String, scoreCol: Column,
      lo: Double, hi: Double, accuracy: Int = 10000): DataFrame = {
    val reserved = Set("__score", "__lo", "__hi", "__g")
    require(!docs.columns.exists(reserved),
      s"quantileBand reserves columns ${reserved.mkString(", ")}")
    val scored = docs.withColumn("__score", scoreCol)
    val bounds = scored.groupBy(col(groupCol).as("__g"))
      .agg(percentile_approx(col("__score"), lit(lo), lit(accuracy)).as("__lo"),
        percentile_approx(col("__score"), lit(hi), lit(accuracy)).as("__hi"))
    scored.join(broadcast(bounds), col(groupCol) <=> col("__g"))
      .filter(col("__score") >= col("__lo") && col("__score") <= col("__hi"))
      .drop("__g", "__lo", "__hi", "__score")
  }

  /** Cross-corpus boilerplate removal (the C4/CCNet rule): a line that
    * appears in at least `minDocs` DISTINCT documents is template chrome
    * (nav bars, cookie banners, footers), not content — drop every
    * occurrence. The complement of q60's within-doc line dedup: that op
    * keeps a line's first occurrence per doc; this one removes the line
    * from the corpus entirely once enough docs share it.
    *
    * Input is the exploded (doc, pos, line) form so the line unit is the
    * caller's choice (newline split, sentence split, fixed word windows);
    * output is the surviving rows, reassembly stays composable. Scale
    * shape: the frequency pass groups by a 64-bit line hash, so the wide
    * exchange carries (8-byte hash, id) pairs instead of full line text;
    * the boilerplate set that survives `>= minDocs` is tiny for
    * chrome-level thresholds (it's the TAIL of the line-frequency
    * distribution) and AQE broadcasts the anti join at runtime — the
    * broadcast is deliberately not forced (see in-code note on small
    * minDocs). An xxhash64 collision could
    * drop an innocent line alongside a boilerplate one — at 2^-64 per
    * pair that is noise against a 100 TB corpus' real near-dup rate. */
  def stripBoilerplate(docLines: DataFrame, idCol: String, lineCol: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would drop every line: $minDocs")
    require(!docLines.columns.contains("__lh"),
      "stripBoilerplate reserves column __lh")
    val hashed = docLines.withColumn("__lh", xxhash64(col(lineCol)))
    val boiler = hashed.groupBy(col("__lh"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__lh")
    // no forced broadcast: the >=minDocs tail is tiny for chrome-level
    // thresholds, but at minDocs near 2 it is "every line any two docs
    // share" — corpus-sized. AQE picks the broadcast at runtime when the
    // set measures small and falls back to a shuffle join when it isn't,
    // instead of a forced-broadcast OOM
    hashed.join(boiler, Seq("__lh"), "left_anti").drop("__lh")
  }

  /** Inverse of the exploded (doc, pos, line) form the line-level ops
    * consume: reassemble each doc's surviving lines in original order.
    * The ONE implementation of the sort-and-join idiom shared by
    * [[graft.pipelines.CorpusPipeline]] and the q60/q69 queries. */
  def reassembleLines(docLines: DataFrame, idCol: String, posCol: String,
      lineCol: String, outCol: String): DataFrame =
    docLines.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(posCol), col(lineCol)))),
        x => x.getField(lineCol)), "\n").as(outCol))

  /** Deterministic epoch-mixture resampling: emit each doc `n` times
    * where `n = floor(w) + Bernoulli(frac(w))` and `w` is the doc's
    * source weight — the standard way to hit a target domain mixture
    * (up-weight books/code, down-weight raw web) when materializing a
    * training epoch. The Bernoulli draw is a salted md5 of the doc id,
    * so the realized corpus is a pure function of (weights, salt):
    * reproducible across runs and engines, and a doc's copy count never
    * changes as other docs arrive. Expected copy count is exactly w
    * (up to the 1/65536 draw quantization).
    *
    * `weights` is a (source → weight) dimension frame, broadcast; the
    * explode is map-side, so beyond the broadcast hash join the operator
    * is shuffle-free. A source with no weight row RAISES (per-row
    * `raise_error` woven into the weight) — an unlisted source is a
    * mixture-spec bug, and either silent choice (dropping the source or
    * defaulting it to 1.0) ships a wrong mixture. Returns the input plus
    * (n_copies, epoch_copy ∈ 1..n_copies). */
  def mixtureResample(docs: DataFrame, weights: DataFrame, sourceCol: String,
      weightCol: String, idCol: String, salt: String): DataFrame = {
    val reserved = Set("n_copies", "epoch_copy", "__draw")
    require(!docs.columns.exists(reserved),
      s"mixtureResample reserves columns ${reserved.mkString(", ")}")
    // The weights frame is a user-supplied mixture SPEC, so validate it
    // rather than trust it: (a) keep only (source, weight) — any extra
    // column would silently leak into the output schema through the
    // join; (b) a duplicated source row would multiply that source's
    // docs before the copy-count logic runs, which is a wrong mixture,
    // not a recoverable one — raise per-row via a window count woven
    // into the weight value (lazy, no driver action; the frame is
    // dimension-sized so the window exchange is negligible)
    val dupCount = count(lit(1)).over(Window.partitionBy(col(sourceCol)))
    val checkedWeights = weights
      .select(col(sourceCol), col(weightCol).cast("double").as(weightCol))
      .withColumn(weightCol, when(dupCount > 1, raise_error(concat(
        lit("mixtureResample: duplicate weight rows for source "),
        col(sourceCol))).cast("double")).otherwise(col(weightCol)))
    val w = col(weightCol)
    // engine-portable fractional draw: first 4 md5 hex digits as an
    // integer in [0, 65536), compared against floor(frac(w)·65536) —
    // floor on BOTH factors because double→int CAST truncates in Spark
    // but rounds in DuckDB
    val draw = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
      1, 4), 16, 10).cast("long")
    // LEFT join + per-row raise: an unlisted source is a mixture-spec
    // bug (typo'd name, new crawl source added after the spec), and an
    // inner join would silently drop that source's whole split
    val loudW = when(w.isNull, raise_error(concat(
      lit("mixtureResample: no weight for source "), col(sourceCol)))
      .cast("double")).otherwise(w)
    docs.join(broadcast(checkedWeights), Seq(sourceCol), "left")
      .withColumn("n_copies",
        floor(loudW).cast("long") +
          when(draw < floor((loudW - floor(loudW)) * 65536.0).cast("long"), 1L)
            .otherwise(0L))
      .drop(weightCol)
      .filter(col("n_copies") > 0)
      .withColumn("epoch_copy", explode(sequence(lit(1L), col("n_copies"))))
  }

  /** Weighted sampling WITHOUT replacement, k docs per group — the
    * A-RES scheme (Efraimidis–Spirakis): each doc draws a deterministic
    * uniform u from a salted md5 of its id and competes on the key
    * u^(1/w), so a doc's inclusion probability is proportional to its
    * weight but no doc can be picked twice (the failure mode of naive
    * weighted-with-replacement sampling on a corpus: the best doc
    * repeated k times). The standard "pick the k best exemplars per
    * domain, weighted by quality" corpus op.
    *
    * Scale shape: the per-group competition is the bounded-heap
    * [[graft.functions.topKByScore]] aggregate — partial aggregation
    * collapses each partition to k rows per group map-side, so the
    * exchange carries O(groups × k), never the corpus; the winners
    * semi-join back for their rows. Groups of any size stay parallel
    * (no per-group sort window). The (salt, id) draw makes the sample a
    * pure function of the inputs — reproducible, stable under
    * reordering.
    *
    * A doc with non-positive weight never wins over a positive one
    * (its key is forced to -1, below every u^(1/w) in [0, 1]); equal
    * keys tie-break by id via the heap's insertion discipline. */
  def weightedSample(docs: DataFrame, groupCol: String, idCol: String,
      weightCol: Column, k: Int, salt: String): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    // same contract as the LSH bucket kernels: the heap aggregate evals
    // raw longs, so a non-integral id would silently empty the sample
    Guards.requireIntegralId(docs, idCol, "weightedSample")
    // u in (0, 1): (draw + 0.5) / 65536 from the first 4 md5 hex digits
    val u = (conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
      1, 4), 16, 10).cast("double") + 0.5) / 65536.0
    val key = when(weightCol > 0, pow(u, lit(1.0) / weightCol)).otherwise(-1.0)
    val winners = docs
      .groupBy(col(groupCol))
      // id cast to long up front: the heap kernel evals raw longs
      .agg(graft.functions.topKByScore(key, col(idCol).cast("long"), k).as("w"))
      .select(explode(col("w.id")).as(idCol))
    docs.join(winners, Seq(idCol), "left_semi")
  }

  /** Cap each source's contribution by TOKEN budget, not doc count (the
    * unit mixtures are actually specified in): docs compete per source
    * in salted-md5 order, and a doc is kept while the running token
    * total BEFORE it is under the budget — so the doc that crosses the
    * boundary is kept (bounded overflow, the same contract as
    * [[packBins]]) and at least one doc survives per source. One
    * parallel per-source window, same scale shape as the q65 doc-count
    * cap. */
  def tokenBudgetCap(docs: DataFrame, sourceCol: String, idCol: String,
      tokenCol: Column, budget: Long, salt: String): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(!docs.columns.contains("__cum"),
      "tokenBudgetCap reserves column __cum")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("__cum", coalesce(sum(tokenCol).over(w), lit(0L)))
      .filter(col("__cum") < budget)
      .drop("__cum")
  }

  /** Sequence packing: assign docs to fixed token-budget bins in
    * `orderCol` order WITHIN each `groupCol` shard —
    * bin = running-tokens-before-this-doc div budget, so consecutive
    * docs fill a bin to the budget (with bounded overflow: the doc that
    * crosses the boundary stays in the earlier bin, the classic
    * approximate-packing contract). Per-shard windows are the scale
    * story: each shard packs independently in parallel — there is no
    * global sort, and at 100 TB `groupCol` is the writer shard. Returns
    * the input plus (n_tok, bin). */
  def packBins(docs: DataFrame, groupCol: String, orderCol: String,
      tokenCol: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("n_tok", tokenCol)
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budget"))
      .drop("cum_before")
  }

  /** Bigram-language-model quality scoring — the CCNet recipe: train
    * unigram/bigram counts on a REFERENCE slice (known-good text, e.g.
    * the target language's high-quality band), then score EVERY document
    * by the average negative log-probability of its token bigrams under
    * that model. High score = unlike the reference = low quality or
    * wrong language; thresholding/banding the score is the standard
    * perplexity filter for web corpora.
    *
    * Model: P(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V) — Laplace
    * smoothing with V = reference vocabulary size and c1 the CONTEXT
    * count (bigrams starting with w1, i.e. sum of c2 over w2; an unseen
    * context backs off to 1/V). Per-bigram −ln P is rounded to integer
    * micro-nats BEFORE the per-doc aggregation, so the per-doc sum is
    * exact integer math — float summation order (which differs across
    * engines and across partitionings of the SAME engine) can never
    * move the result; one final double division by the bigram count is
    * IEEE-correctly-rounded and deterministic. That is what keeps this
    * op DuckDB-oracle-exact rather than rows-only. Docs with fewer than
    * two tokens have no bigrams to judge and emit no row.
    *
    * Scale shape: the count tables are CORPUS-DERIVED — a Zipf-tailed
    * bigram vocabulary reaches billions of rows at 100 TB, so neither
    * is broadcast (the q61/stripBoilerplate discipline); both joins are
    * shuffle equi-joins AQE downgrades to broadcast when the reference
    * measures small. V is one row and rides a cross join. The doc side
    * explodes to one row per bigram — the q61 token-explode fan-out
    * class, map-side before its join. The model build scans the
    * REFERENCE slice more than once (c2, its w1 margin, V) because
    * Spark does not share uncached subplans; the reference is a curated
    * slice — orders of magnitude smaller than the corpus being scored,
    * which is scanned exactly once — and a production deployment
    * materializes the counts table once and reuses it across scoring
    * runs (the bench query is standalone by design, the CC-family
    * precedent). */
  def bigramLmScore(docs: DataFrame, refDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def toks(df: DataFrame) = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col("*"), split(lower(trim(col(textCol))), "\\s+").as("__toks"))
    // explode positions 1..n-1; the size guard matters — an unguarded
    // sequence(1, 0) is DESCENDING in Spark (DuckDB's generate_series
    // is just empty, so the guard also keeps the twins identical)
    def bigrams(df: DataFrame, keep: Column*) = toks(df)
      .filter(size(col("__toks")) >= 2)
      .select(keep :+ col("__toks") :+
        explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"): _*)
      .select(keep :+ element_at(col("__toks"), col("__i")).as("w1") :+
        element_at(col("__toks"), col("__i") + 1).as("w2"): _*)
    val v = toks(refDocs).select(explode(col("__toks")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val c2 = bigrams(refDocs).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    bigrams(docs, col(idCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(v) // one row — auto-broadcast
      // V = 0 (empty/fully-filtered reference) would make the smoothed
      // probability 1/0 = +Inf and every score collapse to garbage with
      // no signal the model was empty — raise instead, woven into the
      // scoring pass (zero extra jobs; the check is per-row but V is a
      // broadcast scalar, so it costs one comparison)
      .withColumn("__v_ok", when(col("v") > 0, col("v")).otherwise(raise_error(
        lit("bigramLmScore: the reference slice has no tokens — " +
          "an empty model scores nothing; check the reference filter"))))
      .withColumn("__m", floor(-log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("__v_ok")).cast("double"))
        * lit(1000000.0) + lit(0.5)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(sum(col("__m")).cast("double") / count(lit(1)) + lit(0.5))
          / lit(1000000.0)).as("avg_nll"))
  }

  /** Kneser–Ney smoothed bigram LM scoring (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1999) — the standard n-gram
    * smoothing next to [[bigramLmScore]]'s add-one baseline: the
    * discount D = 3/4 is moved from seen bigrams onto a CONTINUATION
    * distribution (how many distinct contexts a word follows), which is
    * what makes "francisco" unlikely outside "san francisco" even
    * though it is frequent.
    *
    * Exactness discipline (q88 taken further): D = 3/4 is exactly
    * representable, so the smoothed probability is a RATIO OF INTEGERS
    * assembled from exact counts —
    *   seen w1:  P = [max(4·c2−3, 0)·(B+V) + 3·n1fwd(w1)·(cont(w2)+1)]
    *                 / [4·c1·(B+V)]
    *   unseen:   P = (cont(w2)+1) / (B+V)
    * with c2/c1 the bigram/context counts, n1fwd(w1) the distinct
    * continuations of w1, cont(w2) the distinct predecessors of w2
    * (add-one smoothed so unseen words keep mass), B the distinct
    * bigram count and V the vocabulary. Each per-bigram −ln(num/den)
    * is rounded once to integer micro-nats, so the DuckDB twin is
    * hash-exact. Integer products stay under 2^53 up to ~3·10^7
    * reference bigrams; beyond that widen to DECIMAL (the q131 trade).
    *
    * Scale shape identical to [[bigramLmScore]]: count tables are
    * corpus-derived and never broadcast-forced, the scored side
    * explodes map-side to one row per bigram, V/B ride a one-row cross
    * join, and the model-build scans only the curated reference. */
  def knBigramScore(docs: DataFrame, refDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def toks(df: DataFrame) = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col("*"), split(lower(trim(col(textCol))), "\\s+").as("__toks"))
    def bigrams(df: DataFrame, keep: Column*) = toks(df)
      .filter(size(col("__toks")) >= 2)
      .select(keep :+ col("__toks") :+
        explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"): _*)
      .select(keep :+ element_at(col("__toks"), col("__i")).as("w1") :+
        element_at(col("__toks"), col("__i") + 1).as("w2"): _*)
    val c2 = bigrams(refDocs).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .pinned // four consumers: margins ×3 + the scoring join
    val c1 = c2.groupBy("w1")
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1fwd"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("cont"))
    val totals = c2.agg(count(lit(1)).as("bb")).crossJoin(
      toks(refDocs).select(explode(col("__toks")).as("w"))
        .agg(count_distinct(col("w")).as("v")))
    bigrams(docs, col(idCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(totals) // one row — auto-broadcast
      .withColumn("__bv", when(col("bb") + col("v") > 0, col("bb") + col("v"))
        .otherwise(raise_error(lit("knBigramScore: empty reference model — " +
          "check the reference filter"))))
      .withColumn("__contp", coalesce(col("cont"), lit(0L)) + 1L)
      .withColumn("__num", when(col("c1").isNotNull,
          greatest(lit(4L) * coalesce(col("c2"), lit(0L)) - 3L, lit(0L)) * col("__bv")
            + lit(3L) * col("n1fwd") * col("__contp"))
        .otherwise(col("__contp")))
      .withColumn("__den", when(col("c1").isNotNull,
        lit(4L) * col("c1") * col("__bv")).otherwise(col("__bv")))
      .withColumn("__m", floor(-log(
        col("__num").cast("double") / col("__den").cast("double"))
        * lit(1000000.0) + lit(0.5)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(sum(col("__m")).cast("double") / count(lit(1)) + lit(0.5))
          / lit(1000000.0)).as("avg_nll"))
  }

  /** Deterministic stratified sample: Hamilton (largest-remainder)
    * proportional allocation of `total` slots across strata (via
    * [[allocateBudget]] — Σ kept = total EXACTLY, floats can't do
    * that), then each stratum keeps its allocation's first keys in
    * salted-md5 order (the q57/q65 competition-order idiom: uniform,
    * reproducible anywhere, no sampling pass). Returns the kept rows'
    * (stratum, key).
    *
    * Scale shape: stratum sizes are one partial agg; the allocation
    * frame is stratum-sized and broadcast-joins back; the per-stratum
    * rank is a window over (md5, key) — each stratum sorts its own
    * keys, nothing global. */
  def stratifiedSample(df: DataFrame, stratumCol: Column, keyCol: Column,
      total: Long): DataFrame = {
    require(total >= 0, s"stratifiedSample total must be >= 0, got $total")
    val rows = df.select(stratumCol.as("stratum"), keyCol.as("key")).distinct()
    val alloc = allocateBudget(rows, col("stratum"), lit(1L), total)
      .select(col("key").as("stratum"), col("alloc"))
    rows
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(md5(concat(lit("strat:"), col("key").cast("string"))),
            col("key"))))
      .join(alloc, Seq("stratum"))
      .where(col("__rn") <= col("alloc"))
      .select(col("stratum"), col("key"))
  }

  /** PMI collocation extraction: the corpus's most-associated word
    * pairs by pointwise mutual information, PMI(w1,w2) =
    * ln(p(w1,w2) / (p(w1)·p(w2))) over bigram occurrences — the
    * classic multi-word-expression detector (and a tokenizer-vocab
    * candidate list: high-PMI pairs are what BPE merges first). A
    * minimum bigram support keeps the rare-pair PMI explosion out
    * (PMI is maximal for hapax pairs — unfiltered it ranks typos).
    *
    * Exactness: the PMI is assembled in one fixed-order expression of
    * integer-count logs and rounded to micro-nats, and the top-k is
    * taken under the total order (pmi desc, w1, w2) — hash-stable in
    * any engine, so the whole ranking is DuckDB-oracle-checked.
    * Scale shape: token explode → two vocabulary-keyed partial-agg
    * groupBys; the margins join back on w1/w2 (vocabulary-sized, never
    * broadcast-forced — AQE decides); totals ride a one-row cross
    * join; the top-k is a bounded TakeOrdered. */
  def collocations(docs: DataFrame, textCol: String, minSupport: Long,
      topK: Int): DataFrame = {
    require(minSupport >= 1, s"collocations needs minSupport >= 1, got $minSupport")
    require(topK >= 1, s"collocations needs topK >= 1, got $topK")
    val toks = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(split(lower(trim(col(textCol))), "\\s+").as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val bi = toks
      .filter(size(col("__toks")) >= 2)
      .select(col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"))
      .select(element_at(col("__toks"), col("__i")).as("w1"),
        element_at(col("__toks"), col("__i") + 1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minSupport)
    val totals = uni.agg(sum(col("c1")).as("n1")).crossJoin(
      toks.select((size(col("__toks")) - 1).as("nb"))
        .filter(col("nb") > 0).agg(sum(col("nb")).as("nbig")))
    bi
      .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("c2"),
        (floor((log(col("c2")) - log(col("nbig")) - log(col("c1a"))
          + log(col("n1")) - log(col("c1b")) + log(col("n1")))
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Sequential quality-filter funnel (the Gopher/C4-style rule
    * cascade): each stage is a predicate ANDed onto the previous ones,
    * and the output is the per-stage survivor count — the curator's
    * first question ("which rule is eating my corpus?") answered in ONE
    * map-only pass. Plan shape: the cumulative predicates are plain
    * boolean columns, the counts come off a single partial aggregate
    * (map-side combine, one exchange of one row), and the unpivot is a
    * driver-free `stack` — nothing here scales with anything but the
    * scan itself. Returns (stage_idx 1-based, stage, n_pass). */
  def filterFunnel(docs: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty && stages.map(_._1).distinct.size == stages.size,
      s"filterFunnel stages must be non-empty and uniquely named, got ${stages.map(_._1)}")
    require(stages.forall(_._1.matches("[A-Za-z0-9_ .-]+")),
      s"filterFunnel stage names must be plain identifiers, got ${stages.map(_._1)}")
    val cumulative = stages.scanLeft(lit(true)) {
      case (acc, (_, p)) => acc && p
    }.tail
    val sums = cumulative.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"n$i")
    }
    val one = docs.agg(sums.head, sums.tail: _*)
    val stack = stages.zipWithIndex
      .map { case ((name, _), i) => s"${i + 1}, '$name', n$i" }.mkString(", ")
    one.select(expr(
      s"stack(${stages.size}, $stack) AS (stage_idx, stage, n_pass)"))
  }

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): score each raw-corpus doc by the average
    * per-feature log-likelihood ratio log(p̂_target / p̂_raw) under two
    * add-1-smoothed word-bigram bag models — one fit on a curated TARGET
    * slice, one on the raw corpus itself. High scores mark docs whose
    * n-gram profile looks like the target domain; resampling the corpus
    * proportionally to exp(weight) is the paper's selection rule
    * (combine with [[weightedSample]]).
    *
    * Exact mode (`hashBuckets = None`): features are the literal bigram
    * strings — the q88 tokenization, so the model vocabulary V is the
    * observed gram union and the whole score is DuckDB-oracle-exact
    * (per-gram micro-nat rounding BEFORE the per-doc sum, the q88
    * discipline that makes a float score hash-stable under any
    * partitioning). Hashed mode (`hashBuckets = Some(b)`): features are
    * the fused rolling-hash kernel's 64-bit gram hashes folded into b
    * buckets — the paper's fixed-dimension scale path; the model frame
    * is then at most b rows regardless of corpus vocabulary.
    *
    * Scale shape: the corpus is scanned twice (once to fit p̂_raw, once
    * to score — a deployment persists the model frame and scores
    * incrementally); the target slice is curated-small by contract. The
    * scoring join is feature-keyed (vocabulary- or bucket-sized model),
    * totals ride a one-row broadcast cross join, and docs with fewer
    * than two tokens are dropped (no bigram evidence — same contract as
    * [[bigramLmScore]]). */
  def dsirWeights(docs: DataFrame, targetDocs: DataFrame, idCol: String,
      textCol: String, hashBuckets: Option[Int] = None): DataFrame = {
    hashBuckets.foreach(b => require(b > 1, s"dsirWeights needs > 1 hash bucket, got $b"))
    def toks(df: DataFrame) = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col("*"), split(lower(trim(col(textCol))), "\\s+").as("__toks"))
    // one row per bigram feature; `keep` carries the doc id on the scoring side
    def grams(df: DataFrame, keep: Column*): DataFrame = hashBuckets match {
      case Some(b) => df
        .select(keep :+ explode(
          graft.functions.wordNgramHashes(col(textCol), 2)).as("__h"): _*)
        .select(keep :+ pmod(col("__h"), lit(b.toLong)).cast("string").as("g"): _*)
      case None => toks(df)
        .filter(size(col("__toks")) >= 2)
        .select(keep :+ col("__toks") :+
          explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"): _*)
        .select(keep :+ concat_ws(" ",
          element_at(col("__toks"), col("__i")),
          element_at(col("__toks"), col("__i") + 1)).as("g"): _*)
    }
    val ct = grams(targetDocs).groupBy("g").agg(count(lit(1)).as("ct"))
    val cr = grams(docs).groupBy("g").agg(count(lit(1)).as("cr"))
    val model = ct.join(cr, Seq("g"), "full")
      .select(col("g"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = model.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    // an empty target (or raw) slice would smooth every ratio into the
    // same constant and the "weights" would be pure noise — raise, woven
    // into the broadcast totals row (zero extra jobs)
    val guarded = totals.withColumn("nt",
      when(col("nt") > 0 && col("nr") > 0, col("nt")).otherwise(raise_error(
        lit("dsirWeights: target or raw slice has no bigram features — " +
          "an empty model cannot rank; check the slice filters"))))
    // per-gram signed micro-nat log-ratio, rounded BEFORE the doc sum
    val m = floor((
      log(col("ct") + 1) - log((col("nt") + col("v")).cast("double")) -
        log(col("cr") + 1) + log((col("nr") + col("v")).cast("double")))
      * lit(1000000.0) + lit(0.5)).cast("long")
    // every doc gram exists in the model by construction (cr is fit on
    // these same docs) — inner join, no coalesce path
    grams(docs, col(idCol))
      .join(model, Seq("g"))
      .crossJoin(guarded)
      .withColumn("__m", m)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        (floor(sum(col("__m")).cast("double") / count(lit(1)) + lit(0.5))
          / lit(1000000.0)).as("avg_logw"))
  }

  /** Exact cross-source overlap matrix: for every source pair (a < b),
    * the count of shared distinct word n-grams and the exact Jaccard
    * similarity of the two sources' gram sets — the data-mixing
    * diagnostic ("how much of B is already inside A") behind mixture
    * weights, per-source dedup ordering, and drop decisions. Every
    * pair appears, including zero-overlap ones.
    *
    * Scale shape: ONE wide exchange — the corpus scan emits each
    * gram's 64-bit rolling hash (the fused
    * [[graft.functions.wordNgramHashes]] kernel: zero gram-string
    * allocation — profiled 4.7 s → 0.3 s on the sf0.1 gram stage; as
    * in q74, the 8-byte hash IS the meeting key and collisions are
    * negligible against vocabulary sizes), and groupBy(hash) collects
    * each gram's source SET (deduped map-side; buffer bounded by S,
    * which is dimension-cardinality by contract — the q78 exact-mode
    * contract). Sizes and intersections both derive from the DISTINCT
    * source sets weighted by their gram counts — under Zipf sharing,
    * far fewer set rows than grams ever reach the pair comprehension —
    * so there is no distinct pass and no gram self-join, and the S×S
    * completion grid rides broadcasts with O(S²) output. When even the
    * gram frame is too hot, [[sourceOverlapSketch]] estimates the same
    * matrix with a partial-agg min that never groups by gram at all. */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"sourceOverlap needs n > 0, got $n")
    val setCounts = docs.select(col(sourceCol).as("source"),
        explode(graft.functions.wordNgramHashes(col(textCol), n)).as("g"))
      .groupBy(col("g"))
      .agg(array_sort(collect_set(col("source"))).as("ss"))
      .groupBy(col("ss")).agg(count(lit(1)).as("w"))
    val sizes = setCounts.select(col("w"), explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(sum(col("w")).as("n"))
    val inter = setCounts
      .select(col("w"), explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          b => struct(a.as("source_a"), b.as("source_b")))))).as("p"))
      .groupBy(col("p.source_a").as("source_a"),
        col("p.source_b").as("source_b"))
      .agg(sum(col("w")).as("n_shared"))
    val pairs = broadcast(
      sizes.select(col("source").as("source_a"), col("n").as("n_a")))
      .join(broadcast(
        sizes.select(col("source").as("source_b"), col("n").as("n_b"))),
        col("source_a") < col("source_b"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_a"), col("n_b"),
        (floor(coalesce(col("n_shared"), lit(0L)).cast("double")
          / (col("n_a") + col("n_b") - coalesce(col("n_shared"), lit(0L)))
            .cast("double") * lit(1000000.0) + lit(0.5)) / 1000000.0)
          .as("jaccard"))
  }

  /** Per-source dataset card — the summary table a curator ships next
    * to a training corpus (the Datasheets-for-Datasets habit): doc and
    * token volumes, exact-duplicate density (distinct text hashes vs
    * docs), language share, mean quality, and the token-length range,
    * one row per source. Every column is exact-integer or
    * integer-rounded (the q22 quality score is already micro-floored,
    * so its sum is exact), which is what makes a float-weighted summary
    * hash-portable across engines.
    *
    * Scale shape: one corpus scan computing per-doc scalars map-only,
    * then a single partial-aggregated groupBy(source); the distinct
    * text-hash count is Spark's standard two-phase expansion — no
    * driver state, no broadcast. */
  def corpusCard(docs: DataFrame, sourceCol: String, textCol: String,
      langCol: String): DataFrame =
    docs.select(col(sourceCol).as("source"),
        col(langCol).as("lang"),
        graft.functions.tokenCount(col(textCol)).as("n_tok"),
        length(col(textCol)).as("nc"),
        md5(col(textCol)).as("h"),
        round(graft.functions.qualityScore(col(textCol)) * 1e6)
          .cast("long").as("q_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(col("nc")).cast("long").as("n_chars"),
        countDistinct(col("h")).as("n_unique_texts"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        round(sum(col("q_micro")).cast("double") / count(lit(1)))
          .cast("long").as("mean_quality_micro"),
        min(col("n_tok")).cast("long").as("min_tokens"),
        max(col("n_tok")).cast("long").as("max_tokens"))

  /** Per-document cross-corpus duplicate-n-gram fraction — the
    * Gopher/RefinedWeb quality signal "how much of this doc is text
    * that also appears elsewhere": for each doc, the fraction of its
    * n-gram OCCURRENCES whose gram value occurs in at least `minDocs`
    * DISTINCT documents. Orthogonal to within-doc repetition (q63
    * counts a doc's self-repeats; a gram repeated only inside one doc
    * has doc-frequency 1 and does not count here) and to pairwise
    * near-dup detection (this is a per-doc scalar, not a pair list) —
    * it's the boilerplate-density column a quality-band filter consumes.
    *
    * Scale shape: grams ride the fused rolling-hash kernel
    * ([[graft.functions.wordNgramHashes]] — no gram strings ever
    * materialize), the (doc, gram) occurrence rollup and the
    * doc-frequency rollup are both partial-aggregated hash exchanges,
    * the DF frame joins back by gram hash (never broadcast, never
    * collected), and the final doc rollup is one bounded exchange.
    * Every doc comes back (gram-less short docs report 0/0/0.0).
    *
    * Oracle-portable because counting distinct gram hashes ==
    * counting distinct grams (the q98 argument: xxhash collisions at
    * corpus scale are negligible and the driver gate would catch one). */
  def dupGramStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2,
      s"dupGramStats needs n > 0 and minDocs >= 2, got n=$n minDocs=$minDocs")
    val perDoc = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.wordNgramHashes(col(textCol), n)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
    val docFreq = perDoc.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
    val agg = perDoc.join(docFreq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("df") >= minDocs, col("c")).otherwise(0L)).as("n_dup"))
    docs.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(floor(col("n_dup").cast("double")
            / col("n_grams").cast("double") * lit(1000000.0) + lit(0.5))
            / 1000000.0)
          .as("dup_frac"))
  }

  /** MinHash estimate of [[sourceOverlap]]'s Jaccard matrix for
    * corpora where the exact distinct-gram frame is too hot: each
    * source gets a `perms`-component signature sig[i] = min over the
    * source's grams of hash_i(gram), and a pair's estimated Jaccard is
    * the fraction of agreeing components. min() absorbs duplicates, so
    * there is NO distinct and NO gram self-join — one corpus scan,
    * a partial-aggregated min per (source, i) (only S × perms rows
    * cross the exchange), and an O(S² × perms) signature meeting.
    * Deterministic: hash_i is xxhash64 of the component index and the
    * gram's rolling hash (same fused kernel as [[sourceOverlap]]). */
  def sourceOverlapSketch(docs: DataFrame, sourceCol: String,
      textCol: String, n: Int, perms: Int = 64): DataFrame = {
    require(n > 0 && perms > 0,
      s"sourceOverlapSketch needs n > 0 and perms > 0, got n=$n perms=$perms")
    val sigs = docs.select(col(sourceCol).as("source"),
        explode(graft.functions.wordNgramHashes(col(textCol), n)).as("g"))
      .select(col("source"), col("g"),
        explode(sequence(lit(0), lit(perms - 1))).as("i"))
      .groupBy(col("source"), col("i"))
      .agg(min(xxhash64(col("i"), col("g"))).as("m"))
    sigs.select(col("source").as("source_a"), col("i"), col("m").as("m_a"))
      .join(sigs.select(col("source").as("source_b"), col("i"),
        col("m").as("m_b")), Seq("i"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg((sum(when(col("m_a") === col("m_b"), 1L).otherwise(0L))
        .cast("double") / perms).as("jaccard_est"))
  }

  /** Cross-doc duplicated-SPAN detection — the positional sharpening of
    * [[dupGramStats]] (Lee et al. 2022's exact-substring signal without
    * the suffix array): an n-gram occurrence is duplicated when its
    * gram appears in ≥ `minDocs` distinct docs; a SPAN is a maximal run
    * of consecutive duplicated gram positions (gaps-and-islands:
    * pos − row_number over duplicated positions is constant within a
    * run). A long max_run is verbatim boilerplate to cut; a high n_dup
    * with short runs is phrase-level reuse to keep.
    *
    * Returns (doc_id, n_grams, n_dup, n_spans, max_run) for EVERY input
    * doc (zeros when gram-less or clean). Scale shape: one corpus-gram
    * exchange to per-doc gram counts, a gram-keyed doc-frequency join
    * (ids+hashes only — text never travels), and a per-doc sort for the
    * islands window. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n > 0 && minDocs >= 2,
      s"dupSpans needs n > 0 and minDocs >= 2, got n=$n minDocs=$minDocs")
    val occ = docs.select(col(idCol).as("doc_id"),
      posexplode(graft.functions.wordNgramHashes(col(textCol), n))
        .as(Seq("pos", "g")))
    val docFreq = occ.groupBy(col("g"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    val marked = occ.join(docFreq.filter(col("df") >= minDocs), Seq("g"),
        "left_semi")
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos"))
    val runs = marked
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(sum(col("run")).as("n_dup"), count(lit(1)).as("n_spans"),
        max(col("run")).as("max_run"))
    val totals = occ.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    docs.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** Largest-remainder (Hamilton) budget allocation: split an integer
    * `total` across keys proportionally to an integer weight, with the
    * floor quotas topped up by remainder rank so Σalloc = total EXACTLY
    * — the "sample exactly N docs across strata" allocator behind any
    * fixed-token-budget mixture (floats + rounding either overshoot
    * the budget or leak it; this cannot). All-integer: quota = w·total,
    * base = quota div W, remainders ranked (quota mod W desc, key).
    * Keys are stratum-cardinality (dimension scale) — the one window
    * sorts strata, not rows. */
  def allocateBudget(df: DataFrame, keyCol: Column, weightCol: Column,
      total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    val w = df.select(keyCol.as("key"), weightCol.cast("long").as("w"))
      .groupBy(col("key")).agg(sum(col("w")).as("w"))
    val tot = w.agg(sum(col("w")).as("bigw"))
    val based = w.crossJoin(tot)
      .withColumn("__ok", when(col("bigw") > 0, col("bigw"))
        .otherwise(raise_error(lit("allocateBudget needs positive total weight"))))
      .withColumn("base",
        expr(s"CAST(CAST(w AS DECIMAL(38,0)) * $total DIV __ok AS BIGINT)"))
      .withColumn("rem",
        expr(s"CAST(CAST(w AS DECIMAL(38,0)) * $total % __ok AS BIGINT)"))
    val leftover = based.agg((lit(total) - sum(col("base"))).as("left"))
    based
      // BOUNDED single-partition window: one row per allocation KEY
      // (source/dimension cardinality — tens to thousands), never per
      // corpus row; Hamilton's method needs the global remainder order
      .withColumn("rrank", row_number().over(
        Window.orderBy(col("rem").desc, col("key"))).cast("long"))
      .crossJoin(leftover)
      .select(col("key"), col("w"), col("base"),
        (col("base") + when(col("rrank") <= col("left"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Per-source distribution drift: KL(source ‖ corpus) over the
    * whitespace-token unigram distribution — the mixture-health gauge
    * behind reweighting decisions (a source whose KL spikes after a
    * crawl refresh changed its content profile, whatever its row count
    * says). No smoothing needed: a source's support is a subset of the
    * corpus's by construction.
    *
    * Oracle-exact discipline (q88/q118 applied to divergence): the log
    * ratio ln(c_st·c / (c_s·c_t)) is computed on EXACT integer counts,
    * rounded once per term to nano-nats, then Σ c_st·lnratio_nano is
    * exact integer arithmetic and one final integer DIV by c_s rounds
    * the per-source divergence. Integer products stay under 2⁵³ up to
    * ~10⁸ corpus tokens per side; beyond that, pre-aggregate counts to
    * DECIMAL before the ratio (same trade as q131's moments).
    *
    * Scale shape: one token exchange to (source, token) counts, a
    * token-keyed join against corpus counts (token text never leaves
    * the histogram), dimension-cardinality output. */
  def sourceDivergence(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
        explode(split(lower(col(textCol)), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
    val st = toks.groupBy(col("source"), col("t")).agg(count(lit(1)).as("c_st"))
    val s = st.groupBy(col("source")).agg(sum(col("c_st")).as("c_s"))
    val ct = st.groupBy(col("t")).agg(sum(col("c_st")).as("c_t"))
    val c = st.agg(sum(col("c_st")).as("c"))
    st.join(ct, Seq("t")).join(broadcast(s), Seq("source")).crossJoin(c)
      .withColumn("lnr_nano",
        floor(log(col("c_st").cast("double") * col("c").cast("double")
          / (col("c_s").cast("double") * col("c_t").cast("double")))
          * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("source"))
      // final division in doubles, NOT integer DIV: the rounded sum can
      // land epsilon-negative and Spark's div truncates toward zero
      // while DuckDB's // floors — doubles built from the same exact
      // integers divide identically in both engines
      .agg(max(col("c_s")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        floor(sum(col("c_st") * col("lnr_nano")).cast("double")
          / max(col("c_s")).cast("double") + lit(0.5)).cast("long")
          .as("kl_nano"))
  }
}
