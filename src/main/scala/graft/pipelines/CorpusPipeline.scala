package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._
import graft.ops.{Corpus, Dedup}

/** End-to-end training-corpus preparation — the composition every
  * 100 TB data pipeline runs, built entirely from this library's
  * operators so each stage keeps its individually-tested semantics and
  * scale shape:
  *
  *  0. Unicode NFC canonicalization — precedes every hash-based stage
  *     (boilerplate frequency, exact dedup, LSH, decontamination) so
  *     composed vs decomposed spellings hash identically; NFC preserves
  *     newlines, so the line structure below is intact
  *  1. boilerplate (opt-in): newline-split lines appearing in >=
  *     `boilerplateMinDocs` distinct docs vanish corpus-wide (C4 rule;
  *     hash-keyed frequency pass + broadcast anti join); a doc that was
  *     ALL boilerplate drops out. This runs BEFORE cleanup: whitespace
  *     normalization destroys the raw line structure the rule is
  *     defined over
  *  2. clean: HTML strip + entity decode, then PII redaction (map-only)
  *  3. score + filter: language-ID and quality score over the cleaned
  *     post-boilerplate text; drop unidentified or low-quality docs
  *  4. exact dedup: content-hash groups, min-id keeper (one shuffle)
  *  5. near dedup: MinHash-LSH pairs → connected components → one
  *     representative per cluster (banded candidates, never all-pairs)
  *  6. decontaminate: drop docs whose word-n-gram overlap with the
  *     benchmark set exceeds `maxContamination` (broadcast gram set)
  *  7. split: deterministic md5-prefix train/val/test (map-only,
  *     stable under corpus growth)
  *  8. mixture (opt-in): materialize the training epoch by per-source
  *     weights — TRAIN docs repeat floor(w) + Bernoulli(frac(w)) times
  *     (broadcast weights, map-side explode); val/test are never
  *     resampled (evaluation must not be reweighted)
  *  9. pack: token-budget bins per (source, split) shard (parallel
  *     windows; bins never mix splits, epoch copies pack as separate
  *     sequences)
  *
  * Returns one row per surviving doc (per epoch copy when mixture is
  * on — then an `epoch_copy` column is appended) with (doc_id, source,
  * text, lang_pred, quality, split, n_tok, bin).
  */
object CorpusPipeline {

  def prepare(docs: DataFrame, bench: DataFrame,
      minQuality: Double = 0.2, ngram: Int = 5,
      maxContamination: Double = 0.5, tokenBudget: Int = 2048,
      boilerplateMinDocs: Long = 0L,
      mixtureWeights: Option[DataFrame] = None): DataFrame = {
    // 0: Unicode canonicalization FIRST — NFC preserves newlines, so it
    // is safe before the line-structured boilerplate stage, and it must
    // precede BOTH hash-based stages: composed vs decomposed spellings
    // of the same boilerplate line (or the same document) must hash
    // identically or frequency counting and dedup silently split them
    val normalized = docs.withColumn("text", normalizeNfc(col("text")))

    // 1: cross-corpus boilerplate removal (opt-in) over the RAW line
    // structure — htmlStrip normalizes \s+ to single spaces, so line
    // boundaries only exist before cleanup
    val boiled =
      if (boilerplateMinDocs < 2) normalized
      else {
        val lines = normalized
          .select(col("doc_id"),
            posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
        val rebuilt = Corpus.reassembleLines(
          Corpus.stripBoilerplate(lines, "doc_id", "line", boilerplateMinDocs),
          "doc_id", "pos", "line", "__clean_text")
        normalized.drop("text")
          .join(rebuilt, Seq("doc_id"))
          .withColumnRenamed("__clean_text", "text")
      }

    // 2: scrub, one codegen'd map stage (text already NFC-canonical)
    val scrubbed = boiled.withColumn("text", piiScrub(htmlStrip(col("text"))))

    // 3: score + filter
    val cleaned = scrubbed
      .withColumn("lang_pred", langId(col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("lang_pred") =!= "und" && col("quality") >= minQuality)

    // 4: exact dedup — the tested operator picks the canonical keeper
    val keepers = Dedup.exactDupGroups(cleaned, "doc_id", "text")
      .select(col("keeper").as("doc_id"))
    val exact = cleaned.join(keepers, Seq("doc_id"), "left_semi")

    // 5: near dedup — LSH pairs, cluster, keep one representative
    val pairs = Dedup.minHashPairs(exact, "doc_id", "text")
    val deduped = Dedup.applyDedup(exact, "doc_id", pairs)

    // 6: decontaminate against the benchmark set. Benchmark rows carry an
    // EXPLICIT is_bench flag — not an id-sign sentinel, which would
    // silently misroute a corpus that legitimately uses negative doc_ids
    // (bench docs into the gram set, corpus docs dropped). Their
    // row_number ids are only for distinctness within the union (the
    // benchmark set is small by definition, so its global window is not
    // a scale concern). Anti-join the OVER-threshold set —
    // a doc too short to have any n-gram is absent from contamination()
    // output and must survive, which a keep-list semi-join would drop.
    // benchmark text gets the SAME cleanup as the corpus — n-grams must
    // be computed over identical token streams or markup/PII on either
    // side silently defeats the overlap test
    val benchRows = bench
      .select(piiScrub(htmlStrip(normalizeNfc(col("text")))).as("text"))
      .withColumn("doc_id", -row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("text"))))
      .select(col("doc_id"), col("text"), lit(true).as("is_bench"))
    val union = deduped.select(col("doc_id"), col("text"))
      .withColumn("is_bench", lit(false))
      .unionByName(benchRows)
    val contaminated = Corpus.contamination(union, col("is_bench"), "doc_id", "text", ngram)
      .filter(col("n_contaminated") > col("n_grams") * maxContamination)
      .select("doc_id")
    val decontaminated = deduped.join(contaminated, Seq("doc_id"), "left_anti")

    // 7: deterministic split
    val splitDocs = decontaminated.withColumn("split",
      Corpus.hashSplit(col("doc_id"), "corpus:",
        Seq("cd" -> "train", "e6" -> "val"), "test"))
      .withColumn("shard", concat_ws("#", col("source"), col("split")))

    // 8: epoch-mixture materialization (opt-in, train split only). The
    // packing order key folds the copy index next to the doc id so a
    // doc's copies pack adjacently and deterministically; 64 bounds
    // n_copies, i.e. max source weight (checked — silently wrapping
    // would interleave unrelated docs' copies, corrupting nothing but
    // determinism of bin composition)
    val epoch = mixtureWeights match {
      case None => splitDocs.withColumn("__ord", col("doc_id"))
      case Some(w) =>
        // the arithmetic fold needs an integral doc_id (a string id
        // would multiply to NULL, making pack order nondeterministic)
        // and ×64 headroom (silent overflow would interleave copies) —
        // both rejected loudly, the shared kernel id contract
        graft.ops.Guards.requireIntegralId(splitDocs, "doc_id", "mixture packing")
        val maxFoldable = Long.MaxValue / 64
        val train = Corpus.mixtureResample(
          splitDocs.filter(col("split") === "train"),
          w, "source", "weight", "doc_id", "epoch:")
        val rest = splitDocs.filter(col("split") =!= "train")
          .withColumn("n_copies", lit(1L))
          .withColumn("epoch_copy", lit(1L))
        train.unionByName(rest)
          .withColumn("__ord",
            when(col("n_copies") >= 64,
              raise_error(lit("mixture weight >= 64 unsupported")).cast("long"))
              .when(col("doc_id") > maxFoldable || col("doc_id") < -maxFoldable,
                raise_error(lit("doc_id overflows the ×64 pack-order fold"))
                  .cast("long"))
              .otherwise(col("doc_id") * 64 + col("epoch_copy")))
    }

    // 9: pack per (source, split) shard — a packed bin is a training
    // sequence, so it must never mix splits
    val packed = Corpus.packBins(epoch, "shard", "__ord",
      tokenCount(col("text")), tokenBudget)
    val baseCols = Seq("doc_id", "source", "text", "lang_pred", "quality",
      "split", "n_tok", "bin") // bin is per (source, split) shard
    packed.select((if (mixtureWeights.isDefined) baseCols :+ "epoch_copy"
      else baseCols).map(col): _*)
  }
}
