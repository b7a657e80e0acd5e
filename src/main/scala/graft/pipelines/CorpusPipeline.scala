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
  *  1. clean: HTML strip + entity decode, then PII redaction (map-only)
  *  2. score + filter: language-ID and quality score; drop unidentified
  *     or low-quality docs (map-only)
  *  3. exact dedup: content-hash groups, min-id keeper (one shuffle)
  *  4. near dedup: MinHash-LSH pairs → connected components → one
  *     representative per cluster (banded candidates, never all-pairs)
  *  5. decontaminate: drop docs whose word-n-gram overlap with the
  *     benchmark set exceeds `maxContamination` (broadcast gram set)
  *  6. split: deterministic md5-prefix train/val/test (map-only,
  *     stable under corpus growth)
  *  7. pack: token-budget bins per source shard (parallel windows)
  *
  * Returns one row per surviving doc with (doc_id, source, text,
  * lang_pred, quality, split, n_tok, bin).
  */
object CorpusPipeline {

  def prepare(docs: DataFrame, bench: DataFrame,
      minQuality: Double = 0.2, ngram: Int = 5,
      maxContamination: Double = 0.5, tokenBudget: Int = 2048): DataFrame = {
    // 1-2: clean + score + filter, one codegen'd map stage
    val cleaned = docs
      .withColumn("text", piiScrub(htmlStrip(col("text"))))
      .withColumn("lang_pred", langId(col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("lang_pred") =!= "und" && col("quality") >= minQuality)

    // 3: exact dedup — the tested operator picks the canonical keeper
    val keepers = Dedup.exactDupGroups(cleaned, "doc_id", "text")
      .select(col("keeper").as("doc_id"))
    val exact = cleaned.join(keepers, Seq("doc_id"), "left_semi")

    // 4: near dedup — LSH pairs, cluster, keep one representative
    val pairs = Dedup.minHashPairs(exact, "doc_id", "text")
    val deduped = Dedup.applyDedup(exact, "doc_id", pairs)

    // 5: decontaminate against the benchmark set. Benchmark rows carry an
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
    val benchRows = bench.select(piiScrub(htmlStrip(col("text"))).as("text"))
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

    // 6-7: deterministic split, then pack per (source, split) shard —
    // a packed bin is a training sequence, so it must never mix splits
    val split = decontaminated.withColumn("split",
      Corpus.hashSplit(col("doc_id"), "corpus:",
        Seq("cd" -> "train", "e6" -> "val"), "test"))
      .withColumn("shard", concat_ws("#", col("source"), col("split")))
    Corpus.packBins(split, "shard", "doc_id", tokenCount(col("text")), tokenBudget)
      .select("doc_id", "source", "text", "lang_pred", "quality",
        "split", "n_tok", "bin") // bin is per (source, split) shard
  }
}
