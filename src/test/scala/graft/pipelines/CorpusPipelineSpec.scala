package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables

/** End-to-end training-corpus preparation over the synthetic documents
  * table: every stage's guarantee is asserted on the composed output,
  * not just per-operator. */
class CorpusPipelineSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"

  private lazy val out = {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    // plant near-duplicate twins (one appended token, shifted ids) so
    // the near-dedup stage has guaranteed work
    val corpus = docs.unionByName(docs
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", concat(col("text"), lit(" xq"))))
    // benchmark set = the exact text of every 10th doc — those docs (and
    // their twins) are fully contaminated and must be dropped
    val bench = docs.filter(col("doc_id") % 10 === 0).select("text")
    CorpusPipeline.prepare(corpus, bench).cache()
  }

  override def afterAll(): Unit = {
    // suites share one SparkSession: leave no cached plan behind for a
    // later suite's canonically-equal subplan to silently reuse
    out.unpersist(blocking = true)
    super.afterAll()
  }

  test("pipeline returns cleaned, scored, deduped rows") {
    assert(out.count() > 0)
    assert(out.filter(col("lang_pred") === "und").count() == 0)
    assert(out.filter(col("quality") < 0.2).count() == 0)
  }

  test("no exact or near duplicates survive") {
    val hashes = out.select(md5(col("text").cast("binary"))).collect().map(_.getString(0))
    assert(hashes.length == hashes.distinct.length, "exact duplicates survived")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    ids.foreach { id =>
      assert(!(ids.contains(id) && ids.contains(id + 1000000)),
        s"near-dup twin pair ($id, ${id + 1000000}) both survived")
    }
  }

  test("benchmark-contaminated docs are dropped, others keep their text") {
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // a benchmark doc's surviving representative (itself or its twin)
    // shares every 5-gram with the benchmark text -> must be gone
    kept.foreach { id =>
      assert((id % 1000000) % 10 != 0, s"contaminated doc $id survived")
    }
  }

  test("boilerplate + mixture stages compose: chrome gone, epoch weighted") {
    import spark.implicits._
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      // every doc gets the same footer line appended — corpus-wide chrome
      .withColumn("text", concat(col("text"), lit("\nALL RIGHTS RESERVED")))
    val bench = docs.filter(col("doc_id") % 10 === 0).select("text")
    val weights = docs.select("source").distinct()
      .withColumn("weight",
        when(col("source") === "src0", lit(3.0)).otherwise(lit(1.0)))
    val out2 = CorpusPipeline.prepare(docs, bench,
      boilerplateMinDocs = 10, mixtureWeights = Some(weights)).cache()
    try {
      // the shared footer is boilerplate: no surviving text contains it
      assert(out2.filter(col("text").contains("ALL RIGHTS RESERVED")).count() == 0)
      // but doc content survives (the pipeline didn't just empty the docs)
      assert(out2.count() > 0)
      // mixture: src0 TRAIN docs appear exactly 3x, other sources 1x;
      // val/test rows are never resampled
      val perDoc = out2.groupBy("doc_id", "source", "split").count()
      assert(perDoc.filter(col("split") === "train" && col("source") === "src0" &&
        col("count") =!= 3).count() == 0, "src0 train docs must repeat 3x")
      assert(perDoc.filter(col("source") =!= "src0" && col("count") =!= 1).count() == 0)
      assert(perDoc.filter(col("split") =!= "train" && col("count") =!= 1).count() == 0)
      // epoch copies of one doc pack adjacently: same bin or consecutive
      val copies = out2.filter(col("split") === "train" && col("source") === "src0")
        .select("doc_id", "epoch_copy", "bin")
        .as[(Long, Long, Long)].collect().groupBy(_._1)
      copies.values.foreach { cs =>
        val bins = cs.sortBy(_._2).map(_._3)
        assert(bins.zip(bins.tail).forall { case (a, b) => b - a <= 1 && b >= a },
          s"copies scattered across bins: ${cs.toSeq}")
      }
    } finally out2.unpersist(blocking = true)
  }

  test("unicode spelling variants collapse in exact dedup (NFC in clean stage)") {
    import spark.implicits._
    // pick a body that passes the pipeline's lang/quality filters, so
    // the only question is whether the spelling variants collapse
    val body = Tables.t(spark, sf, "documents")
      .filter(graft.functions.langId(col("text")) =!= "und" &&
        graft.functions.qualityScore(col("text")) >= 0.2)
      .select("text").as[String].head()
    // same visible text, composed vs decomposed é — without NFC these
    // hash differently and BOTH survive exact dedup
    val docs = Seq(
      (1L, "caf\u00e9 " + body, "src0"),   // precomposed
      (2L, "cafe\u0301 " + body, "src0"))  // decomposed e + combining acute
      .toDF("doc_id", "text", "source")
    // mechanism: the clean stage must make the two spellings
    // BYTE-identical (count==1 alone is vacuous — the near-dup stage
    // would collapse the single-token difference anyway)
    val scrubbed = docs.select(graft.functions.piiScrub(
      graft.functions.htmlStrip(
        graft.functions.normalizeNfc(col("text")))).as("t"))
    assert(scrubbed.distinct().count() == 1,
      "NFC must canonicalize the spellings to identical bytes")
    val bench = docs.filter(lit(false)).select("text")
    val out2 = CorpusPipeline.prepare(docs, bench)
    assert(out2.count() == 1, "NFC variants must collapse to one doc")
  }

  test("split and packing invariants hold") {
    val rows = out.select("source", "split", "bin", "n_tok", "doc_id").collect()
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    // per (source, split, bin): tokens before the last doc stay under
    // budget (the crossing doc may overflow, by construction)
    rows.groupBy(r => (r.getAs[String]("source"), r.getAs[String]("split"),
      r.getAs[Long]("bin"))).foreach { case (key, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      val allButLast = sorted.dropRight(1).map(_.getAs[Int]("n_tok").toLong).sum
      assert(allButLast < 2048, s"bin $key over-packed: $allButLast before last doc")
    }
  }
}
