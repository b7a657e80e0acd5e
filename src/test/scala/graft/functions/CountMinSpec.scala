package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Contract tests for the CMS heavy-hitters aggregate: upper-bound
  * counts, exact mergeability (partition-count independence), and
  * SQL-surface registration. */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish corpus: token wi appears ~1000/i times, one token per row
    * (plus a few multi-token rows to exercise the tokenizer). */
  private def zipfDocs(vocab: Int) = {
    val rows = (1 to vocab).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    (rows :+ "w1 W1\tw2").toDF("text") // case folding + tab boundary
  }

  private def exactCounts(vocab: Int): Map[String, Long] = {
    val base = (1 to vocab).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    base + ("w1" -> (base("w1") + 2L)) + ("w2" -> (base("w2") + 1L))
  }

  test("wide sketch, small vocab: top-k equals the exact counts") {
    val vocab = 30 // < 2k candidates, width 4096 → no collisions in practice
    val got = zipfDocs(vocab)
      .agg(cmsHeavyHitters(col("text"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = exactCounts(vocab)
    val want = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("counts are upper bounds within eN/width even under heavy collision") {
    val vocab = 500
    val n = (1 to vocab).map(i => 1000 / i).sum + 3L
    // deliberately tiny width to force collisions
    val got = zipfDocs(vocab)
      .agg(cmsHeavyHitters(col("text"), 20, depth = 4, width = 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = exactCounts(vocab)
    val epsN = math.ceil(math.E / 64 * n).toLong
    got.foreach { case (tok, est) =>
      val truth = exact(tok)
      assert(est >= truth, s"'$tok': CMS must never undercount ($est < $truth)")
      assert(est <= truth + epsN,
        s"'$tok': overshoot ${est - truth} exceeds eN/width $epsN")
    }
  }

  test("merge is exact: 1 vs 8 partitions give identical output") {
    val vocab = 30 // fits the candidate cap → merge is fully deterministic
    def run(parts: Int) = zipfDocs(vocab).repartition(parts)
      .agg(cmsHeavyHitters(col("text"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(run(1) == run(8),
      "CMS estimates must be independent of partition count")
  }

  test("skewed head survives partitioning even with vocab far over the candidate cap") {
    val vocab = 2000 // ≫ 2k=20 candidate slots at k=10
    def top(parts: Int) = zipfDocs(vocab).repartition(parts)
      .agg(cmsHeavyHitters(col("text"), 5, depth = 4, width = 8192).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token")).collect().map(_.getString(0)).toSet
    // the Zipf head (w1..w5, counts 1002, 501, 333, 250, 200) dominates
    // everything past it — it must be found under any partitioning
    val want = Set("w1", "w2", "w3", "w4", "w5")
    assert(top(1) == want, top(1).toString)
    assert(top(8) == want, top(8).toString)
  }

  test("cms_heavy_hitters is registered as a SQL function") {
    graft.GraftExtensions.install(spark)
    zipfDocs(5).createOrReplaceTempView("cms_docs")
    val rows = spark.sql(
      """SELECT e.token, e.count FROM (
        |  SELECT explode(cms_heavy_hitters(text, 3)) AS e FROM cms_docs)
        |ORDER BY e.count DESC, e.token""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows.head.getString(0) == "w1")
  }
}
