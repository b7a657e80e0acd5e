package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round 15 (optimization): [[Fan.widen]] must (a) be a structural
  * no-op once a frame is at least default-parallelism wide — the
  * at-scale case, where adding an exchange would be pure cost — and
  * (b) never change any widened kernel's OUTPUT, which reduces to the
  * kernels being partitioning-independent (bounded-heap top-k with
  * total-order tie-breaks, integer partial aggregates). The spec pins
  * both: the no-op property directly, and bit-identical kernel results
  * across a 1-partition vs many-partition input — the exact axis widen
  * moves. */
class FanOutSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(parts: Int) = {
    val rows = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 7 + d * 3).toFloat))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
      .toDF("vec_id", "embedding")
  }

  private def docs(parts: Int) = {
    val rows = (0 until 50).map { i =>
      (i.toLong, s"alpha beta gamma delta ${"epsilon " * (i % 5)} row $i tail ${i % 7}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
      .toDF("doc_id", "text")
  }

  test("widen is identity at or above default parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val wide = vecs(p + 2)
    // same Dataset object back — no exchange inserted at scale widths
    assert(Fan.widen(wide) eq wide)
    val narrow = vecs(1)
    assert(Fan.widen(narrow).rdd.getNumPartitions == p)
  }

  private def collected(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("exactSelfTopK is partition-count independent (widen axis)") {
    val a = Similarity.exactSelfTopK(vecs(1), "vec_id", "embedding", k = 3)
    val b = Similarity.exactSelfTopK(vecs(7), "vec_id", "embedding", k = 3)
    assert(collected(a) == collected(b))
  }

  test("ivfSelfTopK is partition-count independent (widen axis)") {
    val a = Similarity.ivfSelfTopK(vecs(1), "vec_id", "embedding",
      k = 3, nProbe = 2)
    val b = Similarity.ivfSelfTopK(vecs(5), "vec_id", "embedding",
      k = 3, nProbe = 2)
    assert(collected(a) == collected(b))
  }

  test("minHashPairs is partition-count independent (widen axis)") {
    val a = Dedup.minHashPairs(docs(1), "doc_id", "text", threshold = 0.3)
    val b = Dedup.minHashPairs(docs(6), "doc_id", "text", threshold = 0.3)
    assert(collected(a) == collected(b))
  }

  test("jaccardJoinExact is partition-count independent and size-exact " +
    "after the bare-pair candidate narrowing") {
    def run(parts: Int) = SetSimilarity.jaccardJoinExact(
      SetSimilarity.shingleTokens(docs(parts), "doc_id", "text", n = 2),
      "id", "token", tauMicro = 300000L)
    val a = run(1)
    val b = run(6)
    assert(collected(a) == collected(b))
    // uni must still equal |A| + |B| − inter per pair (sizes are now
    // recovered from the doc arrays, not carried through the dedup)
    val viaSizes = run(3)
    val toks = SetSimilarity.shingleTokens(docs(3), "doc_id", "text", n = 2)
      .select(col("id"), col("token")).distinct()
      .groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val joined = viaSizes
      .join(toks.select(col("id").as("a_id"), col("sz").as("sa")), "a_id")
      .join(toks.select(col("id").as("b_id"), col("sz").as("sb")), "b_id")
      .filter(col("uni") =!= col("sa") + col("sb") - col("inter"))
    assert(joined.count() == 0)
  }
}
