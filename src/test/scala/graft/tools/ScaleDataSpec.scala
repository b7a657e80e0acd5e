package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The deterministic upscaler's ADVERSARIAL plant (`--skew2`, round
  * 11). The lanes trust the plant's statistics; this spec pins them so
  * a refactor cannot silently de-fang the adversary:
  *  - the Zipf remap follows 1/r (top rank ≈ ln2/ln D of rows, rank 2
  *    ≈ half that) and stays inside the per-copy key domain;
  *  - the value point mass hits ~10% of l_extendedprice rows;
  *  - the hot token lands on ~10% of documents and is the SAME token
  *    in every copy (appended after the cipher — a corpus-spanning
  *    posting list, not a per-copy one);
  *  - determinism: two builds produce identical frames.
  */
class ScaleDataSpec extends SparkTestBase {

  import spark.implicits._

  // a miniature sf dir with just the tables the plant touches
  private lazy val dir: String = {
    val d = Files.createTempDirectory("scaledata_spec").toString
    (1L to 3000L).map(i => (i, (i % 400) + 1))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    (1L to 6000L).map(i => (i / 2 + 1, (i % 500) + 1, (i % 7) + 1,
        (i % 4).toInt + 1, 100.0 + (i % 97)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_extendedprice")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    (0L until 1000L).map(i => (i, s"alpha beta doc$i gamma"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("zipf key remap follows 1/r and stays in the copy domain") {
    val o = ScaleData.scaled(spark, dir, "orders", copies = 2,
      skew = false, skew2 = true)
    val copy0 = o.filter(col("o_orderkey") < (1L << 50))
    val n = copy0.count().toDouble
    val byKey = copy0.groupBy(col("o_custkey")).count()
      .orderBy(col("count").desc).limit(3)
      .as[(Long, Long)].collect()
    // D = 400 → expected top share ln2/ln400 ≈ 0.116; rank-2 ≈ half
    val top = byKey(0)._2 / n
    val second = byKey(1)._2 / n
    assert(top > 0.06 && top < 0.20, s"top-rank share $top not Zipf-like")
    assert(second > 0.35 * top && second < 0.75 * top,
      s"rank-2/rank-1 = ${second / top}, expected ≈ 0.5 (1/r law)")
    // domain: every remapped key within [1, maxCust] (+ copy offset)
    val c1 = o.filter(col("o_orderkey") >= (1L << 50))
    assert(copy0.agg(min("o_custkey"), max("o_custkey"))
      .as[(Long, Long)].head() match {
        case (lo, hi) => lo >= 1L && hi <= 400L
      })
    assert(c1.agg(min("o_custkey")).as[Long].head() >= (1L << 50) + 1)
  }

  test("value point mass ~10% of l_extendedprice; token on ~10% of docs, same in all copies") {
    val li = ScaleData.scaled(spark, dir, "lineitem", copies = 1,
      skew = false, skew2 = true)
    val hotFrac = li.filter(col("l_extendedprice") === 4999.99).count()
      .toDouble / li.count()
    assert(hotFrac > 0.07 && hotFrac < 0.13, s"hot-price share $hotFrac")
    val docs = ScaleData.scaled(spark, dir, "documents", copies = 2,
      skew = false, skew2 = true)
    val hotDocs = docs.filter(col("text").contains("zqhotterm"))
    val frac = hotDocs.count().toDouble / docs.count()
    assert(frac > 0.07 && frac < 0.13, s"hot-token share $frac")
    // same literal token in BOTH copies (appended after the cipher)
    val perCopy = hotDocs
      .groupBy((col("doc_id") >= (1L << 50)).as("c1")).count()
      .as[(Boolean, Long)].collect().toMap
    assert(perCopy.keySet == Set(false, true), "token missing in a copy")
  }

  test("the plant is deterministic (two builds identical)") {
    def fingerprint() = ScaleData
      .scaled(spark, dir, "orders", copies = 2, skew = false, skew2 = true)
      .agg(sum(col("o_custkey")), count(lit(1)), max(col("o_custkey")))
      .as[(Long, Long, Long)].head()
    assert(fingerprint() === fingerprint())
  }
}
