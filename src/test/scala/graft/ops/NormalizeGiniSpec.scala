package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Quantile normalization and Gini: distribution identity and
  * hand-computed inequality values. */
class NormalizeGiniSpec extends SparkTestBase {
  import spark.implicits._

  test("quantile normalization gives every group the same marginal distribution") {
    // group a: 1..10; group b: 1000..1009 (same shape, shifted scale)
    val df = ((1L to 10L).map(v => ("a", v, v))
      ++ (1L to 10L).map(v => ("b", v + 100L, v + 999L)))
      .toDF("g", "id", "v")
    val out = Stats.quantileNormalize(df, col("g"), col("id"), col("v"))
    val byG = out.groupBy("g").agg(collect_set(col("norm_v")).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    assert(byG("a").toSet === byG("b").toSet,
      s"marginals differ after normalization: $byG")
  }

  test("quantile normalization preserves within-group order") {
    val df = Seq(("a", 1L, 50L), ("a", 2L, 10L), ("a", 3L, 30L),
      ("b", 4L, 7L), ("b", 5L, 9L)).toDF("g", "id", "v")
    val out = Stats.quantileNormalize(df, col("g"), col("id"), col("v"))
      .as[(String, Long, Long, Long)].collect()
    for (pair <- out.sortBy(r => (r._1, r._3)).sliding(2)
         if pair.length == 2 && pair(0)._1 == pair(1)._1) {
      val (v1, n1, v2, n2) = (pair(0)._3, pair(0)._4, pair(1)._3, pair(1)._4)
      assert(v1 <= v2 && n1 <= n2, s"order broken: $v1->$n1, $v2->$n2")
    }
  }

  test("gini: perfect equality scores 0") {
    val df = (1L to 8L).map(i => ("a", i, 5L)).toDF("g", "id", "v")
    val r = Stats.gini(df, col("g"), col("id"), col("v")).collect().head
    assert(r.getAs[Long]("gini_micro") === 0L)
  }

  test("gini: hand-computed value for maximal concentration") {
    // one doc owns everything: G = (2*n*s - (n+1)*s)/(n*s) = (n-1)/n
    val df = (Seq(("a", 1L, 100L)) ++ (2L to 5L).map(("a", _, 0L)))
      .toDF("g", "id", "v")
    val r = Stats.gini(df, col("g"), col("id"), col("v")).collect().head
    assert(r.getAs[Long]("gini_micro") === 800000L) // (5-1)/5 = 0.8
  }

  test("gini: zero total raises loudly") {
    val df = Seq(("a", 1L, 0L)).toDF("g", "id", "v")
    val e = intercept[Exception] {
      Stats.gini(df, col("g"), col("id"), col("v")).collect()
    }
    assert(e.getMessage.contains("positive value sum")
      || e.getCause != null && e.getCause.getMessage.contains("positive value sum"))
  }
}
