package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    // heavily skewed big side: 90% of rows share key 1
    val big = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("k", "v")
    val plain = big.join(small, "k").select("k", "payload", "v")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = Skew.saltedJoin(big, small, "k", factor = 8)
      .select("k", "payload", "v")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
