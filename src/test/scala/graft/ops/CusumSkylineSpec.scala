package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** CUSUM closed form vs the textbook recursion; skyline dominance. */
class CusumSkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("cusum closed form equals the max(0, S + dev) recursion") {
    val vals = Seq(10L, 10L, 10L, 25L, 30L, 10L, 5L, 10L)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i, v) }
      .toDF("g", "b", "v")
    val out = Monitoring.cusumShift(df, col("g"), col("b"), col("v"))
      .orderBy("b").select("cusum_micro").as[Long].collect()
    val mean = vals.sum * 1000000L / vals.length
    val expected = vals.map(_ * 1000000L - mean)
      .scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    assert(out.toSeq === expected)
  }

  test("cusum flags a persistent level shift a single spike would not trip") {
    // 10 quiet buckets then 10 at +40%: each bucket is mild, the sum is not
    val df = ((0 until 10).map(i => ("a", i, 100L))
      ++ (10 until 20).map(i => ("a", i, 140L))).toDF("g", "b", "v")
    val out = Monitoring.cusumShift(df, col("g"), col("b"), col("v"),
      thresholdPct = 100)
      .orderBy("b").select("flagged").as[Boolean].collect()
    assert(!out.take(10).exists(identity), "quiet period must not flag")
    assert(out.last, "accumulated shift must flag by the end")
  }

  test("cusum groups are independent") {
    val df = Seq(("a", 0, 100L), ("a", 1, 500L), ("b", 0, 100L), ("b", 1, 100L))
      .toDF("g", "b", "v")
    val out = Monitoring.cusumShift(df, col("g"), col("b"), col("v"), 50)
      .select("g", "flagged").as[(String, Boolean)].collect()
    assert(!out.filter(_._1 == "b").exists(_._2))
    assert(out.filter(_._1 == "a").exists(_._2))
  }

  test("skyline keeps exactly the non-dominated points") {
    // minimize x, maximize y. (1,5) and (3,7) on front; (2,4) dominated
    // by (1,5); (3,6) dominated by (3,7); (4,7) dominated by (3,7).
    val df = Seq((1L, 5L, "a"), (2L, 4L, "b"), (3L, 7L, "c"),
      (3L, 6L, "d"), (4L, 7L, "e")).toDF("x", "y", "tag")
    val out = Analytics.skyline2d(df, "x", "y")
      .select("tag").as[String].collect().toSet
    assert(out === Set("a", "c"))
  }

  test("equal undominated points both survive; exact duplicates too") {
    val df = Seq((1L, 5L, "a"), (1L, 5L, "b"), (2L, 9L, "c"))
      .toDF("x", "y", "tag")
    val out = Analytics.skyline2d(df, "x", "y")
      .select("tag").as[String].collect().toSet
    assert(out === Set("a", "b", "c"))
  }

  test("skyline matches brute force on a randomized set") {
    val pts = (1 to 200).map { i =>
      (math.abs(i * 2654435761L % 50), math.abs(i * 40503L % 50), i.toLong)
    }
    val df = pts.toDF("x", "y", "id")
    val fast = Analytics.skyline2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val slow = pts.filter { case (x, y, _) =>
      !pts.exists { case (x2, y2, _) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(_._3).toSet
    assert(fast === slow)
  }
}
