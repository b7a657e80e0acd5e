package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (1L, ts("2024-01-01 00:00:00")), // exactly at a range start: included
    (2L, ts("2024-01-01 05:59:59")),
    (3L, ts("2024-01-01 06:00:00")), // exactly at a range end: excluded
    (4L, ts("2024-01-02 12:00:00")), // inside the long range only
    (5L, ts("2024-03-01 00:00:00"))) // matches nothing
    .toDF("pid", "pt")

  private val ranges = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00")), // one bin
    (11L, ts("2024-01-01 03:00:00"), ts("2024-01-03 00:00:00")), // spans many bins
    (12L, ts("2024-01-05 00:00:00"), ts("2024-01-04 00:00:00")), // inverted: dropped
    (13L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00"))) // empty: dropped
    .toDF("rid", "r_start", "r_end")

  private def matches(binSeconds: Long): Set[(Long, Long)] =
    RangeJoin.binnedIntervalJoin(points, ranges, "pt", "r_start", "r_end", binSeconds)
      .select("pid", "rid").as[(Long, Long)].collect().toSet

  test("binned interval join equals the naive non-equi join") {
    val naive = points.join(ranges,
        col("pt") >= col("r_start") && col("pt") < col("r_end"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(matches(3600) == naive)
    assert(naive == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)))
  }

  test("bin width does not change the result, only the plan") {
    val expected = matches(3600)
    for (w <- Seq(1L, 60L, 6 * 3600L, 30 * 86400L))
      assert(matches(w) == expected, s"binSeconds=$w")
  }

  test("each matching pair is emitted exactly once (no bin double-count)") {
    val rows = RangeJoin
      .binnedIntervalJoin(points, ranges, "pt", "r_start", "r_end", 3600)
      .groupBy("pid", "rid").count().filter(col("count") > 1).count()
    assert(rows == 0)
  }

  test("plan is an equi-join, not a broadcast nested loop") {
    val plan = RangeJoin
      .binnedIntervalJoin(points, ranges, "pt", "r_start", "r_end", 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("overlap join equals the naive overlap join, each pair exactly once") {
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 06:00:00")),
      (2L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00")),
      (3L, ts("2024-01-05 00:00:00"), ts("2024-01-04 00:00:00"))) // inverted
      .toDF("aid", "a_start", "a_end")
    val b = Seq(
      (10L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")), // inside 1
      (11L, ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00")), // overlaps 1 and 2
      (12L, ts("2024-01-02 06:00:00"), ts("2024-01-02 07:00:00")), // abuts 1 (half-open: no)
      (13L, ts("2024-01-10 00:00:00"), ts("2024-01-11 00:00:00"))) // disjoint
      .toDF("bid", "b_start", "b_end")
    val naive = a.filter(col("a_end") > col("a_start")).join(b,
      col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(naive == Set((1L, 10L), (1L, 11L), (2L, 11L)))
    for (w <- Seq(3600L, 6 * 3600L, 7 * 86400L)) {
      val rows = RangeJoin.binnedOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", w)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(rows.length == rows.distinct.length, s"duplicate pairs at bin $w")
      assert(rows.toSet == naive, s"binSeconds=$w")
    }
  }

  test("randomized equivalence with the naive joins (seeded, 3 bin widths)") {
    val rnd = new scala.util.Random(20260813L)
    def randTs() = ts("2024-01-01 00:00:00").getTime + rnd.nextInt(14 * 86400) * 1000L
    val pts = (1 to 300).map(i => (i.toLong, new Timestamp(randTs())))
      .toDF("pid", "pt")
    val rgs = (1 to 80).map { i =>
      val s = randTs()
      // mix of empty, short, and multi-day spans (some inverted)
      (i.toLong + 1000, new Timestamp(s), new Timestamp(s + (rnd.nextInt(9) - 1) * 43200L * 1000L))
    }.toDF("rid", "r_start", "r_end")
    val naivePt = pts.join(rgs, col("pt") >= col("r_start") && col("pt") < col("r_end"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val a = rgs.toDF("aid", "a_start", "a_end")
    val b = rgs.select((col("rid") + 5000).as("bid"),
      col("r_start").as("b_start"), col("r_end").as("b_end"))
    // an inverted interval is EMPTY and overlaps nothing, but the raw
    // predicate a_start < b_end && b_start < a_end can still hold for
    // one — the naive reference must filter both sides like the op does
    val naiveOv = a.filter(col("a_end") > col("a_start"))
      .join(b.filter(col("b_end") > col("b_start")),
        col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(naivePt.nonEmpty && naiveOv.nonEmpty, "degenerate random fixture")
    for (w <- Seq(3600L, 21600L, 3 * 86400L)) {
      val gotPt = RangeJoin.binnedIntervalJoin(pts, rgs, "pt", "r_start", "r_end", w)
        .select("pid", "rid").as[(Long, Long)].collect()
      assert(gotPt.length == gotPt.distinct.length, s"interval dup at $w")
      assert(gotPt.toSet == naivePt, s"interval mismatch at binSeconds=$w")
      val gotOv = RangeJoin.binnedOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", w)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(gotOv.length == gotOv.distinct.length, s"overlap dup at $w")
      assert(gotOv.toSet == naiveOv, s"overlap mismatch at binSeconds=$w")
    }
  }

  test("rejects a non-positive bin width") {
    intercept[IllegalArgumentException] {
      RangeJoin.binnedIntervalJoin(points, ranges, "pt", "r_start", "r_end", 0)
    }
  }

  test("a sentinel-dated range raises instead of exploding unbounded bins") {
    // end = 9999-12-31 against 1-second bins would be ~2.5e11 rows for
    // this one range — the per-row cap must fail loudly, not OOM
    val sentinel = Seq((99L, ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00")))
      .toDF("rid", "r_start", "r_end")
    val e = intercept[Exception] {
      RangeJoin.binnedIntervalJoin(points, sentinel, "pt", "r_start", "r_end", 1)
        .count()
    }
    assert(e.getMessage.contains("bins"), e.getMessage)

    val f = intercept[Exception] {
      RangeJoin.binnedOverlapJoin(
        points.withColumn("p_end", col("pt") + expr("interval 1 hour"))
          .withColumnRenamed("pt", "p_start"),
        sentinel, "p_start", "p_end", "r_start", "r_end", 1).count()
    }
    assert(f.getMessage.contains("bins"), f.getMessage)
  }
}
