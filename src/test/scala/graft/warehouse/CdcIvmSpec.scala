package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** CDC apply and incremental-agg-state semantics. */
class CdcIvmSpec extends SparkTestBase {
  import spark.implicits._

  test("applyCdc: highest sequence wins, terminal delete tombstones the key") {
    val log = Seq(
      (1L, 10L, "U", 100L), (1L, 20L, "U", 200L),   // key 1 → seq 20, 200
      (2L, 11L, "U", 300L), (2L, 21L, "D", 0L),     // key 2 → deleted
      (3L, 12L, "D", 0L), (3L, 22L, "U", 400L)      // delete then re-insert
    ).toDF("key", "seq", "op", "cents")
    val got = Warehouse.applyCdc(log, "key", "seq", "op")
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 20L, 200L), (3L, 22L, 400L)), got.toSeq.toString)
  }

  test("applyCdc raises on duplicate sequences for a key") {
    val log = Seq((1L, 10L, "U", 1L), (1L, 10L, "U", 2L))
      .toDF("key", "seq", "op", "cents")
    val e = intercept[Exception] {
      Warehouse.applyCdc(log, "key", "seq", "op").collect()
    }
    assert(e.getMessage.contains("duplicate sequence"))
  }

  test("mergeAggState over three slices equals a full recompute") {
    val rows = (1 to 90).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val full = Warehouse.aggState(rows, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).longValue, r.getLong(3), r.getLong(4))).toMap
    val slices = Seq(rows.filter(col("v") % 3 === 0),
      rows.filter(col("v") % 3 === 1), rows.filter(col("v") % 3 === 2))
      .map(Warehouse.aggState(_, Seq("k"), col("v")))
    val merged = slices.reduce(Warehouse.mergeAggState(_, _, Seq("k")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).longValue, r.getLong(3), r.getLong(4))).toMap
    assert(merged == full, s"$merged vs $full")
  }

  test("cupedAdjustedMeans: zero pre-period variance degrades to plain means") {
    // all pre-period x equal → var = 0 → θ = 0 → cuped == raw
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(base.getTime + d * 86400000L)
    val ev = (1 to 20).flatMap { u =>
      Seq((u.toLong, ts(1), "purchase", 5.0),              // pre: same for all
        (u.toLong, ts(20), "purchase", 1.0 * u))           // post varies
    }.toDF("user_id", "ts", "event_type", "value")
    val rows = graft.ops.Analytics.cupedAdjustedMeans(ev, "user_id", "ts",
      "event_type", "purchase", "value", "ab:", "80", preDays = 15)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("theta_micro") == 0L)
      assert(r.getAs[Long]("raw_mean_micro") == r.getAs[Long]("cuped_mean_micro"),
        r.toString)
    }
  }
}
