package graft.warehouse

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private val log = Seq(
    // key k1: A, A (collapse), B, A — three runs
    ("k1", ts("2024-01-01"), 1L, "A"),
    ("k1", ts("2024-01-02"), 2L, "A"),
    ("k1", ts("2024-01-03"), 3L, "B"),
    ("k1", ts("2024-01-05"), 4L, "A"),
    // key k2: single state
    ("k2", ts("2024-01-02"), 5L, "X"))
    .toDF("k", "ts", "seq", "state")

  private lazy val dim =
    Warehouse.scd2FromLog(log, "k", "ts", "seq", Seq("state"))

  test("runs collapse and validity intervals chain half-open") {
    val rows = dim.orderBy("k", "valid_from")
      .select("k", "state", "valid_from", "valid_to", "is_current")
      .as[(String, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(rows == Seq(
      ("k1", "A", ts("2024-01-01"), Some(ts("2024-01-03")), false),
      ("k1", "B", ts("2024-01-03"), Some(ts("2024-01-05")), false),
      ("k1", "A", ts("2024-01-05"), None, true),
      ("k2", "X", ts("2024-01-02"), None, true)))
  }

  test("as-of reconstruction agrees with the raw log at every probe time") {
    // for each probe t: the dim row covering t must carry the same state
    // as the latest log row at-or-before t
    for (probe <- Seq("2024-01-01", "2024-01-02", "2024-01-04", "2024-01-06")) {
      val t0 = ts(probe)
      val fromDim = dim.filter(col("k") === "k1" &&
          col("valid_from") <= lit(t0) &&
          (col("valid_to").isNull || lit(t0) < col("valid_to")))
        .select("state").as[String].collect().toSeq
      val fromLog = log.filter(col("k") === "k1" && col("ts") <= lit(t0))
        .orderBy(col("ts").desc, col("seq").desc)
        .select("state").as[String].head()
      assert(fromDim == Seq(fromLog), s"probe $t0")
    }
  }

  test("timestamp ties break deterministically by the sequence column") {
    val tied = Seq(
      ("k", ts("2024-01-01"), 2L, "LATE"),
      ("k", ts("2024-01-01"), 1L, "EARLY"))
      .toDF("k", "ts", "seq", "state")
    val rows = Warehouse.scd2FromLog(tied, "k", "ts", "seq", Seq("state"))
      .orderBy("valid_from", "state")
      .select("state", "is_current").as[(String, Boolean)].collect().toSeq
    // seq orders EARLY before LATE: two runs, LATE current
    assert(rows == Seq(("EARLY", false), ("LATE", true)))
  }

  test("all-null attribute runs collapse (null-safe run comparison)") {
    val nulls = Seq(
      ("k", ts("2024-01-01"), 1L, null.asInstanceOf[String]),
      ("k", ts("2024-01-02"), 2L, null.asInstanceOf[String]),
      ("k", ts("2024-01-03"), 3L, "A"))
      .toDF("k", "ts", "seq", "state")
    val rows = Warehouse.scd2FromLog(nulls, "k", "ts", "seq", Seq("state"))
    assert(rows.count() == 2)
  }

  test("scd2Merge: matching change collapses, new state closes the run") {
    val changes = Seq(
      ("k1", ts("2024-01-07"), 6L, "A"), // same as k1's current state: collapse
      ("k2", ts("2024-01-08"), 7L, "Y"), // new state: closes X, opens Y
      ("k3", ts("2024-01-09"), 8L, "N")) // brand-new key
      .toDF("k", "ts", "seq", "state")
    val merged = Warehouse.scd2Merge(dim, changes, "k", "ts", "seq", Seq("state"))
      .orderBy("k", "valid_from")
      .select("k", "state", "valid_from", "valid_to", "is_current")
      .as[(String, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(merged == Seq(
      ("k1", "A", ts("2024-01-01"), Some(ts("2024-01-03")), false),
      ("k1", "B", ts("2024-01-03"), Some(ts("2024-01-05")), false),
      ("k1", "A", ts("2024-01-05"), None, true), // valid_from preserved
      ("k2", "X", ts("2024-01-02"), Some(ts("2024-01-08")), false),
      ("k2", "Y", ts("2024-01-08"), None, true),
      ("k3", "N", ts("2024-01-09"), None, true)))
  }

  test("scd2Merge equals a full rebuild on a real log split at a boundary") {
    val events = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").cast("string").as("k"), col("ts"),
        col("event_id").as("seq"), col("event_type").as("state"))
    val cut = ts("2024-01-15")
    val full = Warehouse.scd2FromLog(events, "k", "ts", "seq", Seq("state"))
    val incremental = Warehouse.scd2Merge(
      Warehouse.scd2FromLog(events.filter(col("ts") < lit(cut)),
        "k", "ts", "seq", Seq("state")),
      events.filter(col("ts") >= lit(cut)), "k", "ts", "seq", Seq("state"))
    val cols = Seq("k", "state", "valid_from", "valid_to", "is_current")
    val a = full.select(cols.map(col): _*).collect().toSet
    val b = incremental.select(cols.map(col): _*).collect().toSet
    assert(a == b, s"merge drifted from rebuild: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
    assert(a.nonEmpty)
  }

  test("one partitioning exchange serves both windows") {
    val plan = dim.queryExecution.executedPlan.toString
    // the run-collapse lag and the interval lead share (key, ts, seq)
    // ordering: exactly one hashpartitioning exchange on the key
    val exchanges = "hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"$exchanges exchanges in:\n$plan")
  }
}
