package graft.warehouse

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("snapshotDiff: added/removed/changed classified, unchanged omitted") {
    val oldSnap = Seq(
      (1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"), (4L, "d", "fr"))
      .toDF("id", "text", "lang")
    val newSnap = Seq(
      (1L, "a", "en"),      // unchanged → omitted
      (2L, "B2", "en"),     // changed
      (4L, "d", "it"),      // changed (non-text column)
      (5L, "e", "en"))      // added; 3 removed
      .toDF("id", "text", "lang")
    val got = Warehouse.snapshotDiff(oldSnap, newSnap, "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"), got.toString)
  }

  test("snapshotDiff: null attribute values compare stably") {
    val oldSnap = Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val newSnapSame = Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("id", "text")
    assert(Warehouse.snapshotDiff(oldSnap, newSnapSame, "id", Seq("text")).count() == 0)
    val newSnapFlip = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("id", "text")
    val got = Warehouse.snapshotDiff(oldSnap, newSnapFlip, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"), got.toString)
  }

  test("snapshotDiff: null-position swaps and separator-like values are NOT false negatives") {
    // (a, null) -> (null, a): a concat_ws-skips-nulls hash would miss this
    val oldSnap = Seq((1L, Option("a"), Option.empty[String]),
      (2L, Option("x"), Option("y")))
      .toDF("id", "text", "lang")
    val newSnap = Seq((1L, Option.empty[String], Option("a")),
      // value swallowing a would-be column boundary
      (2L, Option("x|y"), Option.empty[String]))
      .toDF("id", "text", "lang")
    val got = Warehouse.snapshotDiff(oldSnap, newSnap, "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"), got.toString)
  }

  test("snapshotDiff rejects an empty compare-column list") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Warehouse.snapshotDiff(df, df, "id", Seq.empty)
    }
  }
}
