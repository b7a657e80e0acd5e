package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("as-of join: latest right row at or before each left timestamp") {
    val quotes = Seq(
      ("A", ts("2024-01-01"), 100.0),
      ("A", ts("2024-01-05"), 110.0),
      ("A", ts("2024-01-10"), 120.0),
      ("B", ts("2024-01-03"), 7.0))
      .toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", ts("2024-01-01"), 1L), // equal ts: non-strict matches 100
      ("A", ts("2024-01-07"), 2L), // between quotes: 110
      ("A", ts("2024-01-20"), 3L), // after all: 120
      ("B", ts("2024-01-02"), 4L), // before any quote: null
      ("C", ts("2024-01-02"), 5L)) // key with no right rows: null
      .toDF("sym", "tts", "trade_id")

    val out = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts")
      .orderBy("trade_id").collect()
    val prices = out.map(r => Option(r.getAs[java.lang.Double]("price")).map(_.toDouble))
    assert(prices.toSeq == Seq(Some(100.0), Some(110.0), Some(120.0), None, None))
  }

  test("strict as-of excludes equal timestamps") {
    val quotes = Seq(("A", ts("2024-01-05"), 110.0)).toDF("sym", "qts", "price")
    val trades = Seq(("A", ts("2024-01-05"), 1L)).toDF("sym", "tts", "trade_id")
    val nonStrict = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts").head
    val strict = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", strict = true).head
    assert(nonStrict.getAs[java.lang.Double]("price") == 110.0)
    assert(strict.getAs[java.lang.Double]("price") == null)
  }
}
