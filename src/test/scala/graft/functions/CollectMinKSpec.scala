package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CollectMinKSpec extends SparkTestBase {
  import spark.implicits._

  test("MinKBuffer keeps exactly the k smallest pairs, buffer never exceeds k") {
    val rnd = new Random(7)
    val k = 16
    val buf = new MinKBuffer(k)
    val pairs = Seq.fill(1_000_000)((rnd.nextLong(), rnd.nextLong()))
    pairs.foreach { case (id, v) =>
      buf.add(id, v)
      assert(buf.size <= k) // bounded at every step, not just at eval
    }
    assert(buf.n == 1_000_000L)
    assert(buf.sorted.toSeq == pairs.sorted.take(k))
  }

  test("MinKBuffer merge equals single-buffer result regardless of split") {
    val rnd = new Random(11)
    val k = 8
    val pairs = Seq.fill(500)((rnd.nextInt(100).toLong, rnd.nextLong()))
    val whole = new MinKBuffer(k)
    pairs.foreach { case (id, v) => whole.add(id, v) }
    val (l, r) = pairs.splitAt(137)
    val left = new MinKBuffer(k)
    l.foreach { case (id, v) => left.add(id, v) }
    val right = new MinKBuffer(k)
    r.foreach { case (id, v) => right.add(id, v) }
    // merge the way the aggregate does: insert (no recount) + add counts
    (0 until right.size).foreach(i => left.insert(right.ids(i), right.vs(i)))
    left.n += right.n
    assert(left.sorted.toSeq == whole.sorted.toSeq)
    assert(left.n == whole.n)
  }

  test("collectMinK over a DataFrame: k smallest ascending, n counts all rows") {
    val df = (1 to 300).map(i => ("g", 301L - i, 1000L + i)).toDF("g", "id", "v")
      .repartition(7) // force partial buffers + merges across partitions
    val row = df.groupBy("g").agg(collectMinK(col("id"), col("v"), 5).as("r"))
      .select(col("r.items").as("items"), col("r.n").as("n")).head()
    val items = row.getSeq[org.apache.spark.sql.Row](0)
    assert(items.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L, 5L))
    // payload rides with its id: id i carried v = 1000 + (301 - i)
    assert(items.map(_.getLong(1)) == Seq(1300L, 1299L, 1298L, 1297L, 1296L))
    assert(row.getLong(1) == 300L)
  }

  test("collectMinK survives sort-based aggregation fallback (serde path)") {
    // ObjectHashAggregateExec falls back to sort-based aggregation past
    // the fallback threshold, round-tripping every buffer through
    // serialize/deserialize — force threshold 1 so that path actually runs
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "1")
    try {
      val df = (1 to 500).map(i => (s"g${i % 40}", i.toLong, 10000L - i))
        .toDF("g", "id", "v").repartition(7)
      val rows = df.groupBy("g").agg(collectMinK(col("id"), col("v"), 3).as("r"))
        .select(col("g"), col("r.items").as("items"), col("r.n").as("n"))
        .collect()
      assert(rows.length == 40)
      rows.foreach { r =>
        val g = r.getString(0)
        val members = (1 to 500).filter(i => s"g${i % 40}" == g)
        val want = members.map(i => (i.toLong, 10000L - i)).sorted.take(3)
        val got = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1)))
        assert(got == want, s"group $g: $got != $want")
        assert(r.getLong(2) == members.size.toLong)
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("collectMinK accepts int columns (cast to long in the wrapper)") {
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v")
    val row = df.agg(collectMinK(col("id"), col("v"), 2).as("r"))
      .select(col("r.items"), col("r.n")).head()
    assert(row.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0)) == Seq(1L, 2L))
    assert(row.getLong(1) == 3L)
  }
}
