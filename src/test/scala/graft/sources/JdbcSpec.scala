package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** JDBC source/sink e2e against embedded Derby (in-memory): auto-create,
  * batched keyed upsert (the reference's ON CONFLICT semantics,
  * set-oriented), idempotent re-run, and range-partitioned parallel
  * read-back. */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  // fresh in-memory db per suite run — Derby memory: databases persist
  // for the JVM lifetime, so a fixed name would leak state across runs
  private val url =
    s"jdbc:derby:memory:graftdb${System.nanoTime()};create=true"

  test("auto-create + upsert + merge + idempotent re-run + partitioned read") {
    val t = "people_jdbc"
    val batch1 = Seq((1L, "alice", 30), (2L, "bob", 40), (3L, "carol", 50))
      .toDF("id", "name", "age")
    Jdbc.createTableIfMissing(batch1, url, t)
    Jdbc.ensureKeyIndex(url, t, Seq("id"))
    Jdbc.ensureKeyIndex(url, t, Seq("id")) // idempotent re-create
    Jdbc.upsertByKey(batch1, url, t, Seq("id"), batchSize = 2)
    assert(Jdbc.read(spark, url, t).count() == 3)

    // overlap: id 2 updated, id 4 inserted
    val batch2 = Seq((2L, "bobby", 41), (4L, "dave", 60)).toDF("id", "name", "age")
    Jdbc.upsertByKey(batch2, url, t, Seq("id"))
    val afterMerge = Jdbc.read(spark, url, t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(afterMerge == Map(
      1L -> ("alice", 30), 2L -> ("bobby", 41),
      3L -> ("carol", 50), 4L -> ("dave", 60)))

    // idempotent re-run of the same batch
    Jdbc.upsertByKey(batch2, url, t, Seq("id"))
    assert(Jdbc.read(spark, url, t).count() == 4)

    // range-partitioned parallel read: same rows, multiple bounded tasks
    // (Spark clamps the partition count to the id range's stride)
    val part = Jdbc.readPartitioned(spark, url, t, "id", 1L, 4L, 4)
    assert(part.rdd.getNumPartitions > 1)
    assert(part.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("upsertByKey input validation") {
    val df = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException](
      Jdbc.upsertByKey(df, url, "t", Seq("missing")))
    intercept[IllegalArgumentException](
      Jdbc.upsertByKey(df.select("id"), url, "t", Seq("id")))
  }

  test("composite-key upsert updates on the full key only") {
    val t = "edges_jdbc"
    val b1 = Seq(("p1", "a1", "x"), ("p1", "a2", "y")).toDF("pid", "aid", "rel")
    Jdbc.createTableIfMissing(b1, url, t)
    Jdbc.upsertByKey(b1, url, t, Seq("pid", "aid"))
    // same pid, different aid -> insert; same (pid, aid) -> update
    val b2 = Seq(("p1", "a2", "z"), ("p1", "a3", "w")).toDF("pid", "aid", "rel")
    Jdbc.upsertByKey(b2, url, t, Seq("pid", "aid"))
    val out = Jdbc.read(spark, url, t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(out == Map(("p1", "a1") -> "x", ("p1", "a2") -> "z", ("p1", "a3") -> "w"))
  }
}
