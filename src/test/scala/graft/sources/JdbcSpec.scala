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

  test("ensureKeyIndex rethrows non-duplicate errors (bad table name)") {
    // swallowing EVERY SQLException silently left the upsert unindexed
    // (O(n²) full scans); only the already-exists SQLStates are benign
    val e = intercept[Exception] {
      Jdbc.ensureKeyIndex(url, "no_such_table_xyz", Seq("id"))
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[java.sql.SQLException]))
  }

  test("PK constraint pins the documented duplicate-key abort + clean sequential path") {
    // upsertByKey's contract: two same-key rows in one batch (the
    // in-partition equivalent of two writers racing an ABSENT key) both
    // see UPDATE count 0 and both INSERT — a PRIMARY KEY then aborts
    // the partition instead of silently duplicating. Pin both halves.
    val t = "pk_contract"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $t ("id" BIGINT PRIMARY KEY, "v" VARCHAR(10))"""): Unit
      finally st.close()
    } finally conn.close()

    // clean sequential-writer path: insert, then update, no duplicates
    Jdbc.upsertByKey(Seq((7L, "a")).toDF("id", "v"), url, t, Seq("id"))
    Jdbc.upsertByKey(Seq((7L, "b")).toDF("id", "v"), url, t, Seq("id"))
    val after = Jdbc.read(spark, url, t).collect()
    assert(after.length == 1 && after.head.getString(1) == "b")

    // contract-violating frame: duplicate keys in ONE batch → PK abort
    val dup = Seq((8L, "x"), (8L, "y")).toDF("id", "v").coalesce(1)
    val e = intercept[Exception] {
      Jdbc.upsertByKey(dup, url, t, Seq("id"), batchSize = 10)
    }
    // walk BOTH getCause and SQLException.getNextException — Derby
    // reports batch failures as a BatchUpdateException whose 23505
    // detail rides the next-exception chain
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil
      else t :: (chain(t.getCause) ++ (t match {
        case s: java.sql.SQLException => chain(s.getNextException)
        case _ => Nil
      }))
    assert(chain(e).exists { c =>
      c.isInstanceOf[java.sql.SQLException] &&
        Option(c.asInstanceOf[java.sql.SQLException].getSQLState)
          .exists(_.startsWith("23")) // integrity-constraint violation class
    }, s"expected a 23xxx constraint violation in the cause chain of $e")
    // the aborted partition rolled back atomically: no partial write
    assert(Jdbc.read(spark, url, t)
      .filter(col("id") === 8L).count() == 0L)
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
