package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Phrase search adjacency semantics, KMV join estimation degradation,
  * and modularity hand-math. */
class PhraseKmvModularitySpec extends SparkTestBase {
  import spark.implicits._

  test("phrase search matches adjacency and order, not bags of words") {
    val docs = Seq(
      (1L, "the hash join wins"),       // match
      (2L, "join hash reversed"),       // reversed — no match
      (3L, "hash then join apart"),     // not adjacent — no match
      (4L, "hash join and hash join")   // two matches
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", "hash join")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 4L -> 2L))
  }

  test("phrase search handles 3-term phrases and case folding") {
    val docs = Seq(
      (1L, "A Hash Join Works"), (2L, "a hash works join")
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", "hash join works")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L))
  }

  test("phrase search: overlapping occurrences count each start position") {
    val docs = Seq((1L, "go go go")).toDF("doc_id", "text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", "go go")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L))
  }

  test("kmv join estimate degrades to exact when both sides fit in k") {
    val a = (1L to 50L).toDF("k")
    val b = (26L to 80L).toDF("k")
    val r = Stats.kmvJoinEstimate(a, b, col("k"), col("k"), k = 128)
      .collect().head
    assert(r.getAs[Long]("n_a") === 50L && r.getAs[Long]("n_b") === 55L)
    assert(r.getAs[Long]("n_inter") === 25L)
    assert(r.getAs[Long]("est_a") === 50L)
    assert(r.getAs[Long]("est_b") === 55L)
    assert(r.getAs[Long]("est_inter") === 25L)
  }

  test("kmv join estimate is sane in the sketched regime") {
    val a = (1L to 3000L).toDF("k")
    val b = (1500L to 4500L).toDF("k") // true intersection 1501
    val r = Stats.kmvJoinEstimate(a, b, col("k"), col("k"), k = 128)
      .collect().head
    assert(r.getAs[Long]("n_inter") === 1501L)
    val est = r.getAs[Long]("est_inter")
    assert(est > 700L && est < 3000L, s"est_inter $est implausible for 1501")
    val estA = r.getAs[Long]("est_a")
    assert(estA > 2000L && estA < 4500L, s"est_a $estA implausible for 3000")
  }

  test("kmv join estimate: disjoint sides estimate zero intersection") {
    val a = (1L to 1000L).toDF("k")
    val b = (100001L to 101000L).toDF("k")
    val r = Stats.kmvJoinEstimate(a, b, col("k"), col("k"), k = 128)
      .collect().head
    assert(r.getAs[Long]("n_inter") === 0L)
    // k_int can only come from hashes present in BOTH sketches
    assert(r.getAs[Long]("k_int") === 0L)
    assert(r.getAs[Long]("est_inter") === 0L)
  }

  test("modularity hand-math: two triangles joined by one bridge") {
    // communities {1,2,3} and {4,5,6}; m = 7 edges; intra 3+3, d_c 7+7.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val comm = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("node", "c")
    val out = Graph.modularity(edges, "a", "b", comm, "node", "c")
      .orderBy("community").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("e_c") === 3L)
      assert(r.getAs[Long]("d_c") === 7L)
      assert(r.getAs[Long]("intra_micro") === 3L * 1000000L / 7L)
      // (7*7*1e6) div (4*49) = 49e6 div 196
      assert(r.getAs[Long]("degsq_micro") === 49000000L / 196L)
    }
  }

  test("modularity: duplicate and reversed edges collapse; self-loops drop") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L)).toDF("a", "b")
    val comm = Seq((1L, "x"), (2L, "x")).toDF("node", "c")
    val r = Graph.modularity(edges, "a", "b", comm, "node", "c").collect().head
    assert(r.getAs[Long]("e_c") === 1L && r.getAs[Long]("d_c") === 2L)
  }
}
