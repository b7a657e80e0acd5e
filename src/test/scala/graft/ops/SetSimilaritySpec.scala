package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exact prefix-filtered set-similarity join: hand-computable Jaccard
  * cases, losslessness vs a brute-force twin, and pruning behavior. */
class SetSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toDF("id", "token")

  test("finds exactly the pairs at/above tau with exact integer jaccard") {
    // A={a,b,c,d}, B={a,b,c,e}: J = 3/5 = 0.6 — ON the threshold.
    // C={x,y}: no qualifying partner.
    val t = toks(
      1L -> "a", 1L -> "b", 1L -> "c", 1L -> "d",
      2L -> "a", 2L -> "b", 2L -> "c", 2L -> "e",
      3L -> "x", 3L -> "y")
    val out = SetSimilarity.jaccardJoinExact(t, "id", "token", 600000L)
      .orderBy("a_id", "b_id").collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) === (1L, 2L))
    assert(r.getAs[Long]("inter") === 3L)
    assert(r.getAs[Long]("uni") === 5L)
    assert(r.getAs[Long]("jac_micro") === 600000L)
  }

  test("pair just below tau is excluded") {
    // J = 2/4 = 0.5 < 0.6
    val t = toks(1L -> "a", 1L -> "b", 1L -> "c",
      2L -> "a", 2L -> "b", 2L -> "d")
    assert(SetSimilarity.jaccardJoinExact(t, "id", "token", 600000L)
      .count() === 0L)
  }

  test("duplicate input rows do not inflate intersections") {
    val t = toks(1L -> "a", 1L -> "a", 1L -> "b",
      2L -> "a", 2L -> "b", 2L -> "b")
    val r = SetSimilarity.jaccardJoinExact(t, "id", "token", 500000L)
      .collect().head
    assert(r.getAs[Long]("inter") === 2L && r.getAs[Long]("uni") === 2L)
    assert(r.getAs[Long]("jac_micro") === 1000000L)
  }

  test("lossless vs brute force on a randomized corpus") {
    // Deterministic pseudo-random sets: doc i holds tokens
    // {md5-derived} over a 40-token vocabulary — plus planted twins.
    val base = (1L to 60L).flatMap { i =>
      (1 to 12).map { j =>
        val tok = math.abs((i * 2654435761L + j * 40503L) % 40)
        (i, s"t$tok")
      }
    }
    val twins = base.filter(_._1 <= 10).map { case (i, t) => (i + 100L, t) }
    val t = toks((base ++ twins): _*)
    val fast = SetSimilarity.jaccardJoinExact(t, "id", "token", 700000L)
      .select("a_id", "b_id", "inter", "uni").as[(Long, Long, Long, Long)]
      .collect().toSet
    // brute force: every token-sharing pair, exact sets via groupBy
    val sets = (base ++ twins).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val slow = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      uni = (sets(a) | sets(b)).size
      if inter.toLong * 1000000L >= 700000L * uni
    } yield (a, b, inter.toLong, uni.toLong)).toSet
    assert(fast === slow)
    assert(fast.nonEmpty, "planted twins must qualify")
  }

  test("shingleTokens builds order-sensitive word n-grams") {
    val df = Seq((1L, "a b c d"), (2L, "d c b a")).toDF("doc_id", "text")
    val t = SetSimilarity.shingleTokens(df, "doc_id", "text", n = 3)
      .as[(Long, String)].collect().toSet
    assert(t === Set((1L, "a b c"), (1L, "b c d"), (2L, "d c b"), (2L, "c b a")))
    // same word SET, zero shared shingles
    assert(SetSimilarity.jaccardJoinExact(
      SetSimilarity.shingleTokens(df, "doc_id", "text", 3),
      "id", "token", 100000L).count() === 0L)
  }

  test("short texts yield no shingles rather than failing") {
    val df = Seq((1L, "one two"), (2L, "")).toDF("doc_id", "text")
    assert(SetSimilarity.shingleTokens(df, "doc_id", "text", 3).count() === 0L)
  }

  test("containment: a subset is found inside its superset, not vice versa") {
    // A = {a,b,c} ⊂ B = {a,b,c,d,e,f}: C(A→B)=1, C(B→A)=0.5
    val t = toks(1L -> "a", 1L -> "b", 1L -> "c",
      2L -> "a", 2L -> "b", 2L -> "c", 2L -> "d", 2L -> "e", 2L -> "f")
    val out = SetSimilarity.containmentJoinExact(t, "id", "token", 900000L)
      .select("a_id", "b_id", "cont_micro").as[(Long, Long, Long)]
      .collect().toSet
    assert(out === Set((1L, 2L, 1000000L)))
  }

  test("containment: lossless vs brute force on a randomized corpus") {
    val base = (1L to 40L).flatMap { i =>
      (1 to 10).map { j =>
        (i, s"t${math.abs((i * 2654435761L + j * 40503L) % 60)}")
      }
    }
    // planted fragments: first 4 tokens of docs 1..8 as new ids
    val sets = base.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val frags = (1L to 8L).flatMap(i => sets(i).take(4).map(t => (i + 100L, t)))
    val all = base ++ frags
    val fast = SetSimilarity.containmentJoinExact(
      toks(all: _*), "id", "token", 800000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val fullSets = all.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val slow = (for {
      a <- fullSets.keys; b <- fullSets.keys if a != b
      inter = (fullSets(a) & fullSets(b)).size
      if inter.toLong * 1000000L >= 800000L * fullSets(a).size
    } yield (a, b)).toSet
    assert(fast === slow)
    assert(fast.exists { case (a, b) => a > 100L && b == a - 100L },
      "planted fragments must be found in their originals")
  }

  test("invalid tau is rejected loudly") {
    val t = toks(1L -> "a")
    intercept[IllegalArgumentException] {
      SetSimilarity.jaccardJoinExact(t, "id", "token", 0L)
    }
    intercept[IllegalArgumentException] {
      SetSimilarity.jaccardJoinExact(t, "id", "token", 1000001L)
    }
  }

  test("sortedLongIntersectCount: differential vs array_intersect on " +
    "random sorted sets, including empty/disjoint/identical") {
    // the round-14 verify kernel (per-candidate merge-count over
    // pre-sorted arrays) must count exactly what array_intersect counts
    // on element-distinct sorted inputs — the property jaccardJoinExact
    // and containmentJoinExact now rest on
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(421)
    val rows = (0 until 200).map { i =>
      def set() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong)
        .distinct.sorted
      (i.toLong, set(), set())
    } ++ Seq(
      (1000L, Seq.empty[Long], Seq(1L, 2L)), // empty side
      (1001L, Seq(1L, 3L), Seq(2L, 4L)),     // disjoint
      (1002L, Seq(5L, 6L, 7L), Seq(5L, 6L, 7L))) // identical
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
        graft.functions.sortedLongIntersectCount(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(bad === 0L)
  }
}
