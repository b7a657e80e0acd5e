package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** KMV distinct sketch, Kneser–Ney scoring, and stratified sampling:
  * exactness, mergeability, and allocation invariants. */
class SketchSampleSpec extends SparkTestBase {
  import spark.implicits._

  test("kmv: group with fewer than k distinct keys reports the exact count") {
    val df = Seq.tabulate(30)(i => ("a", i.toLong)).toDF("g", "key")
    val r = Stats.kmvDistinct(df, col("g"), col("key"), k = 64).collect().head
    assert(r.getAs[Long]("n_hashes") === 30L)
    assert(r.getAs[Long]("n_kept") === 30L)
    assert(r.getAs[Long]("h_k") === 0L)
    assert(r.getAs[Long]("est_distinct") === 30L)
  }

  test("kmv: estimator branch lands within the documented error band") {
    // 2000 distinct keys, k = 64 → ~13% relative error expected
    val df = Seq.tabulate(2000)(i => ("a", i.toLong)).toDF("g", "key")
    val r = Stats.kmvDistinct(df, col("g"), col("key"), k = 64).collect().head
    assert(r.getAs[Long]("n_hashes") === 2000L)
    val est = r.getAs[Long]("est_distinct")
    assert(est > 1000L && est < 4000L, s"estimate $est implausible for 2000")
  }

  test("kmv: merging partition sketches equals the direct sketch") {
    // min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)): compute the sketch on
    // two halves, re-sketch the union of the KEPT hashes, compare h_k.
    val all = Seq.tabulate(500)(i => ("a", i.toLong)).toDF("g", "key")
    val hv = all.select(col("g"),
      conv(substring(md5(concat(lit("kmv:"), col("key").cast("string"))), 1, 15),
        16, 10).cast("long").as("hv")).distinct()
    val direct = hv.groupBy("g")
      .agg(graft.functions.collectMinK(col("hv"), lit(0L), 64).as("mk"))
      .select(element_at(col("mk.items"), 64).getField("id")).as[Long].head()
    val halves = Seq(
      hv.filter(col("hv") % 2 === 0), hv.filter(col("hv") % 2 =!= 0))
    val kept = halves.map(_.groupBy("g")
        .agg(graft.functions.collectMinK(col("hv"), lit(0L), 64).as("mk"))
        .select(col("g"), explode(col("mk.items.id")).as("hv")))
      .reduce(_ unionByName _)
    val merged = kept.groupBy("g")
      .agg(graft.functions.collectMinK(col("hv"), lit(0L), 64).as("mk"))
      .select(element_at(col("mk.items"), 64).getField("id")).as[Long].head()
    assert(direct === merged)
  }

  test("kmv: duplicate keys do not move the sketch") {
    val once = Seq.tabulate(200)(i => ("a", i.toLong)).toDF("g", "key")
    val dup = once.unionByName(once).unionByName(once)
    val a = Stats.kmvDistinct(once, col("g"), col("key"), 64).collect().head
    val b = Stats.kmvDistinct(dup, col("g"), col("key"), 64).collect().head
    assert(a.getAs[Long]("h_k") === b.getAs[Long]("h_k"))
    assert(a.getAs[Long]("est_distinct") === b.getAs[Long]("est_distinct"))
  }

  test("kmv: invalid k rejected loudly") {
    val df = Seq(("a", 1L)).toDF("g", "key")
    intercept[IllegalArgumentException] {
      Stats.kmvDistinct(df, col("g"), col("key"), 1)
    }
  }

  test("kneser-ney: hand-computed probabilities on a three-bigram model") {
    // Reference: "a b a b a c" → bigrams: (a,b)x2, (b,a)x2, (a,c)x1.
    // c1(a)=3, n1fwd(a)=2; c1(b)=2, n1fwd(b)=1. cont(b)=1, cont(a)=1,
    // cont(c)=1. B=3 distinct bigrams, V=3, bv=6.
    val ref = Seq((1L, "a b a b a c")).toDF("id", "text")
    // scored doc: "a b" → seen context a: num = (4*2-3)*6 + 3*2*(1+1)
    //   = 30+12 = 42; den = 4*3*6 = 72 → P = 42/72
    val doc = Seq((7L, "a b")).toDF("id", "text")
    val out = Corpus.knBigramScore(doc, ref, "id", "text").collect().head
    val expected = math.floor(-math.log(42.0 / 72.0) * 1e6 + 0.5) / 1e6
    assert(out.getAs[Long]("n_bigrams") === 1L)
    assert(math.abs(out.getAs[Double]("avg_nll") - expected) < 1e-9)
  }

  test("kneser-ney: unseen context backs off to the continuation distribution") {
    val ref = Seq((1L, "a b a b a c")).toDF("id", "text")
    // "z a": context z unseen → P = (cont(a)+1)/bv = 2/6
    val doc = Seq((7L, "z a")).toDF("id", "text")
    val out = Corpus.knBigramScore(doc, ref, "id", "text").collect().head
    val expected = math.floor(-math.log(2.0 / 6.0) * 1e6 + 0.5) / 1e6
    assert(math.abs(out.getAs[Double]("avg_nll") - expected) < 1e-9)
  }

  test("kneser-ney: empty reference raises loudly") {
    val ref = Seq.empty[(Long, String)].toDF("id", "text")
    val doc = Seq((1L, "a b")).toDF("id", "text")
    val e = intercept[Exception] {
      Corpus.knBigramScore(doc, ref, "id", "text").collect()
    }
    assert(e.getMessage.contains("empty reference")
      || e.getCause != null && e.getCause.getMessage.contains("empty reference"))
  }

  test("stratified sample: total is hit exactly and strata stay proportional") {
    val df = (1L to 300L).map(i => (s"s${i % 3}", i)).toDF("stratum", "key")
    val out = Corpus.stratifiedSample(df, col("stratum"), col("key"), 30L)
    assert(out.count() === 30L)
    val bySeg = out.groupBy("stratum").count().as[(String, Long)]
      .collect().toMap
    assert(bySeg.values.forall(_ == 10L), s"expected 10/10/10, got $bySeg")
  }

  test("stratified sample: uneven strata get largest-remainder rounding, sum exact") {
    // sizes 5, 6, 7 (total 18), budget 10: quotas 2.78, 3.33, 3.89
    val df = ((1L to 5L).map(("a", _)) ++ (1L to 6L).map(("b", _))
      ++ (1L to 7L).map(("c", _))).toDF("stratum", "key")
    val out = Corpus.stratifiedSample(df, col("stratum"), col("key"), 10L)
    val bySeg = out.groupBy("stratum").count().as[(String, Long)]
      .collect().toMap
    assert(bySeg.values.sum === 10L)
    assert(bySeg("a") === 3L && bySeg("b") === 3L && bySeg("c") === 4L)
  }

  test("stratified sample is deterministic across runs") {
    val df = (1L to 100L).map(i => (s"s${i % 2}", i)).toDF("stratum", "key")
    val a = Corpus.stratifiedSample(df, col("stratum"), col("key"), 20L)
      .as[(String, Long)].collect().toSet
    val b = Corpus.stratifiedSample(df.repartition(7), col("stratum"),
      col("key"), 20L).as[(String, Long)].collect().toSet
    assert(a === b)
  }
}
