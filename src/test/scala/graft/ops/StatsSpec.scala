package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantics of the histogram-prefix-rank order statistics (ops/Stats):
  * quantilesDisc against hand-computed percentile_disc ranks, aucExact
  * against the closed-form rank-sum on tiny labeled sets, medianMad
  * against hand medians, and the sketch's relative-error contract. */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("quantilesDisc picks the smallest value at rank ceil(p·n/100)") {
    // n=10 values 10..100: p50 → rank 5 → 50; p25 → rank ceil(2.5)=3
    // → 30; p99 → rank ceil(9.9)=10 → 100; p100 → rank 10 → 100
    val df = (1 to 10).map(i => ("a", i * 10L)).toDF("g", "v")
    val out = Stats.quantilesDisc(df, col("g"), col("v"), Seq(25, 50, 99))
      .collect().head
    assert(out.getAs[Long]("n") == 10L)
    assert(out.getAs[Long]("p25") == 30L)
    assert(out.getAs[Long]("p50") == 50L)
    assert(out.getAs[Long]("p99") == 100L)
  }

  test("quantilesDisc handles duplicated values and multiple groups") {
    // group b: [1,1,1,9] → n=4, p50 rank 2 → 1, p90 rank ceil(3.6)=4 → 9
    val df = (Seq(("a", 5L), ("a", 7L)) ++
      Seq(("b", 1L), ("b", 1L), ("b", 1L), ("b", 9L))).toDF("g", "v")
    val rows = Stats.quantilesDisc(df, col("g"), col("v"), Seq(50, 90))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("b").getAs[Long]("p50") == 1L)
    assert(rows("b").getAs[Long]("p90") == 9L)
    assert(rows("a").getAs[Long]("p50") == 5L) // rank ceil(1)=1 → 5
  }

  test("quantilesDisc keeps the NULL group (SQL GROUP BY semantics)") {
    // groupedCum's offset join must be null-safe — a plain equi-join
    // silently drops every row whose group key is NULL
    val df = Seq((null.asInstanceOf[String], 1L),
      (null.asInstanceOf[String], 3L), (null.asInstanceOf[String], 9L),
      ("a", 5L)).toDF("g", "v")
    val rows = Stats.quantilesDisc(df, col("g"), col("v"), Seq(50))
      .collect().map(r => Option(r.getString(0)) -> r).toMap
    assert(rows.contains(None), "NULL group must survive groupedCum")
    assert(rows(None).getAs[Long]("n") == 3L)
    assert(rows(None).getAs[Long]("p50") == 3L) // rank ceil(1.5)=2 → 3
    assert(rows(Some("a")).getAs[Long]("p50") == 5L)
  }

  test("quantilesCont interpolates ×100 exactly; f=0 coalesces the upper probe") {
    // n=4 values 10..40: p25 → pos 0.75 → 10·25+20·75 = 1750;
    // p50 → pos 1.5 → 20·50+30·50 = 2500; p100 → pos 3, f=0 → 4000
    val df = Seq(10L, 20L, 30L, 40L).map(("a", _)).toDF("g", "v")
    val r = Stats.quantilesCont(df, col("g"), col("v"), Seq(25, 50, 100))
      .collect().head
    assert(r.getAs[Long]("p25_x100") == 1750L)
    assert(r.getAs[Long]("p50_x100") == 2500L)
    assert(r.getAs[Long]("p100_x100") == 4000L)
  }

  test("ksTest2: identical samples D=0, disjoint samples D=1, one-sided raises") {
    val same = Seq((1L, true), (2L, true), (3L, true),
      (1L, false), (2L, false), (3L, false)).toDF("v", "y")
    val r0 = Stats.ksTest2(same, col("v"), col("y")).collect().head
    assert(r0.getAs[Long]("d_micro") == 0L && !r0.getAs[Boolean]("rejected"))
    val disjoint = Seq((1L, true), (2L, true),
      (10L, false), (20L, false)).toDF("v", "y")
    val r1 = Stats.ksTest2(disjoint, col("v"), col("y")).collect().head
    assert(r1.getAs[Long]("d_micro") == 1000000L)
    val oneSided = Seq((1L, true), (2L, true)).toDF("v", "y")
    val e = intercept[Exception] {
      Stats.ksTest2(oneSided, col("v"), col("y")).collect()
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("chi2Independence: exact independence scores 0, dependence scores > 0") {
    val indep = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
      ("b", "x"), ("b", "x"), ("b", "y"), ("b", "y")).toDF("r", "k")
    val r0 = Stats.chi2Independence(indep, col("r"), col("k")).collect().head
    assert(r0.getAs[Long]("chi2_nano") == 0L)
    assert(r0.getAs[Long]("dof") == 1L && r0.getAs[Long]("n_cells") == 4L)
    // fully dependent 2×2: chi2 = n = 8 → 8e9 nano
    val dep = Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("b", "y"))
    val r1 = Stats.chi2Independence(dep.toDF("r", "k"), col("r"), col("k"))
      .collect().head
    assert(r1.getAs[Long]("chi2_nano") == 8000000000L, r1.toString)
  }

  test("aucExact: perfect separation scores 1.0, inversion scores 0.0") {
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    assert(Stats.aucExact(perfect, col("s"), col("y"))
      .collect().head.getAs[Long]("auc_micro") == 1000000L)
    val inverted = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("s", "y")
    val r = Stats.aucExact(inverted, col("s"), col("y")).collect().head
    assert(r.getAs[Long]("auc_micro") == 0L)
    assert(r.getAs[Long]("gini_micro") == -1000000L)
  }

  test("aucExact: ties get midranks (all-tied scores → AUC exactly 0.5)") {
    val tied = Seq((7L, true), (7L, false), (7L, true), (7L, false))
      .toDF("s", "y")
    assert(Stats.aucExact(tied, col("s"), col("y"))
      .collect().head.getAs[Long]("auc_micro") == 500000L)
  }

  test("aucExact: hand-computed mixed case") {
    // scores: neg {1, 3}, pos {2, 4}: pairs (pos>neg): (2>1)=1, (2>3)=0,
    // (4>1)=1, (4>3)=1 → 3/4 = 0.75
    val df = Seq((1L, false), (3L, false), (2L, true), (4L, true))
      .toDF("s", "y")
    assert(Stats.aucExact(df, col("s"), col("y"))
      .collect().head.getAs[Long]("auc_micro") == 750000L)
  }

  test("aucExact raises on a single-class frame") {
    val oneClass = Seq((1L, true), (2L, true)).toDF("s", "y")
    val e = intercept[Exception] {
      Stats.aucExact(oneClass, col("s"), col("y")).collect()
    }
    assert(e.getMessage.contains("both classes"))
  }

  test("rangePrefixSums matches a sequential running sum across many partitions") {
    // 100 distinct keys through 32 range partitions — the prefix must
    // splice per-partition sums and offsets seamlessly at every boundary
    val df = (1 to 100).map(i => (i.toLong, i.toLong * 3)).toDF("k", "c")
    val out = Stats.rangePrefixSums(df, Seq("k"), Seq("c" -> "cum"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
    for (i <- 1 to 100)
      assert(out(i.toLong) == (1 to i).map(_ * 3L).sum, s"at k=$i")
  }

  test("rangePrefixSums is null-aware like window sum: all-null prefix stays null") {
    val df = Seq((1L, null.asInstanceOf[java.lang.Long]),
      (2L, null.asInstanceOf[java.lang.Long]),
      (3L, java.lang.Long.valueOf(5L)),
      (4L, null.asInstanceOf[java.lang.Long]),
      (5L, java.lang.Long.valueOf(7L))).toDF("k", "c")
    val out = Stats.rangePrefixSums(df, Seq("k"), Seq("c" -> "cum"), numParts = 4)
      .collect().map(r => r.getAs[Long]("k") ->
        Option(r.getAs[java.lang.Long]("cum"))).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L).contains(5L) && out(4L).contains(5L) && out(5L).contains(12L))
  }

  test("quantileNormalize keeps null-metric rows in the pooled ranking") {
    // nulls rank FIRST under orderBy-nulls-first; dropping them from the
    // pooled side would both lose their output rows and shift every
    // mapped-rank lookup that lands in the null band
    val df = Seq(
      ("a", 1L, null.asInstanceOf[java.lang.Long]),
      ("a", 2L, java.lang.Long.valueOf(10L)),
      ("a", 3L, java.lang.Long.valueOf(20L)),
      ("b", 4L, java.lang.Long.valueOf(5L)),
      ("b", 5L, java.lang.Long.valueOf(15L)),
      ("b", 6L, java.lang.Long.valueOf(25L))).toDF("g", "id", "v")
    val out = Stats.quantileNormalize(df, col("g"), col("id"), col("v"))
      .collect().map(r => r.getLong(1) ->
        Option(r.getAs[java.lang.Long]("norm_v"))).toMap
    assert(out.size == 6, s"rows lost: ${out.keySet}")
    // group a's null is its rank-1 value; group b's rank-1 (v=5) maps to
    // the same pooled rank-1 position — the pooled minimum, which is
    // the null value itself under nulls-first
    assert(out(1L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("aucExact/ksTest2/kaplanMeier plans contain no unpartitioned window") {
    // the round-6 verdict's scale finding: continuous value domains make
    // distinct cardinality ≈ row count, so a Window.orderBy(v) running
    // sum over the histogram collapses the frame to ONE partition. The
    // range-partitioned prefix construction must keep every Window node
    // partitioned — this pins the plan shape, not just the numbers.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    def unpartitioned(df: org.apache.spark.sql.DataFrame): Seq[LWindow] =
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
    val scored = (1 to 500).map(i => (i.toLong, i % 3 == 0)).toDF("s", "y")
    assert(unpartitioned(Stats.aucExact(scored, col("s"), col("y"))).isEmpty)
    assert(unpartitioned(Stats.ksTest2(scored, col("s"), col("y"))).isEmpty)
    val durations = (1 to 500).map(i => (i.toLong, i % 4 != 0)).toDF("t", "e")
    assert(unpartitioned(
      Analytics.kaplanMeier(durations, col("t"), col("e"))).isEmpty)
    // same discipline for the ntile machinery and quantile normalization
    // (continuous metrics make their histograms row-sized too)
    val vals = (1 to 400).map(i => (s"g${i % 3}", i.toLong, i.toLong * 7 % 399))
      .toDF("g", "id", "v")
    assert(unpartitioned(Stats.quantileNormalize(
      vals, col("g"), col("id"), col("v"))).isEmpty)
    assert(unpartitioned(Analytics.ntileExact(
      vals, col("v"), col("id"), 5, "q")).isEmpty)
    // round-8: the skyline front's strictly-preceding running max rides
    // the same construction (continuous x makes its histogram row-sized)
    val pts = (1 to 400).map(i => (i.toLong, (i * 37 % 401).toLong))
      .toDF("x", "y")
    assert(unpartitioned(Analytics.skyline2d(pts, "x", "y")).isEmpty)
  }

  test("rangePrefixMaxExclusive == exclusive window max, incl. null head and ties") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, java.lang.Long.valueOf(5L)),
      (2L, java.lang.Long.valueOf(3L)), (3L, null.asInstanceOf[java.lang.Long]),
      (4L, java.lang.Long.valueOf(9L)), (5L, java.lang.Long.valueOf(9L)),
      (6L, java.lang.Long.valueOf(1L))).toDF("k", "v")
    val want = df.withColumn("pm", max(col("v")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("pm")))
      .toMap
    val got = Stats.rangePrefixMaxExclusive(df, Seq("k"), Seq("v" -> "pm"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("pm")))
      .toMap
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got(1L).isEmpty, "first row's exclusive prefix must be null")
  }

  test("medianMadOutliers: hand-computed median, MAD, and outlier count") {
    // [10,12,14,16,100]: med=14 (rank 3), |d|=[4,2,0,2,86] → MAD=2
    // (sorted d: 0,2,2,4,86, rank 3 → 2); outliers d > 3·2=6 → {100}
    val df = Seq(10L, 12L, 14L, 16L, 100L).map(("a", _)).toDF("g", "v")
    val r = Stats.medianMadOutliers(df, col("g"), col("v"), k = 3)
      .collect().head
    assert(r.getAs[Long]("med") == 14L)
    assert(r.getAs[Long]("mad") == 2L)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Long]("n") == 5L)
  }

  test("sketchQuantiles honors the 1/subBuckets relative-error bound") {
    // log-spaced positives exercise many octaves; the estimate is a
    // bucket LOWER bound, so est ≤ exact and (exact−est)/exact < 1/m
    val vals = (1 to 400).map(i => ("a", (math.pow(1.04, i) * 7).toLong max 1L))
    val df = vals.toDF("g", "v")
    val sk = Stats.sketchQuantiles(df, col("g"), col("v"), subBuckets = 16)
      .collect().head
    val ex = Stats.quantilesDisc(df, col("g"), col("v"), Seq(50, 90, 99))
      .collect().head
    for ((e, s) <- Seq(("p50", "est_p50"), ("p90", "est_p90"), ("p99", "est_p99"))) {
      val exact = ex.getAs[Long](e).toDouble
      val est = sk.getAs[Long](s).toDouble
      assert(est <= exact, s"$s=$est above exact $e=$exact")
      assert((exact - est) / exact <= 1.0 / 16 + 1e-9,
        s"$s=$est misses $e=$exact beyond the 1/16 bound")
    }
  }

  test("sketchQuantiles rejects non-positive values and bad subBuckets") {
    val df = Seq(("a", 0L)).toDF("g", "v")
    val e = intercept[Exception] {
      Stats.sketchQuantiles(df, col("g"), col("v")).collect()
    }
    assert(e.getMessage.contains("positive"))
    val ok = Seq(("a", 5L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Stats.sketchQuantiles(ok, col("g"), col("v"), subBuckets = 12)
    }
  }

  test("decileLift: hand-computed gains table on a separable score") {
    // 10 rows scored 1..10, positives = scores 9,10: halves (buckets=2):
    // top half {10..6} has both positives → rate 0.4, lift 2.0,
    // capture 1.0; bottom half rate 0, lift 0, capture stays 1.0
    val df = (1 to 10).map(i => (i.toLong, i >= 9, i.toLong)).toDF("s", "y", "id")
    val rows = Stats.decileLift(df, col("s"), col("y"), col("id"), buckets = 2)
      .orderBy("decile").collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == Seq(1, 2))
    val top = rows.head
    assert(top.getAs[Long]("n_b") == 5L)
    assert(top.getAs[Long]("npos_b") == 2L)
    assert(top.getAs[Long]("rate_micro") == 400000L)
    assert(top.getAs[Long]("lift_micro") == 2000000L)
    assert(top.getAs[Long]("cum_capture_micro") == 1000000L)
    val bot = rows(1)
    assert(bot.getAs[Long]("npos_b") == 0L && bot.getAs[Long]("lift_micro") == 0L)
    assert(bot.getAs[Long]("cum_capture_micro") == 1000000L)
  }

  test("decileLift raises when no labels are positive") {
    val df = (1 to 4).map(i => (i.toLong, false, i.toLong)).toDF("s", "y", "id")
    val e = intercept[Exception] {
      Stats.decileLift(df, col("s"), col("y"), col("id"), buckets = 2).collect()
    }
    assert(e.getMessage.contains("positive label"))
  }

  test("corrMatrix: perfect / inverse / independent pairs, constant → null") {
    // y = 2x (corr 1), z = −x (corr −1), w constant (corr null)
    val df = (1 to 20).map(i => (i.toLong, 2L * i, -i.toLong, 7L))
      .toDF("x", "y", "z", "w")
    val got = Stats.corrMatrix(df, Seq("x" -> col("x"), "y" -> col("y"),
        "z" -> col("z"), "w" -> col("w")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(("x", "y")) == Some(1000000L))
    assert(got(("x", "z")) == Some(-1000000L))
    assert(got(("x", "w")) == None && got(("y", "w")) == None)
  }

  test("ksFromBuckets: identical sketches D=0, disjoint ranges D=1") {
    val a = Stats.sketchBuckets((1 to 100).map(i => ("g", i * 5L)).toDF("g", "v"),
      col("g"), col("v"), 16)
    val b = Stats.sketchBuckets((1 to 100).map(i => ("g", i * 5L + 100000L)).toDF("g", "v"),
      col("g"), col("v"), 16)
    assert(Stats.ksFromBuckets(a, a).collect().head.getAs[Long]("d_micro") == 0L)
    assert(Stats.ksFromBuckets(a, b).collect().head.getAs[Long]("d_micro") == 1000000L)
  }

  test("sketch buckets merge: union of shards equals the whole") {
    // mergeability = the groupBy is over (g, e, sub) counts — computing
    // the sketch over a union must equal the sketch over the whole
    val a = (1 to 200).map(i => ("a", i * 3L + 1))
    val whole = Stats.sketchQuantiles(a.toDF("g", "v"), col("g"), col("v"))
      .collect().head
    val shardsUnion = Stats.sketchQuantiles(
      a.take(67).toDF("g", "v").union(a.drop(67).toDF("g", "v")),
      col("g"), col("v")).collect().head
    assert(whole.getAs[Long]("est_p50") == shardsUnion.getAs[Long]("est_p50"))
    assert(whole.getAs[Long]("est_p99") == shardsUnion.getAs[Long]("est_p99"))
  }
}
