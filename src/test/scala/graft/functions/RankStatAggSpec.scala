package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Analytics, Stats}

/** The SQL-registered rank-statistic aggregates must be bit-identical to
  * their frame-level ops — same integer arithmetic, same tie and
  * censoring semantics — so `spark.sql` users and pipeline authors get
  * interchangeable numbers. */
class RankStatAggSpec extends SparkTestBase {
  import spark.implicits._

  private def installed = { graft.GraftExtensions.install(spark); spark }

  test("auc_micro agg == Stats.aucExact on a tied, mixed frame") {
    val rows = Seq(
      (1L, false), (3L, false), (2L, true), (4L, true),
      (4L, false), (4L, true), (2L, false), (7L, true), (7L, false))
    val df = rows.toDF("s", "y")
    val op = Stats.aucExact(df, col("s"), col("y")).collect().head
    df.createOrReplaceTempView("scored")
    val agg = installed.sql(
      "SELECT auc_micro(s, y) AS a FROM scored").collect().head.getStruct(0)
    assert(agg.getAs[Long]("n") == op.getAs[Long]("n"))
    assert(agg.getAs[Long]("n_pos") == op.getAs[Long]("n_pos"))
    assert(agg.getAs[Long]("auc_micro") == op.getAs[Long]("auc_micro"))
    assert(agg.getAs[Long]("gini_micro") == op.getAs[Long]("gini_micro"))
  }

  test("auc_micro agg raises on a single-class group") {
    Seq((1L, true), (2L, true)).toDF("s", "y").createOrReplaceTempView("one_class")
    val e = intercept[Exception](
      installed.sql("SELECT auc_micro(s, y) FROM one_class").collect())
    assert(e.getMessage.contains("both classes") ||
      Option(e.getCause).exists(_.getMessage.contains("both classes")))
  }

  test("auc_micro rejects a double score column at ANALYSIS time") {
    // the common call shape auc_micro(double_score, label) used to blow
    // up mid-query from update(); checkInputDataTypes must fail the
    // plan before execution, pointing at an explicit cast
    Seq((0.9, true), (0.1, false)).toDF("s", "y")
      .createOrReplaceTempView("dbl_scored")
    val e = intercept[Exception](
      installed.sql("SELECT auc_micro(s, y) FROM dbl_scored").collect())
    assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      e.getMessage.toLowerCase.contains("data type mismatch") ||
      e.getMessage.contains("INTEGRAL"),
      s"expected an analysis-time type error, got $e")
    // and the explicit-cast spelling the error suggests works
    val ok = installed.sql(
      "SELECT auc_micro(CAST(s * 1000000 AS BIGINT), y) AS a FROM dbl_scored")
      .collect().head.getStruct(0)
    assert(ok.getAs[Long]("auc_micro") == 1000000L)
  }

  test("kaplan_meier agg == Analytics.kaplanMeier incl. censoring and all-die tail") {
    // durations with ties, censored rows, and a final time where every
    // remaining subject dies (d == n_risk → surv 0, lnS of prior times)
    val rows = Seq(
      (2L, true), (2L, true), (2L, false), (5L, true), (5L, false),
      (8L, false), (9L, true), (9L, true))
    val df = rows.toDF("dur", "ev")
    val op = Analytics.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy(col("t")).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), Option(r.getAs[java.lang.Long]("lnS_nano")),
        r.getAs[Long]("surv_micro")))
    df.createOrReplaceTempView("surv")
    val agg = installed.sql(
      "SELECT explode(kaplan_meier(dur, ev)) AS e FROM surv")
      .select("e.*").orderBy(col("t")).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), Option(r.getAs[java.lang.Long]("lnS_nano")),
        r.getAs[Long]("surv_micro")))
    assert(agg.toSeq == op.toSeq, s"\nagg: ${agg.mkString(", ")}\nop:  ${op.mkString(", ")}")
  }

  test("kaplan_meier agg works per group and partial-merges across partitions") {
    val rows = (1 to 400).map(i =>
      (s"g${i % 3}", (i % 17).toLong + 1, i % 4 != 0))
    val df = rows.toDF("g", "dur", "ev").repartition(13)
    df.createOrReplaceTempView("surv_g")
    val agg = installed.sql(
      """SELECT g, explode(kaplan_meier(dur, ev)) AS e FROM surv_g GROUP BY g""")
      .select(col("g"), col("e.t"), col("e.surv_micro"))
      .orderBy(col("g"), col("t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // op result per group, computed group by group
    val expected = Seq("g0", "g1", "g2").flatMap { g =>
      Analytics.kaplanMeier(
        df.filter(col("g") === g), col("dur"), col("ev"))
        .orderBy(col("t")).collect()
        .map(r => (g, r.getAs[Long]("t"), r.getAs[Long]("surv_micro")))
    }
    assert(agg.toSeq == expected)
  }
}
