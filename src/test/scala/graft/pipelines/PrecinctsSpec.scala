package graft.pipelines

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Guards

class PrecinctsSpec extends SparkTestBase {
  import spark.implicits._

  test("precincts: GeoJSONL -> uuid5 ids, counts, centroid") {
    val dir = Files.createTempDirectory("precincts").toString
    Files.writeString(Paths.get(dir, "precincts.jsonl"),
      """{"type":"Feature","properties":{"GEOID":"42-XYZ-001","state":"PA","votes_dem":120,"votes_rep":80,"votes_total":210,"pct_dem_lead":0.19},"geometry":{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}}
        |{"type":"Feature","properties":{"GEOID":"42-XYZ-002","state":"PA","votes_dem":50,"votes_rep":90,"votes_total":145,"pct_dem_lead":-0.27},"geometry":{"type":"MultiPolygon","coordinates":[[[[10,10],[12,10],[12,12],[10,12],[10,10]]]]}}
        |""".stripMargin)
    val df = Precincts.fromGeoJsonl(spark, s"$dir/precincts.jsonl")
    val rows = df.orderBy("geoid").collect()
    assert(rows.length == 2)
    // uuid5(NAMESPACE_OID, "42-XYZ-001") — golden from CPython
    assert(rows(0).getAs[String]("id").startsWith("ocd-precinct/"))
    assert(rows(0).getAs[Long]("votes_dem") == 120L)
    assert(rows(0).getAs[Double]("centroid_lon") == 1.0)
    assert(rows(1).getAs[Double]("centroid_lat") == 11.0)
  }

  test("vote tallies recompute counts from the nested votes array") {
    val events = Seq(
      ("e1", Seq(("yes", "A"), ("yes", "B"), ("no", "C"))),
      ("e2", Seq(("no", "A"))))
      .toDF("id", "raw")
      .withColumn("votes", expr("transform(raw, v -> named_struct('option', v._1, 'voter_name', v._2))"))
    val tallies = Precincts.voteTallies(events)
      .orderBy("vote_event_id", "option").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(tallies == Seq(("e1", "no", 1L), ("e1", "yes", 2L), ("e2", "no", 1L)))
  }

  test("guards: failIfAny raises with offender; observed counts violations in-pass") {
    val df = Seq((1, "ok"), (2, "bad"), (3, "ok")).toDF("id", "status")
    Guards.failIfAny(df, col("status") === "nope", "no offenders expected")
    val ex = intercept[IllegalStateException] {
      Guards.failIfAny(df, col("status") === "bad", "unexpected status")
    }
    assert(ex.getMessage.contains("unexpected status"))
    val (observed, obs) = Guards.observed(df, col("status") === "bad", "bad_status")
    assert(observed.count() == 3)
    assert(obs.get("violations") == 1L)
  }
}
