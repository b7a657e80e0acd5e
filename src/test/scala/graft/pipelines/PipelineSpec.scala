package graft.pipelines

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geo.{GeoFunctions, GeoJson}

/** End-to-end pipeline tests over reference-shaped fixtures (SURVEY §3,
  * FIXTURES.md) — the Spark analog of the reference's only executable
  * fixture (vote_matching.main). */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val stateFips =
    Seq(("42", "PA", "Pennsylvania")).toDF("fips", "abbreviation", "name")
  private lazy val stateNames =
    Seq(("Wisconsin", "WI"), ("Pennsylvania", "PA")).toDF("state_name", "abbreviation")

  test("areas pipeline: shapefile -> OCD ids + WKB geometry") {
    val areas = CivicPipeline.areasFromShapefile(
      spark, "src/test/resources/shp/districts.shp", stateFips)
    val rows = areas.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("id")).toSeq == Seq(
      "ocd-division/country:us/state:pa/cd:1",
      "ocd-division/country:us/state:pa/cd:2"))
    assert(GeoJson.fromWkb(rows(0).getAs[Array[Byte]]("geometry")).getArea == 15.0)
  }

  private def writePeopleFixtures(dir: String): Unit = {
    Files.writeString(Paths.get(dir, "baldwin.yml"),
      """id: ocd-person/baldwin
        |name: Tammy Baldwin
        |given_name: Tammy
        |family_name: Baldwin
        |roles:
        |  - type: upper
        |    district: Wisconsin
        |    jurisdiction: ocd-jurisdiction/country:us/government
        |    start_date: '2023-01-03'
        |    end_date: '2029-01-03'
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "rep.yml"),
      """id: ocd-person/fitzpatrick
        |name: Brian Fitzpatrick
        |given_name: Brian
        |family_name: Fitzpatrick
        |roles:
        |  - type: lower
        |    district: PA-1
        |    jurisdiction: ocd-jurisdiction/country:us/government
        |    start_date: '2023-01-03'
        |    end_date: '2027-01-03'
        |""".stripMargin)
  }

  test("people pipeline: YAML -> current role -> constituent area ids") {
    val dir = Files.createTempDirectory("people").toString
    writePeopleFixtures(dir)
    val people = CivicPipeline.peopleFromYaml(spark, s"$dir/*.yml",
      Timestamp.valueOf("2026-01-01 00:00:00"), stateNames)
    val byId = people.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("ocd-person/baldwin").getAs[String]("constituent_area_id")
      == "ocd-division/country:us/state:wi")
    assert(byId("ocd-person/baldwin").getAs[String]("chamber") == "Senate")
    assert(byId("ocd-person/fitzpatrick").getAs[String]("constituent_area_id")
      == "ocd-division/country:us/state:pa/cd:1")
    assert(byId("ocd-person/fitzpatrick").getAs[String]("jurisdiction_area_id")
      == "ocd-division/country:us")
  }

  test("bills + votes pipeline: ids, action dates, semi-join, voter resolution") {
    val dir = Files.createTempDirectory("docs").toString
    Files.writeString(Paths.get(dir, "bill_0001.json"),
      """{
        |  "identifier": "HB 102",
        |  "title": "An Act",
        |  "legislative_session": "119th",
        |  "from_organization": "~{\"classification\": \"upper\"}",
        |  "actions": [
        |    {"date": "2025-01-09T00:00:00+00:00", "description": "introduced"},
        |    {"date": "2025-03-01", "description": "passed"}
        |  ]
        |}""".stripMargin)
    Files.writeString(Paths.get(dir, "vote_event_0001.json"),
      """{
        |  "identifier": "roll-22",
        |  "legislative_session": "119",
        |  "motion_text": "passage",
        |  "start_date": "2025-03-01T12:00:00+00:00",
        |  "result": "pass",
        |  "bill": "~{\"identifier\": \"HB 102\"}",
        |  "organization": "~{\"classification\": \"upper\"}",
        |  "votes": [
        |    {"option": "yes", "voter_name": "Baldwin (D-WI)",
        |     "voter_id": "~{\"name\": \"Baldwin (D-WI)\"}", "note": ""}
        |  ]
        |}""".stripMargin)
    Files.writeString(Paths.get(dir, "vote_event_0002.json"),
      """{
        |  "identifier": "roll-99",
        |  "legislative_session": "119",
        |  "motion_text": "orphan",
        |  "start_date": "2025-03-02T12:00:00+00:00",
        |  "result": "fail",
        |  "bill": "~{\"identifier\": \"HB 999\"}",
        |  "organization": "~{\"classification\": \"upper\"}",
        |  "votes": []
        |}""".stripMargin)

    val juris = "ocd-division/country:us"
    val bills = CivicPipeline.billsFromJsonDocs(spark, dir, juris)
    val b = bills.head
    // uuid5("HB 102_ocd-division/country:us") must match the Python golden scheme
    assert(b.getAs[String]("id").startsWith("ocd-bill/"))
    assert(b.getAs[String]("session") == "119")
    assert(b.getAs[Timestamp]("first_action_date") == Timestamp.valueOf("2025-01-09 00:00:00"))
    assert(b.getAs[Timestamp]("latest_action_date") == Timestamp.valueOf("2025-03-01 00:00:00"))
    assert(b.getAs[String]("chamber") == "upper")

    val people = Seq(
      ("ocd-person/baldwin", "Tammy Baldwin", "Tammy", "Baldwin",
        "ocd-division/country:us/state:wi", "Senate"))
      .toDF("id", "name", "first_name", "last_name", "constituent_area_id", "chamber")
    val (events, dropped) = CivicPipeline.voteEventsFromJsonDocs(spark, dir, bills, people)
    val ev = events.collect()
    assert(ev.length == 1)
    assert(ev(0).getAs[String]("identifier") == "roll-22")
    val votes = ev(0).getSeq[org.apache.spark.sql.Row](ev(0).fieldIndex("votes"))
    assert(votes.head.getAs[String]("voter_id") == "ocd-person/baldwin")
    assert(dropped.collect().map(_.getAs[String]("identifier")).toSeq == Seq("roll-99"))
  }

  test("person-zip edges: spatial overlap replaces per-person round-trips") {
    val areas = Seq(
      ("district:a", "congressional_district",
        """{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}"""),
      ("zip:1", "zipcode",
        """{"type":"Polygon","coordinates":[[[1,1],[3,1],[3,3],[1,3],[1,1]]]}"""),
      ("zip:2", "zipcode",
        """{"type":"Polygon","coordinates":[[[9,9],[12,9],[12,12],[9,12],[9,9]]]}"""),
      ("zip:3", "zipcode",
        """{"type":"Polygon","coordinates":[[[40,40],[41,40],[41,41],[40,41],[40,40]]]}"""))
      .toDF("id", "classification", "gj")
      .withColumn("geometry", GeoFunctions.stGeomFromGeoJson(col("gj")))
      .drop("gj")
    val people = Seq(("p1", "district:a")).toDF("id", "constituent_area_id")
    val edges = CivicPipeline.personZipEdges(people, areas, cellSize = 5.0)
      .orderBy("area_id").collect()
    assert(edges.map(_.getAs[String]("area_id")).toSeq == Seq("zip:1", "zip:2"))
    assert(edges.forall(_.getAs[String]("relationship_type") == "constituent_area_zip_code"))
  }

  test("ingest: merge into warehouse dir is idempotent across re-runs") {
    val tbl = Files.createTempDirectory("wh").toString + "/areas"
    val b = Seq(("a", 1), ("b", 1)).toDF("id", "v")
    CivicPipeline.ingest(spark, tbl, b, Seq("id"))
    CivicPipeline.ingest(spark, tbl, b, Seq("id")) // re-run, same batch
    val out = spark.read.parquet(tbl)
    assert(out.count() == 2)
  }
}
