package graft.pipelines

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions._
import graft.geo.SpatialJoin
import graft.ops.{EntityResolution, RoleResolution}
import graft.sources.{JsonDocs, Shapefile, YamlSource}
import graft.warehouse.Warehouse

/** The reference's pipelines (SURVEY §3) recomposed as set-oriented
  * Spark jobs over the five warehouse tables. Each builder is
  * DataFrame-in/DataFrame-out; ingestion to the warehouse is a
  * [[Warehouse.mergeByKey]] at the end — one job per pipeline instead of
  * the reference's one Postgres round-trip per row.
  */
object CivicPipeline {

  // -------------------------------------------------------------------
  // Areas from TIGER-style shapefiles
  // (reference: scripts/census/federal_house_districts.py)
  // -------------------------------------------------------------------

  /** stateFips: broadcastable lookup (fips, abbreviation, name). */
  def areasFromShapefile(spark: SparkSession, shpPath: String,
      stateFips: DataFrame): DataFrame = {
    val raw = Shapefile.read(spark, shpPath)
    raw
      .filter(!col("DIST").cast("string").isin("ZZ", "ZZZ")) // undefined-district sentinels
      .join(broadcast(stateFips), col("STATEFP") === col("fips"))
      .withColumn("district",
        districtNumber(col("abbreviation"), col("DIST").cast("string")))
      .withColumn("id",
        ocdCongressionalDistrict(col("abbreviation"), col("district")))
      .select(col("id"),
        concat(col("name"), lit(" Congressional District "), col("district")).as("name"),
        lit("congressional_district").as("classification"),
        col("ALAND").as("land_area"),
        col("geometry"))
  }

  // -------------------------------------------------------------------
  // People from OpenStates-style YAML
  // (reference: scripts/people/people_federal.py:85-123)
  // -------------------------------------------------------------------

  val personYamlSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("given_name", StringType),
    StructField("family_name", StringType),
    StructField("email", StringType),
    StructField("roles", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("district", StringType),
      StructField("jurisdiction", StringType),
      StructField("start_date", StringType),
      StructField("end_date", StringType)))))))

  /** stateNames: lookup (state_name, abbreviation) for upper-chamber
    * districts that carry the full state name
    * (reference: scripts/people/people_federal.py:51-54). */
  def peopleFromYaml(spark: SparkSession, yamlGlob: String, asOf: Timestamp,
      stateNames: DataFrame): DataFrame = {
    val raw = YamlSource.read(spark, yamlGlob, personYamlSchema)
    val withRole = RoleResolution.currentRoles(raw, "id", asOf)
      .withColumnRenamed("type", "role_type")
    val people = raw.select("id", "name", "given_name", "family_name", "email")
      .join(withRole, Seq("id"))
    // constituent area: lower "TX-13" -> state tx cd 13 (at-large alias);
    // upper carries the full state name -> abbrev lookup
    val lower = people.filter(col("role_type") === "lower")
      .withColumn("st", lower_(element_at(split(col("district"), "-"), 1)))
      .withColumn("dnum", atLargeAlias(element_at(split(col("district"), "-"), 2)))
      .withColumn("constituent_area_id",
        concat(lit("ocd-division/country:us/state:"), col("st"),
          lit("/cd:"), lower_(col("dnum"))))
      .withColumn("chamber", lit("House"))
      .drop("st", "dnum")
    val upper = people.filter(col("role_type") === "upper")
      .join(broadcast(stateNames), people("district") === stateNames("state_name"), "left")
      .withColumn("constituent_area_id",
        concat(lit("ocd-division/country:us/state:"), lower_(col("abbreviation"))))
      .withColumn("chamber", lit("Senate"))
      .drop("state_name", "abbreviation")
    lower.unionByName(upper)
      .withColumn("jurisdiction_area_id", convertAreaId(col("jurisdiction")))
      .select("id", "name", "given_name", "family_name", "email",
        "constituent_area_id", "jurisdiction_area_id", "chamber", "role_status")
  }

  private def lower_(c: org.apache.spark.sql.Column) = lower(c)

  // -------------------------------------------------------------------
  // Bills + vote events from per-file JSON docs
  // (reference: scripts/bills/bills_federal.py)
  // -------------------------------------------------------------------

  val billJsonSchema: StructType = StructType(Seq(
    StructField("identifier", StringType),
    StructField("title", StringType),
    StructField("legislative_session", StringType),
    StructField("from_organization", StringType),
    StructField("actions", ArrayType(StructType(Seq(
      StructField("date", StringType),
      StructField("description", StringType)))))))

  def billsFromJsonDocs(spark: SparkSession, dir: String,
      jurisdictionId: String): DataFrame = {
    JsonDocs.read(spark, dir, "bill", billJsonSchema)
      .withColumn("session", digitsOnly(col("legislative_session")))
      .withColumn("id", billId(col("identifier"), lit(jurisdictionId)))
      .withColumn("action_dates",
        transform(col("actions"), a => parseFlexibleTimestamp(a.getField("date"))))
      .withColumn("first_action_date", array_min(col("action_dates")))
      .withColumn("latest_action_date", array_max(col("action_dates")))
      .withColumn("chamber",
        parsePseudoJson(col("from_organization"),
          StructType(Seq(StructField("classification", StringType))))
          .getField("classification"))
      .select("id", "identifier", "title", "session",
        "first_action_date", "latest_action_date", "chamber")
  }

  val voteEventJsonSchema: StructType = StructType(Seq(
    StructField("identifier", StringType),
    StructField("legislative_session", StringType),
    StructField("motion_text", StringType),
    StructField("start_date", StringType),
    StructField("result", StringType),
    StructField("bill", StringType),
    StructField("organization", StringType),
    StructField("votes", ArrayType(StructType(Seq(
      StructField("option", StringType),
      StructField("voter_name", StringType),
      StructField("voter_id", StringType),
      StructField("note", StringType)))))))

  /** Vote events: referential semi-join to known bills (J2; unmatched
    * events become the returned `dropped` frame), then per-vote entity
    * resolution (J1) rewriting voter_id to the matched person id. */
  def voteEventsFromJsonDocs(spark: SparkSession, dir: String,
      bills: DataFrame, people: DataFrame): (DataFrame, DataFrame) = {
    val raw = JsonDocs.read(spark, dir, "vote_event", voteEventJsonSchema)
      .withColumn("session", digitsOnly(col("legislative_session")))
      .withColumn("bill_identifier",
        parsePseudoJson(col("bill"),
          StructType(Seq(StructField("identifier", StringType)))).getField("identifier"))
      .withColumn("chamber",
        parsePseudoJson(col("organization"),
          StructType(Seq(StructField("classification", StringType)))).getField("classification"))
      .withColumn("id", voteEventId(col("identifier")))
    val billKeys = bills.select(col("identifier").as("bill_identifier"),
      col("session"), col("id").as("bill_id"))
    val kept = raw.join(billKeys, Seq("bill_identifier", "session"), "inner")
    val dropped = raw.join(billKeys, Seq("bill_identifier", "session"), "left_anti")

    // per-vote resolution: explode, resolve, re-group preserving order
    val votes = kept.select(col("id"), col("chamber"),
      posexplode(col("votes")).as(Seq("pos", "vote")))
      .withColumn("vote_id", concat(col("id"), lit("#"), col("pos")))
      .select(col("vote_id"), col("id"), col("pos"),
        col("vote.option").as("option"),
        col("vote.voter_name").as("voter_name"),
        col("vote.voter_id").as("orig_voter_id"),
        col("vote.note").as("note"),
        col("chamber"))
    val resolved = EntityResolution.resolveVoters(
      votes.select("vote_id", "voter_name", "chamber"), people)
    val rebuilt = votes.join(resolved.select("vote_id", "person_id"), Seq("vote_id"), "left")
      .withColumn("voter_id", coalesce(col("person_id"), col("orig_voter_id")))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("option"),
        col("voter_name"), col("voter_id"), col("note")))).as("votes_resolved"))
      .withColumn("votes", transform(col("votes_resolved"),
        v => struct(v.getField("option").as("option"),
          v.getField("voter_name").as("voter_name"),
          v.getField("voter_id").as("voter_id"),
          v.getField("note").as("note"))))
      .drop("votes_resolved")
    val out = kept.drop("votes").join(rebuilt, Seq("id"))
      .select("id", "identifier", "session", "motion_text", "start_date",
        "result", "chamber", "bill_id", "votes")
    (out, dropped.select("id", "identifier", "session", "bill_identifier"))
  }

  // -------------------------------------------------------------------
  // person_area edges via the spatial join
  // (reference: scripts/census/zip_code_overlap.py)
  // -------------------------------------------------------------------

  /** Emit (person_id, area_id, relationship_type) edges for every zip
    * polygon intersecting the person's constituent district — one
    * distributed grid join instead of O(people) PostGIS round-trips. */
  def personZipEdges(people: DataFrame, areas: DataFrame,
      cellSize: Double = 1.0): DataFrame = {
    val districts = areas.filter(col("classification") =!= "zipcode")
      .select(col("id").as("district_id"), col("geometry").as("district_geom"))
    val zips = areas.filter(col("classification") === "zipcode")
      .select(col("id").as("zip_id"), col("geometry").as("zip_geom"))
    val withDistrict = people
      .join(districts, people("constituent_area_id") === districts("district_id"))
      .select(col("id").as("person_id"), col("district_geom"))
    SpatialJoin.intersectsJoin(withDistrict, zips, "district_geom", "zip_geom", cellSize)
      .select(col("person_id"), col("zip_id").as("area_id"),
        lit("constituent_area_zip_code").as("relationship_type"))
  }

  /** Merge a built table into the warehouse directory (idempotent). */
  def ingest(spark: SparkSession, tablePath: String, incoming: DataFrame,
      keys: Seq[String]): Unit = {
    val merged =
      if (new java.io.File(tablePath).exists())
        Warehouse.mergeByKey(spark.read.parquet(tablePath), incoming, keys,
          preserve = Seq("created_at"))
      else incoming
    val tmp = tablePath + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val dst = new java.io.File(tablePath)
    if (dst.exists()) {
      val old = new java.io.File(tablePath + ".old")
      if (old.exists()) deleteRecursively(old)
      dst.renameTo(old)
    }
    new java.io.File(tmp).renameTo(dst)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
