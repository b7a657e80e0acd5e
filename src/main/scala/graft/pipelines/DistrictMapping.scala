package graft.pipelines

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 + K3 — the reference's district-mapping entry point
  * (reference: scripts/people/people_district_mapping.py:10-35) as a
  * pipeline: scan an exported areas CSV, normalize human-named districts
  * to the OpenStates "people" format
  * ([[CivicPipeline.districtMappingFromAreas]]), and persist the nested
  * `{state: {chamber|special: {district_name: area_id}}}` JSON that the
  * state-people pipeline consumes (reference:
  * scripts/reference_data_helper.py:14-19,
  * reference_data/state_people_district_mapping.json).
  */
object DistrictMapping {

  /** S5: header CSV scan of an areas export (columns id, fips_code, name)
    * (reference: scripts/people/people_district_mapping.py:22-28). */
  def areasFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col("id"), col("fips_code"), col("name"))

  /** K3: render and write the nested mapping JSON (reference:
    * scripts/people/people_district_mapping.py:34-35). The mapping is
    * reference data — a few hundred rows for a named-district state — so
    * the driver-side collect mirrors the reference's in-memory dict; this
    * is deliberately NOT a data-scale path. Keys are emitted sorted for a
    * reproducible file. */
  def writeJson(mapping: DataFrame, path: String): Unit = {
    val rows = mapping.select("state", "chamber", "district_name", "area_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .distinct // idempotent re-writes must not emit duplicate JSON keys
    // a key mapping to >1 DISTINCT area_id would serialize as
    // non-standard duplicate-key JSON and readTree keeps only the last —
    // a mapping would silently vanish; raise like the reference raises
    // on its unhandled cases. Exact duplicate rows (same key, same id)
    // are a benign idempotent re-write, as in the reference's dict.
    val conflicts = rows.groupBy(r => (r._1, r._2, r._3))
      .filter(_._2.map(_._4).distinct.length > 1).keys
    require(conflicts.isEmpty,
      s"duplicate district mapping keys: ${conflicts.mkString(", ")}")
    val writer = new java.io.StringWriter()
    val g = new com.fasterxml.jackson.core.JsonFactory().createGenerator(writer)
    g.useDefaultPrettyPrinter()
    g.writeStartObject()
    for ((state, byChamber) <- rows.groupBy(_._1).toSeq.sortBy(_._1)) {
      g.writeObjectFieldStart(state)
      for ((chamber, members) <- byChamber.groupBy(_._2).toSeq.sortBy(_._1)) {
        g.writeObjectFieldStart(chamber)
        for ((_, _, name, areaId) <- members.sortBy(_._3))
          g.writeStringField(name, areaId)
        g.writeEndObject()
      }
      g.writeEndObject()
    }
    g.writeEndObject()
    g.close()
    Files.writeString(Paths.get(path), writer.toString)
  }

  /** Load the nested mapping JSON back into the flattened
    * (state, chamber, district_name, area_id) frame that
    * [[CivicPipeline.peopleStateFromYaml]] broadcasts. */
  def readJson(spark: SparkSession, path: String): DataFrame = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(path)))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
    root.fields().forEachRemaining { st =>
      st.getValue.fields().forEachRemaining { ch =>
        ch.getValue.fields().forEachRemaining { d =>
          rows += ((st.getKey, ch.getKey, d.getKey, d.getValue.asText()))
        }
      }
    }
    import spark.implicits._
    rows.toSeq.toDF("state", "chamber", "district_name", "area_id")
  }
}
