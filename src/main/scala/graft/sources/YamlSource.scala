package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLMapper
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** YAML document source (reference: scripts/people/people_federal.py:85-94 —
  * one legislator per YAML file in a cloned git tree).
  *
  * Spark has no YAML reader; we read whole files and transcode YAML→JSON
  * per-partition with Jackson's YAMLMapper (on Spark's classpath), then
  * parse with the declared schema. Schema is explicit — the reference's
  * failure mode of KeyErrors on chaotic YAML becomes a null + filter.
  *
  * Scale: wholeTextFiles parallelizes over files; fine for the
  * many-small-files layout the reference consumes. */
object YamlSource {

  /** Transcode one YAML document to a JSON string. */
  def yamlToJson(yaml: String): String = {
    val tree = new YAMLMapper().readTree(yaml)
    new ObjectMapper().writeValueAsString(tree)
  }

  /** Read a directory (glob) of YAML files into a DataFrame with the given
    * schema; adds `source_file` for provenance. */
  def read(spark: SparkSession, pathGlob: String, schema: StructType): DataFrame = {
    import spark.implicits._
    val raw: Dataset[(String, String)] =
      spark.sparkContext.wholeTextFiles(pathGlob).toDS()
    val asJson = raw.map { case (file, content) => (file, yamlToJson(content)) }
      .toDF("source_file", "json")
    asJson.select(col("source_file"), from_json(col("json"), schema).as("doc"))
      .select(col("source_file"), col("doc.*"))
  }
}
