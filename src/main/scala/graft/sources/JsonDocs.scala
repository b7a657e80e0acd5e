package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One-JSON-document-per-file source with filename-prefix dispatch
  * (reference: scripts/bills/bills_federal.py:24-25,104-120 —
  * `bill_*.json`, `vote_event_*.json`, `jurisdiction_*.json` in one dir).
  *
  * `multiLine` JSON + explicit schema + `input_file_name()` gives the
  * prefix routing as a plain filter — no driver-side file loop. */
object JsonDocs {

  def read(spark: SparkSession, dir: String, prefix: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", "true").schema(schema)
      .json(s"$dir/$prefix*.json")
      .withColumn("source_file", input_file_name())

  /** All docs in a dir tagged by their filename prefix kind. */
  def readTagged(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", "true").schema(schema).json(s"$dir/*.json")
      .withColumn("source_file", input_file_name())
      .withColumn("doc_kind",
        regexp_extract(element_at(split(input_file_name(), "/"), -1),
          "^([a-z_]+?)_?\\d*\\.json$", 1))
}
