package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accessors for the driver-provided synthetic warehouse (TESTDATA.md):
  * one Parquet file per table under a scale-factor directory. */
object Tables {
  val Names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table is written with parquet TIMESTAMP(NANOS), which
    * Spark's reader rejects. Read nanos as long and convert to a proper
    * TimestampType (micros) with integer division — `ts div 1000` stays in
    * long arithmetic, so no double-precision loss at 1.7e18 ns. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
