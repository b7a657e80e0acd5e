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

  /** Schema-adaptive events reader. Driver-generated `events.parquet` has
    * shipped with `ts` as both parquet TIMESTAMP(NANOS) (older snapshots)
    * and TIMESTAMP(MICROS) (current). Spark rejects NANOS unless read as
    * long via `nanosAsLong`, so: inspect the footer schema and branch —
    *  - LongType (nanos-as-long): `timestamp_micros(ts div 1000)`; integer
    *    division stays in long arithmetic, no double loss at 1.7e18 ns.
    *  - TimestampNTZ / Timestamp: cast to the session TimestampType so every
    *    downstream query sees one stable type regardless of writer version. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TimestampNTZType or other timestamp flavor
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
