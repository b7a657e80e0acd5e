package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Canary for the events-reader schema adaptivity. The driver's testdata
  * generator has shipped `events.parquet` with `ts` as parquet
  * TIMESTAMP(NANOS) (read as LongType under nanosAsLong) and as
  * TIMESTAMP(MICROS)/NTZ — a silent switch between the two broke seven
  * queries in round 5. These fixtures pin `Tables.events` to yield a
  * session TimestampType under every writer flavor. */
class TablesSpec extends SparkTestBase {
  import spark.implicits._

  private def writeFixture(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-fixture").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events reader: nanos-as-long fixture converts to TimestampType micros") {
    // 2024-01-02T03:04:05.123456789Z in nanos; expect micros truncation.
    val nanos = 1704164645123456789L
    val dir = writeFixture(Seq((1L, nanos)).toDF("event_id", "ts"))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    val micros = got.select(unix_micros($"ts")).as[Long].head()
    assert(micros === nanos / 1000)
  }

  test("events reader: session-timestamp fixture passes through unchanged") {
    val dir = writeFixture(
      Seq((1L, "2024-01-02 03:04:05.123456")).toDF("event_id", "s")
        .select($"event_id", to_timestamp($"s").as("ts")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select(unix_micros($"ts")).as[Long].head() === 1704164645123456L)
  }

  test("events reader: timestamp_ntz fixture (current driver writer) casts to TimestampType") {
    val dir = writeFixture(
      Seq((1L, "2024-01-02 03:04:05.123456")).toDF("event_id", "s")
        .select($"event_id", to_timestamp_ntz($"s").as("ts")))
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType !== LongType) // sanity: NTZ, not long
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    // UTC session: NTZ wall-clock maps to the same instant.
    assert(got.select(unix_micros($"ts")).as[Long].head() === 1704164645123456L)
  }

  test("events reader: driver sf0.001 file yields TimestampType and rows") {
    val got = Tables.events(spark, "/root/testdata/sf0.001")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.limit(1).count() === 1L)
  }
}
