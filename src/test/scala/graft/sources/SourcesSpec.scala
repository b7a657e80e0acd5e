package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.geo.GeoJson

class SourcesSpec extends SparkTestBase {

  test("shapefile: polygons with holes + dbf attributes") {
    val df = Shapefile.read(spark, "src/test/resources/shp/districts.shp")
    val rows = df.orderBy("GEOID").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("GEOID")).toSeq == Seq("42001", "42002"))
    assert(rows.map(_.getAs[Long]("DIST")).toSeq == Seq(1L, 2L))
    val areas = rows.map(r => GeoJson.fromWkb(r.getAs[Array[Byte]]("geometry")).getArea)
    assert(areas.toSeq == Seq(15.0, 4.0)) // 4x4 square minus 1x1 hole; 2x2 square
  }

  test("shapefile DataSource V2: spark.read.format(\"shapefile\")") {
    val df = spark.read.format("shapefile")
      .load("src/test/resources/shp/districts.shp")
    val rows = df.orderBy("GEOID").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("GEOID")).toSeq == Seq("42001", "42002"))
    assert(GeoJson.fromWkb(rows(0).getAs[Array[Byte]]("geometry")).getArea == 15.0)
    // projection pruning still yields correct columns through DSv2
    assert(df.select("DIST").orderBy("DIST").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("yaml source: person documents parse with declared schema") {
    val dir = Files.createTempDirectory("yaml").toString
    Files.writeString(Paths.get(dir, "person-a.yml"),
      """id: ocd-person/abc
        |name: Tammy Baldwin
        |roles:
        |  - type: upper
        |    district: Wisconsin
        |    start_date: '2023-01-03'
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "person-b.yml"),
      """id: ocd-person/def
        |name: John Barrasso
        |roles:
        |  - type: upper
        |    district: Wyoming
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("roles", ArrayType(StructType(Seq(
        StructField("type", StringType),
        StructField("district", StringType),
        StructField("start_date", StringType)))))))
    val df = YamlSource.read(spark, s"$dir/*.yml", schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("name") == "Tammy Baldwin")
    val roles = rows(0).getSeq[org.apache.spark.sql.Row](rows(0).fieldIndex("roles"))
    assert(roles.head.getAs[String]("district") == "Wisconsin")
    assert(rows(1).getSeq[org.apache.spark.sql.Row](rows(1).fieldIndex("roles"))
      .head.getAs[String]("start_date") == null)
  }

  test("gzip sources scan transparently (S6's engine half; fetch is a driver util)") {
    // the reference gunzips NYT files driver-side (nytimes_precincts.py:21-54);
    // Spark's text/json/csv scans decompress .gz by extension, so the engine
    // needs no operator — pin that behavior against a real gzip fixture
    val dir = Files.createTempDirectory("gz").toString
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/events.jsonl.gz"))
    out.write("""{"id":1,"v":"a"}""".getBytes("UTF-8")); out.write('\n')
    out.write("""{"id":2,"v":"b"}""".getBytes("UTF-8")); out.write('\n')
    out.close()
    val df = spark.read.schema("id LONG, v STRING").json(s"$dir/events.jsonl.gz")
    assert(df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "b")))
  }

  test("json docs: multiline per-file docs with prefix dispatch") {
    val dir = Files.createTempDirectory("docs").toString
    Files.writeString(Paths.get(dir, "bill_001.json"),
      """{
        |  "identifier": "HB 102",
        |  "title": "An Act"
        |}""".stripMargin)
    Files.writeString(Paths.get(dir, "vote_event_001.json"),
      """{"identifier": "roll-22", "title": null}""")
    val schema = StructType(Seq(
      StructField("identifier", StringType), StructField("title", StringType)))
    val bills = JsonDocs.read(spark, dir, "bill", schema)
    assert(bills.count() == 1)
    assert(bills.head.getAs[String]("identifier") == "HB 102")
    val tagged = JsonDocs.readTagged(spark, dir, schema)
      .select("doc_kind").collect().map(_.getString(0)).toSet
    assert(tagged == Set("bill", "vote_event"))
  }

  test("jsonl export: round-trip, deterministic shards, manifest totals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/corpus"
    val df = (1L to 100L).map(i => (i, s"doc $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    JsonlExport.writeJsonlShards(df, dir, shards = 4, orderCol = "doc_id")
    // round trip
    val back = spark.read.json(dir)
    assert(back.count() == 100)
    assert(back.select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSet ==
      df.as[(Long, String, String)].collect().toSet)
    // manifest totals match the files
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_graft_manifest.json")), "UTF-8")
    assert(manifest.contains("\"total_rows\":100"), manifest)
    assert(manifest.contains("\"shards\":4"), manifest)
    // determinism: re-exporting the SAME input writes byte-identical
    // shards (range bounds are sampled from the input partitioning, so
    // only same-layout reruns are byte-stable — documented contract)
    val first = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.getName).map(f => new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    JsonlExport.writeJsonlShards(df, dir, 4, "doc_id")
    val second = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.getName).map(f => new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    assert(first.toSeq == second.toSeq, "export must be byte-stable")
  }

  test("jsonl import: validates the manifest, round-trips byte-stably") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("jsonl_rt").toString
    val dir = base + "/corpus"
    val df = (1L to 100L).map(i => (i, s"doc $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    JsonlExport.writeJsonlShards(df, dir, shards = 4, orderCol = "doc_id")

    // export → import → re-export must be byte-identical shard for shard
    val back = JsonlExport.readJsonlShards(spark, dir, df.schema)
    val dir2 = base + "/corpus2"
    JsonlExport.writeJsonlShards(back, dir2, shards = 4, orderCol = "doc_id")
    def shardBytes(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    assert(shardBytes(dir).toSeq == shardBytes(dir2).toSeq,
      "export→import→export must be byte-stable")

    // missing manifest: refuse (foreign/interrupted export)
    val noManifest = intercept[IllegalStateException] {
      val plain = base + "/plain"
      df.select(to_json(struct(col("doc_id"))).as("value"))
        .write.mode("overwrite").text(plain)
      JsonlExport.readJsonlShards(spark, plain, df.schema)
    }
    assert(noManifest.getMessage.contains("_graft_manifest"), noManifest.getMessage)

    // corrupted manifest (wrong row count): loud, names the shard.
    // (Drop the local-FS .crc sidecar — tampering via java.nio leaves a
    // stale Hadoop checksum that would fail the read before our check.)
    val mPath = java.nio.file.Paths.get(dir, "_graft_manifest.json")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._graft_manifest.json.crc"))
    val original = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    java.nio.file.Files.write(mPath,
      original.replaceFirst("\"rows\":(\\d+)", "\"rows\":999").getBytes("UTF-8"))
    val badRows = intercept[IllegalStateException] {
      JsonlExport.readJsonlShards(spark, dir, df.schema)
    }
    assert(badRows.getMessage.contains("manifest says 999"), badRows.getMessage)
    java.nio.file.Files.write(mPath, original.getBytes("UTF-8"))

    // stray non-part file: invisible to validation AND to the returned
    // frame (reads go through the declared file list, not the directory)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "notes.txt"),
      "not a shard\n".getBytes("UTF-8"))
    assert(JsonlExport.readJsonlShards(spark, dir, df.schema).count() == 100)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "notes.txt"))

    // deleted shard: caught from FS metadata before any data pass
    val victim = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).minBy(_.getName)
    val savedBytes = java.nio.file.Files.readAllBytes(victim.toPath)
    assert(victim.delete())
    val missing = intercept[IllegalStateException] {
      JsonlExport.readJsonlShards(spark, dir, df.schema)
    }
    assert(missing.getMessage.contains("shards, found") ||
      missing.getMessage.contains("is missing"), missing.getMessage)
    java.nio.file.Files.write(victim.toPath, savedBytes)
    assert(JsonlExport.readJsonlShards(spark, dir, df.schema).count() == 100)
  }

  test("incremental ingest: only new files, at-least-once commit, immutability raise") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-incr").toString
    val in = root + "/landing"; val ledger = root + "/ledger"; val out = root + "/table"
    new java.io.File(in).mkdirs()
    def land(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    land("a.jsonl", Seq("""{"id":1}""", """{"id":2}"""))
    land("b.jsonl", Seq("""{"id":3}""", """{"id":4}""", """{"id":5}"""))
    val schema = StructType(Seq(StructField("id", LongType)))
    def read(paths: Seq[String]) = spark.read.schema(schema).json(paths: _*)
    def append(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("append").parquet(out)

    // first run: both files
    assert(IncrementalIngest.ingest(spark, in, ledger)(read)(append)
      == Seq("a.jsonl", "b.jsonl"))
    assert(spark.read.parquet(out).count() == 5)
    // re-run: nothing new, write not invoked
    assert(IncrementalIngest.ingest(spark, in, ledger)(read)(
      _ => fail("write called with no new files")).isEmpty)
    // a third file lands: only it is read
    land("c.jsonl", Seq("""{"id":6}"""))
    assert(IncrementalIngest.ingest(spark, in, ledger)(read)(append) == Seq("c.jsonl"))
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 6L))

    // failed write → no commit → the file is retried next run
    land("d.jsonl", Seq("""{"id":7}"""))
    intercept[RuntimeException] {
      IncrementalIngest.ingest(spark, in, ledger)(read)(
        _ => throw new RuntimeException("sink down"))
    }
    assert(IncrementalIngest.newFiles(spark, in, ledger).map(_.file) == Seq("d.jsonl"))
    assert(IncrementalIngest.ingest(spark, in, ledger)(read)(append) == Seq("d.jsonl"))

    // immutability: a committed file REWRITTEN AT THE SAME SIZE (the
    // case a size-only guard misses) raises via the mtime check
    val aPath = java.nio.file.Paths.get(in, "a.jsonl")
    val originalBytes = java.nio.file.Files.readAllBytes(aPath)
    java.nio.file.Files.write(aPath,
      new String(originalBytes, "UTF-8").replace("\"id\":2", "\"id\":9").getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(aPath,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 60000))
    val e = intercept[IllegalStateException](IncrementalIngest.newFiles(spark, in, ledger))
    assert(e.getMessage.contains("immutable"), e.getMessage)

    // and a size change raises too
    land("a.jsonl", Seq("""{"id":1}""", """{"id":2}""", """{"id":99}"""))
    val e2 = intercept[IllegalStateException](IncrementalIngest.newFiles(spark, in, ledger))
    assert(e2.getMessage.contains("immutable"), e2.getMessage)
  }

  test("ORC / CSV / JSON round-trip the documents slice losslessly") {
    // format breadth beyond parquet: the same frame written and read
    // back through each built-in columnar/text source must agree
    // row-for-row (CSV needs an explicit schema on read; header=true
    // preserves column names). spark-avro is not on this classpath —
    // parquet/orc are the columnar pair shipped here.
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").limit(50)
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val expected = docs.collect().toSeq

    docs.write.mode("overwrite").orc(s"$base/o")
    val orc = spark.read.orc(s"$base/o").orderBy("doc_id").collect().toSeq
    assert(orc == expected, "orc round-trip drifted")

    docs.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$base/c")
    val csv = spark.read.schema(docs.schema).option("header", "true")
      .option("escape", "\"").csv(s"$base/c")
      .orderBy("doc_id").collect().toSeq
    assert(csv == expected, "csv round-trip drifted")

    docs.write.mode("overwrite").json(s"$base/j")
    val json = spark.read.schema(docs.schema).json(s"$base/j")
      .orderBy("doc_id").collect().toSeq
    assert(json == expected, "json round-trip drifted")
  }
}
