package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSONL shard export — the sink format training stacks actually
  * consume (one JSON doc per line, fixed shard count, deterministic
  * order). The write is range-partitioned on `orderCol` and sorted
  * within each shard, so re-running the export over the same input
  * produces byte-identical shards — what makes downstream dataloader
  * checkpoints resumable. (Range bounds are SAMPLED from the input
  * partitioning, so a differently-partitioned input may cut the same
  * rows into different shard boundaries; the global order is identical
  * either way.)
  *
  * A `_graft_manifest.json` is written next to the shards with per-file
  * row counts and byte sizes (dataloaders size their epoch plans from
  * it). Counting rows re-reads the written text output once — one extra
  * scan of the EXPORTED data (not the input), accepted for an export
  * that runs once per corpus release. */
object JsonlExport {

  def writeJsonlShards(df: DataFrame, path: String, shards: Int,
      orderCol: String): Unit = {
    require(shards > 0, s"shards must be positive: $shards")
    val spark = df.sparkSession
    df.repartitionByRange(shards, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      // explicit nulls: to_json drops null fields by default, which
      // breaks a dataloader indexing the fixed schema on exactly the
      // rows with missing keys
      .select(to_json(struct(df.columns.map(col): _*),
        Map("ignoreNullFields" -> "false")).as("value"))
      .write.mode("overwrite").text(path)
    // manifest from the written files: names+bytes from the FS, rows
    // from one pass over the output
    val rows = spark.read.text(path)
      .groupBy(input_file_name().as("file"))
      .count().collect()
      .map(r => r.getString(0).split("/").last -> r.getLong(1)).toMap
    // Path.getFileSystem, not FileSystem.get(new URI(path)): a raw path
    // with a space is a legal Path but an illegal URI, and the write
    // above already succeeded — dying here would strand shards without
    // a manifest
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val entries = files.map { s =>
      val name = s.getPath.getName
      s"""{"file":"$name","bytes":${s.getLen},"rows":${rows.getOrElse(name, 0L)}}"""
    }
    val manifest =
      s"""{"shards":${files.length},"total_rows":${rows.values.sum},"files":[${entries.mkString(",")}]}"""
    val out = fs.create(
      new org.apache.hadoop.fs.Path(path, "_graft_manifest.json"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** JSONL shard import — the read side of [[writeJsonlShards]], and the
    * half a training stack exercises on every epoch: before handing the
    * corpus to a dataloader, prove the directory IS the export the
    * manifest describes. Validates, loudly and in this order:
    *
    *   1. `_graft_manifest.json` exists (a missing manifest means an
    *      interrupted or foreign export — refusing beats training on a
    *      partial corpus);
    *   2. the `part-` file names and byte sizes on the FS match the
    *      manifest exactly (FS metadata only — catches a deleted,
    *      truncated, or extra shard without reading data);
    *   3. per-file row counts match (ONE pass over the shards — the same
    *      price the export paid to write the manifest, accepted for a
    *      check that runs once per corpus load, not per epoch step).
    *
    * Returns the parsed frame with the caller's `schema` in FAILFAST
    * mode, so a corrupt line raises instead of becoming a null row. The
    * returned frame is lazy; validation work is NOT re-run when it is
    * consumed. */
  def readJsonlShards(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestPath = new org.apache.hadoop.fs.Path(root, "_graft_manifest.json")
    if (!fs.exists(manifestPath))
      throw new IllegalStateException(
        s"no _graft_manifest.json under $path — not a graft JSONL export, " +
          "or the export was interrupted before the manifest write")
    // the manifest is one JSON object on one line — parse it with
    // Spark's JSON reader over an in-memory dataset (underscore-prefixed
    // files are invisible to Spark's file listing EVEN when named
    // explicitly, so the bytes come via the Hadoop FS)
    val manifestText = {
      val in = fs.open(manifestPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val m = spark.read.json(spark.createDataset(Seq(manifestText))(
      org.apache.spark.sql.Encoders.STRING))
    val declared = m.select(col("shards"), col("total_rows")).head()
    val declaredFiles = m.select(explode(col("files")).as("f"))
      .select(col("f.file"), col("f.bytes"), col("f.rows"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val onDisk = fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => s.getPath.getName -> s.getLen).toMap
    def fail(what: String): Nothing = throw new IllegalStateException(
      s"JSONL import of $path does not match its manifest: $what")
    if (onDisk.size != declared.getLong(0))
      fail(s"manifest declares ${declared.getLong(0)} shards, found ${onDisk.size}")
    for ((name, (bytes, _)) <- declaredFiles) onDisk.get(name) match {
      case None => fail(s"shard $name is missing")
      case Some(len) if len != bytes =>
        fail(s"shard $name has $len bytes, manifest says $bytes")
      case _ => ()
    }
    for (name <- onDisk.keys if !declaredFiles.contains(name))
      fail(s"shard $name is not in the manifest")
    // the one data pass: per-file line counts vs the manifest — over the
    // DECLARED file list explicitly, not the directory: a stray non-part
    // file (someone's notes.txt) must neither fail validation with a
    // misleading count mismatch nor ride into the "proven" corpus below
    val declaredPaths = declaredFiles.keys.toSeq.sorted
      .map(n => new org.apache.hadoop.fs.Path(root, n).toString)
    val counted = spark.read.text(declaredPaths: _*)
      .groupBy(input_file_name().as("file"))
      .count().collect()
      .map(r => r.getString(0).split("/").last -> r.getLong(1)).toMap
    for ((name, (_, rows)) <- declaredFiles
         if counted.getOrElse(name, 0L) != rows)
      fail(s"shard $name has ${counted.getOrElse(name, 0L)} rows, " +
        s"manifest says $rows")
    val total = counted.values.sum
    if (total != declared.getLong(1))
      fail(s"shards hold $total rows, manifest says ${declared.getLong(1)}")
    spark.read.schema(schema).option("mode", "FAILFAST").json(declaredPaths: _*)
  }
}
