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
}
