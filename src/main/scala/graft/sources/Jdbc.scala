package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Generic JDBC source/sink — the warehouse-integration surface the
  * reference exercises against live Postgres (scripts/database/
  * database.py: per-row `INSERT … ON CONFLICT (…) DO UPDATE` with one
  * COMMIT per row; scripts/bills/bills_federal.py:166-177 reads the
  * people table back for matching). Re-expressed Spark-first:
  *
  *   - reads ride Spark's built-in JDBC relation — `readPartitioned`
  *     issues `numPartitions` range-bounded queries in parallel, the
  *     scale path for pulling a warehouse table into a cluster (a
  *     single-connection read serializes 100 TB through one socket);
  *   - [[upsertByKey]] is the reference's ON CONFLICT semantics as a
  *     SET-ORIENTED batched two-phase write per partition: one batched
  *     UPDATE, rows reporting no match re-batched as INSERT, one commit
  *     per batch instead of per row. Dialect-portable — no MERGE/
  *     ON CONFLICT syntax dependency, just standard UPDATE/INSERT —
  *     so it runs against Postgres, Derby, anything JDBC.
  *
  * Concurrency contract: matches the reference's single-writer
  * pipelines (each pipeline owns its table). Two writers racing the
  * same ABSENT key can both insert; writers racing an existing key
  * last-write-win per column set, same as ON CONFLICT DO UPDATE. */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Range-partitioned parallel read over an integral column: each of
    * the `numPartitions` tasks issues its own bounded query. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(options))

  def append(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props(options))

  def overwrite(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props(options))

  /** Create the table from the frame's schema if it does not exist yet
    * (K2 auto-create, JDBC side) — no rows are written. String columns
    * default to VARCHAR(4000): some dialects (Derby) map StringType to
    * CLOB, which cannot appear in a WHERE comparison — fatal for any
    * string upsert key. Override per column via the standard
    * `createTableColumnTypes` option. */
  def createTableIfMissing(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
    val withTypes =
      if (options.contains("createTableColumnTypes") || stringCols.isEmpty) options
      else options + ("createTableColumnTypes" ->
        stringCols.map(f => s"${f.name} VARCHAR(4000)").mkString(", "))
    df.limit(0).write.mode(SaveMode.Ignore)
      .options(withTypes).jdbc(url, table, props(withTypes))
  }

  /** Create a (non-unique) index over the upsert keys if none of that
    * name exists — without one, every batched UPDATE's key probe is a
    * full table scan and the upsert turns O(n²) (measured: the q220
    * round-trip spent ~5 s in Derby scans on a 30k-row table).
    * Idempotent: an ALREADY-EXISTS error (and only that — matched by
    * SQLState, Derby X0Y32 / Postgres 42P07 / SQL-standard 42710 /
    * ODBC-style 42S11) is swallowed; anything else (permissions,
    * syntax, bad table name) rethrows — silently leaving the upsert
    * unindexed reintroduces the O(n²) scan this helper exists to
    * prevent. */
  def ensureKeyIndex(url: String, table: String, keys: Seq[String],
      options: Map[String, String] = Map.empty): Unit = {
    val duplicateStates = Set("X0Y32", "42P07", "42710", "42S11")
    val conn = DriverManager.getConnection(url, props(options))
    try {
      val stmt = conn.createStatement()
      try stmt.executeUpdate(
        s"CREATE INDEX ${table}_graft_key_idx ON $table (" +
          keys.map(c => "\"" + c + "\"").mkString(", ") + ")"): Unit
      catch {
        case e: java.sql.SQLException
            if duplicateStates.contains(e.getSQLState) => ()
      }
      finally stmt.close()
    } finally conn.close()
  }

  /** Keyed upsert (K1): per partition, one batched UPDATE over the
    * non-key columns, then rows whose update matched nothing re-batched
    * as INSERT — `INSERT … ON CONFLICT DO UPDATE` semantics with one
    * round-trip per `batchSize` rows instead of the reference's one
    * commit per row. The table must exist ([[createTableIfMissing]]).
    *
    * Input contract: the frame must be UNIQUE on `keys` — two same-key
    * rows racing one batch both see UPDATE count 0 and both insert
    * (a PK then aborts the partition; without one the table gains
    * duplicates). A frame has no row order, so "last write wins among
    * input duplicates" is undefinable here — dedupe upstream
    * (`dropDuplicates(keys)` or the warehouse's last-writer policy). */
  def upsertByKey(df: DataFrame, url: String, table: String,
      keys: Seq[String], batchSize: Int = 500,
      options: Map[String, String] = Map.empty): Unit = {
    val cols = df.columns.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"upsert keys $keys must be columns of the frame (${cols.mkString(", ")})")
    val nonKeys = cols.filterNot(keys.contains)
    require(nonKeys.nonEmpty,
      "upsertByKey needs at least one non-key column (a key-only frame " +
        "has nothing to update; use append with dedup instead)")
    require(batchSize >= 1 && batchSize <= 100000,
      s"batchSize must be in [1, 100000], got $batchSize")
    // Spark's JDBC writer creates columns as QUOTED identifiers, so the
    // generated statements must quote them too (unquoted names fold to
    // the dialect's default case and stop resolving)
    def q(c: String): String = "\"" + c + "\""
    val updateSql = s"UPDATE $table SET " +
      nonKeys.map(c => s"${q(c)} = ?").mkString(", ") +
      " WHERE " + keys.map(c => s"${q(c)} = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (${cols.map(q).mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    val opts = options // serializable capture, not the Properties object
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url, props(opts))
        try {
          conn.setAutoCommit(false)
          try {
            upsertPartition(conn, rows, updateSql, insertSql,
              cols, keys, nonKeys, batchSize)
            conn.commit()
          } catch {
            // roll back explicitly before close: embedded drivers
            // (Derby) refuse to close a connection with an active
            // transaction, which would mask the real failure AND leak
            // the partition's row locks until JVM exit
            case e: Throwable =>
              try conn.rollback() catch { case _: java.sql.SQLException => () }
              throw e
          }
        } finally conn.close()
      }
    }
  }

  private def upsertPartition(conn: Connection,
      rows: Iterator[org.apache.spark.sql.Row], updateSql: String,
      insertSql: String, cols: Seq[String], keys: Seq[String],
      nonKeys: Seq[String], batchSize: Int): Unit = {
    val upd = conn.prepareStatement(updateSql)
    val ins = conn.prepareStatement(insertSql)
    try {
      rows.grouped(batchSize).foreach { batch =>
        batch.foreach { row =>
          var i = 1
          nonKeys.foreach { c => upd.setObject(i, row.getAs[Any](c)); i += 1 }
          keys.foreach { c => upd.setObject(i, row.getAs[Any](c)); i += 1 }
          upd.addBatch()
        }
        val counts = upd.executeBatch()
        var anyInsert = false
        batch.zip(counts).foreach { case (row, batchCount) =>
          // drivers may report Statement.SUCCESS_NO_INFO (-2) for every
          // batched statement (Oracle always; Postgres under rewritten
          // batches) — treating -2 as "updated" would silently drop the
          // INSERT for every new key. Re-run those rows individually:
          // executeUpdate returns the true match count. EXECUTE_FAILED
          // (-3, a per-row failure on a driver that doesn't throw
          // BatchUpdateException) must NOT count as "updated" either —
          // that would skip the INSERT fallback and lose the row; it is
          // an error, surface it.
          if (batchCount == java.sql.Statement.EXECUTE_FAILED)
            throw new java.sql.SQLException(
              s"batched UPDATE reported EXECUTE_FAILED for key " +
                keys.map(c => s"$c=${row.getAs[Any](c)}").mkString(", "))
          val updated =
            if (batchCount != java.sql.Statement.SUCCESS_NO_INFO) batchCount
            else {
              var i = 1
              nonKeys.foreach { c => upd.setObject(i, row.getAs[Any](c)); i += 1 }
              keys.foreach { c => upd.setObject(i, row.getAs[Any](c)); i += 1 }
              upd.executeUpdate()
            }
          if (updated == 0) {
            var i = 1
            cols.foreach { c => ins.setObject(i, row.getAs[Any](c)); i += 1 }
            ins.addBatch()
            anyInsert = true
          }
        }
        if (anyInsert) ins.executeBatch()
      }
    } finally {
      upd.close()
      ins.close()
    }
  }
}
