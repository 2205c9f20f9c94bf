package graft.io

import java.nio.file.Path
import java.util.Properties
import org.apache.spark.sql.DataFrame
import graft.config.ImportConfig
import graft.functions.RefFunctions.bracketQuoteName

/** K3 sink seam (SURVEY.md §2.2): the reference truncate-loads SQL Server
  * (/root/reference/CSVtoSQLimport.ps1:196-207,242-251) one INSERT per row;
  * Spark's JDBC writer batches (`batchsize`) and `truncate=true` preserves
  * the full-refresh semantics without dropping the table. No SQL Server
  * exists in the sandbox (SURVEY.md §7.6.7), so the sink sits behind this
  * trait with a filesystem fake for tests; [[JdbcTableSink]] holds the real
  * option mapping, unit-tested directly.
  */
trait TableSink {
  def write(df: DataFrame, table: String): Unit
}

object JdbcTableSink {
  /** The exact writer options a production deployment uses. Batched inserts
    * replace the reference's per-row round trips (its dominant cost,
    * SURVEY.md §4.2); `truncate` keeps K3's TRUNCATE-then-load contract.
    */
  def writerOptions(cfg: ImportConfig, batchSize: Int = 10000): Map[String, String] = Map(
    "url" -> s"jdbc:sqlserver://${cfg.serverName};databaseName=${cfg.databaseName};integratedSecurity=true",
    "dbtable" -> bracketQuoteName(cfg.table),
    "truncate" -> "true",
    "batchsize" -> batchSize.toString,
    "isolationLevel" -> "READ_COMMITTED")
}

/** `urlOverride` + `quoteName=false` let tests run the SAME write path
  * against embedded Derby (JdbcSinkIntegrationSpec); production uses the
  * SQL Server URL + bracket-quoting from [[JdbcTableSink.writerOptions]].
  */
final class JdbcTableSink(cfg: ImportConfig, urlOverride: Option[String] = None,
    quoteName: Boolean = true) extends TableSink {
  override def write(df: DataFrame, table: String): Unit = {
    val props = new Properties()
    val opts = JdbcTableSink.writerOptions(cfg)
    df.write.mode("overwrite")
      .option("truncate", opts("truncate"))
      .option("batchsize", opts("batchsize"))
      .option("isolationLevel", opts("isolationLevel"))
      .jdbc(urlOverride.getOrElse(opts("url")),
        if (quoteName) bracketQuoteName(table) else table, props)
  }
}

/** Filesystem fake standing in for SQL Server in tests: truncate-load == a
  * single-file overwrite of `<dir>/<table>.csv`.
  */
final class CsvFolderSink(dir: Path) extends TableSink {
  override def write(df: DataFrame, table: String): Unit =
    CsvTable.writeSingleFile(df, dir.resolve(s"$table.csv"))
}
