package graft.ops

import java.nio.file.{Files, Path}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.{ImportConfig, NotFatal, SettingsParser}
import graft.functions.RefFunctions._
import graft.io.{Archive, CsvTable, ErrorLog, ErrorSink, TableSink}
import graft.state.Watermark

/** §3.2 CSV→SQL import, Spark-native (SURVEY.md).
  *
  * The pure row pipeline (P3 sanitize-all ∘ P4 conditional date-convert ∘
  * F2 null-PK reject ∘ P2 ordered projection) is a single narrow projection —
  * no shuffle, fully codegen'd, scale-independent. Orchestration (discovery,
  * archive, watermark, error log) is driver-side exactly as in the reference
  * (/root/reference/CSVtoSQLimport.ps1:95-268).
  */
object ImportPipeline {

  /** The pure transform. Bad-PK rows are routed to `errorPath` (if given)
    * instead of silently dropped — the reference's skip-and-log per row
    * (/root/reference/CSVtoSQLimport.ps1:228-229,242-251).
    */
  def transform(df: DataFrame, cfg: ImportConfig,
      errorPath: Option[String] = None): DataFrame = {
    val dateCols = cfg.datetimeFields.toSet
    val mapped = df.select(df.columns.map { c =>
      val clean = sanitizeSql(col(c))
      val converted =
        if (dateCols.contains(c)) excelSerialToSql(clean) else clean
      converted.as(c)
    }: _*)
    val pkOk = !isNullOrEmpty(col(cfg.primaryKey))
    val good = errorPath match {
      case Some(p) =>
        ErrorSink.routeRejects(mapped, pkOk, s"null/empty PK ${cfg.primaryKey}",
          s"import:${cfg.importFileName}", p)
      case None => mapped.filter(pkOk)
    }
    cfg.fieldNames match {
      case Some(names) => good.select(names.map(col): _*)
      case None => good
    }
  }

  /** One file end-to-end: read → transform → sink → archive → watermark.
    * Failures are logged NotFatal and skip the file (ST4).
    */
  def runOne(spark: SparkSession, cfg: ImportConfig, sink: TableSink,
      errors: ErrorLog): Boolean = {
    if (!Files.exists(cfg.csvPath)) {
      errors.write(s"Import file not found: ${cfg.csvPath}", NotFatal)
      return false
    }
    try {
      val df = CsvTable.read(spark, cfg.csvPath)
      val out = transform(df, cfg,
        Some(cfg.errorFolder.resolve("rejected_rows").toString))
      sink.write(out, cfg.table)
      Archive.archiveCompleted(cfg.csvPath, cfg.processedFolder)
      new Watermark(cfg.lastImpLogFolder.resolve(
        s"${cfg.importFileName}_last_imported.txt")).commit(Instant.now())
      true
    } catch {
      case e: Exception =>
        errors.write(s"Import of ${cfg.csvPath} failed: ${e.getMessage}", NotFatal)
        false
    }
  }

  /** S5 discovery loop: every `*_import_settings.txt` in `settingsDir` is one
    * table pipeline (/root/reference/CSVtoSQLimport.ps1:96,135).
    */
  def runAll(spark: SparkSession, settingsDir: Path, sinkFor: ImportConfig => TableSink): Seq[(String, Boolean)] = {
    val main = SettingsParser.parseFile(
      settingsDir.resolve("import_settings.txt"), "=")
    val errors = new ErrorLog(java.nio.file.Paths.get(main("errorFolderPath")))
    SettingsParser.discover(settingsDir, "_import_settings.txt").map { sf =>
      val name = SettingsParser.baseName(sf, "_import_settings.txt")
      try {
        val cfg = ImportConfig(main, SettingsParser.parseFile(sf, "=="), name)
        name -> runOne(spark, cfg, sinkFor(cfg), errors)
      } catch {
        case e: Exception =>
          errors.write(s"Config $sf invalid: ${e.getMessage}", NotFatal)
          name -> false
      }
    }
  }
}
