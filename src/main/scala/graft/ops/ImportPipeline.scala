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

  /** The pure transform: bad-PK rows filtered (the reference's skip per row,
    * /root/reference/CSVtoSQLimport.ps1:228-229,242-251). Use
    * [[transformWithRejects]] when the dropped rows must be captured.
    */
  def transform(df: DataFrame, cfg: ImportConfig): DataFrame =
    transformWithRejects(df, cfg)._1

  /** (good, rejects-with-provenance) — both lazy; the caller decides when
    * (and whether) the reject frame is written (post-commit, see runOne).
    */
  def transformWithRejects(df: DataFrame, cfg: ImportConfig)
      : (DataFrame, DataFrame) = {
    val dateCols = cfg.datetimeFields.toSet
    val mapped = df.select(df.columns.map { c =>
      val clean = sanitizeSql(col(c))
      val converted =
        if (dateCols.contains(c)) excelSerialToSql(clean) else clean
      converted.as(c)
    }: _*)
    val pkOk = !isNullOrEmpty(col(cfg.primaryKey))
    val (good, bad) = ErrorSink.split(mapped, pkOk,
      s"null/empty PK ${cfg.primaryKey}", s"import:${cfg.importFileName}")
    val projected = cfg.fieldNames match {
      case Some(names) => good.select(names.map(col): _*)
      case None => good
    }
    (projected, bad)
  }

  /** One file end-to-end: read → transform → sink → rejects → archive →
    * watermark. Failures are logged NotFatal and skip the file (ST4); the
    * reject append happens only AFTER the sink commit, so a failed batch
    * that retries cannot duplicate its reject audit rows.
    */
  def runOne(spark: SparkSession, cfg: ImportConfig, sink: TableSink,
      errors: ErrorLog): Boolean = {
    if (!Files.exists(cfg.csvPath)) {
      errors.write(s"Import file not found: ${cfg.csvPath}", NotFatal)
      return false
    }
    try {
      val df = CsvTable.read(spark, cfg.csvPath)
      val (out, rejects) = transformWithRejects(df, cfg)
      sink.write(out, cfg.table)
      ErrorSink.append(rejects,
        cfg.errorFolder.resolve("rejected_rows").toString)
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
