package graft.ops

import java.nio.file.{Files, Path}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.{ExportConfig, NotFatal, SettingsParser}
import graft.io.{Archive, CsvTable, ErrorLog}
import graft.state.Watermark

/** §3.1 Excel→CSV export, Spark-native (SURVEY.md;
  * /root/reference/ExcelToCSVexport.ps1).
  *
  * The workbook reader sits behind [[SheetSource]]: production uses the
  * graft.sources.xlsx DataSource V2 (`spark.read.format("xlsx")`), tests a
  * fake. Watermark gate (ST1), sheet-name match (F3), collision quarantine
  * (ST3/K5) and the match-counter-gated watermark commit (K8) follow the
  * reference's driver flow (:146-231).
  */
trait SheetSource {
  /** S2 sheet-metadata enumeration (/root/reference/ExcelToCSVexport.ps1:171). */
  def sheetNames(workbook: Path): Seq[String]
  /** S1 worksheet scan from a configured header row (:192). */
  def readSheet(spark: SparkSession, workbook: Path, sheet: String, headerRow: Int): DataFrame
}

object ExportPipeline {

  final case class ExportResult(workbook: String, exportedSheets: Seq[String],
      skippedByWatermark: Boolean)

  def runOne(spark: SparkSession, cfg: ExportConfig, source: SheetSource,
      errors: ErrorLog): ExportResult = {
    if (!Files.exists(cfg.workbookPath)) {
      errors.write(s"Workbook not found: ${cfg.workbookPath}", NotFatal)
      return ExportResult(cfg.workbookName, Seq.empty, skippedByWatermark = false)
    }
    val watermark = new Watermark(cfg.watermarkPath)
    val mtime = Files.getLastModifiedTime(cfg.workbookPath).toInstant
    if (!watermark.isNewerThanWatermark(mtime)) // F4/ST1 gate
      return ExportResult(cfg.workbookName, Seq.empty, skippedByWatermark = true)

    val available = source.sheetNames(cfg.workbookPath)
    val matched = available.filter(cfg.sheetsToExport.contains) // F3
    val exported = matched.flatMap { sheet =>
      try {
        val target = cfg.csvExportFolder.resolve(s"$sheet.csv")
        Archive.quarantineUnprocessed(target, cfg.errorFolder, sheet) // ST3/K5
          .foreach(q => errors.write(
            s"Unconsumed previous export quarantined: $q", NotFatal))
        val df = source.readSheet(spark, cfg.workbookPath, sheet, cfg.headerRow)
        CsvTable.writeSingleFile(df, target) // K1
        Some(sheet)
      } catch {
        case e: Exception =>
          errors.write(s"Export of sheet '$sheet' failed: ${e.getMessage}", NotFatal)
          None
      }
    }
    if (exported.nonEmpty) watermark.commit(mtime) // A3-gated K8 commit
    ExportResult(cfg.workbookName, exported, skippedByWatermark = false)
  }

  /** S5 discovery: every `*_export_settings.txt` is one workbook pipeline. */
  def runAll(spark: SparkSession, settingsDir: Path, source: SheetSource): Seq[ExportResult] = {
    val main = SettingsParser.parseFile(
      settingsDir.resolve("export_settings.txt"), "=")
    val errors = new ErrorLog(java.nio.file.Paths.get(main("errorFolderPath")))
    SettingsParser.discover(settingsDir, "_export_settings.txt").map { sf =>
      val name = SettingsParser.baseName(sf, "_export_settings.txt")
      try {
        val cfg = ExportConfig(main, SettingsParser.parseFile(sf, "="), name)
        runOne(spark, cfg, source, errors)
      } catch {
        case e: Exception =>
          errors.write(s"Config $sf invalid: ${e.getMessage}", NotFatal)
          ExportResult(name, Seq.empty, skippedByWatermark = false)
      }
    }
  }
}
