package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Key=value settings parsing (SURVEY.md §2.1 S6).
  *
  * The reference parses per-pipeline settings text files with TWO delimiters:
  * `"="` (/root/reference/ExcelToCSVexport.ps1:74-80,
  * /root/reference/CSVtoSQLimport.ps1:109-115,
  * /root/reference/FileHousekeeping.ps1:45-51) and `"=="`
  * (/root/reference/CSVtoSQLimport.ps1:138-143,
  * /root/reference/InvoiceFileSearchFromSQL.ps1:20-26).
  *
  * Documented divergence (SURVEY.md §7.6.2): the reference's
  * `$key,$val = $_ -split "="` silently truncates values containing the
  * delimiter; we split on the FIRST occurrence only, preserving the rest.
  */
object SettingsParser {

  def parseLines(lines: Seq[String], delim: String): Map[String, String] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { line =>
        val i = line.indexOf(delim)
        if (i < 0) None
        else Some(line.substring(0, i).trim -> line.substring(i + delim.length).trim)
      }
      .toMap

  def parseFile(path: Path, delim: String): Map[String, String] =
    parseLines(Files.readAllLines(path).asScala.toSeq, delim)

  /** S5 directory-glob table discovery
    * (/root/reference/ExcelToCSVexport.ps1:61,
    * /root/reference/CSVtoSQLimport.ps1:96): find work by listing settings
    * files matching a suffix.
    */
  def discover(dir: Path, suffix: String): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator.asScala
        .filter(p => p.getFileName.toString.endsWith(suffix))
        .toSeq.sortBy(_.getFileName.toString)
    }

  /** F-S5 suffix strip (/root/reference/ExcelToCSVexport.ps1:114-116,
    * /root/reference/CSVtoSQLimport.ps1:158-159): derive the data-file base
    * name from its settings-file name.
    */
  def baseName(settingsFile: Path, suffix: String): String =
    settingsFile.getFileName.toString.stripSuffix(suffix)
}

/** Severity of a config/pipeline error (SURVEY.md §2.2 K6): `Fatal` aborts
  * the run, `NotFatal` skips the offending unit and continues.
  */
sealed trait Severity
case object Fatal extends Severity
case object NotFatal extends Severity

final case class ConfigError(message: String, severity: Severity)
  extends RuntimeException(message)

/** Per-workbook Excel→CSV export config
  * (/root/reference/ExcelToCSVexport.ps1:98-124 + main config :74-94).
  * `sheetsToExport` is comma-split and trimmed — the reference's trim is
  * syntactically broken (SURVEY.md §7.6.2 / F-S7); we implement the intent.
  */
final case class ExportConfig(
    workbookName: String,
    sourceFolder: Path,
    fileExtension: String,
    sheetsToExport: Seq[String],
    headerRow: Int,
    csvExportFolder: Path,
    lastModLogFolder: Path,
    errorFolder: Path) {
  def workbookPath: Path = sourceFolder.resolve(workbookName + fileExtension)
  def watermarkPath: Path =
    lastModLogFolder.resolve(workbookName + "_last_time_modified.txt")
}

object ExportConfig {
  def apply(main: Map[String, String], per: Map[String, String],
      workbookName: String): ExportConfig = {
    def req(m: Map[String, String], k: String): String =
      m.get(k).filter(_.nonEmpty).getOrElse(
        throw ConfigError(s"Missing required setting '$k'", NotFatal))
    ExportConfig(
      workbookName = workbookName,
      sourceFolder = Paths.get(req(per, "exportSourceFolderPath")),
      fileExtension = per.getOrElse("exportFileExtention", ".xlsx"),
      sheetsToExport =
        req(per, "sheetsToExport").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      headerRow = per.getOrElse("headerRow", "1").trim.toInt,
      csvExportFolder = Paths.get(req(main, "csvExportFolderPath")),
      lastModLogFolder = Paths.get(req(main, "lastModLogFolderPath")),
      errorFolder = Paths.get(req(main, "errorFolderPath")))
  }
}

/** Per-table CSV→SQL import config
  * (/root/reference/CSVtoSQLimport.ps1:135-159, delimiter `"=="`).
  * `importFieldNames == All` means identity projection
  * (/root/reference/CSVtoSQLimport.ps1:232).
  */
final case class ImportConfig(
    importFileName: String,
    table: String,
    primaryKey: String,
    fieldNames: Option[Seq[String]], // None == "All"
    datetimeFields: Seq[String],
    serverName: String,
    databaseName: String,
    importFilesFolder: Path,
    processedFolder: Path,
    errorFolder: Path,
    lastImpLogFolder: Path) {
  def csvPath: Path = importFilesFolder.resolve(importFileName + ".csv")
}

object ImportConfig {
  def apply(main: Map[String, String], per: Map[String, String],
      importFileName: String): ImportConfig = {
    def req(m: Map[String, String], k: String): String =
      m.get(k).filter(_.nonEmpty).getOrElse(
        throw ConfigError(s"Missing required setting '$k'", NotFatal))
    val fields = req(per, "importFieldNames")
    ImportConfig(
      importFileName = importFileName,
      table = req(per, "importTable"),
      primaryKey = req(per, "importTablePK"),
      fieldNames =
        if (fields.equalsIgnoreCase("All")) None
        else Some(fields.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
      datetimeFields = per.get("importDatetimeFields")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty),
      serverName = req(per, "importServerName"),
      databaseName = req(per, "importDatabaseName"),
      importFilesFolder = Paths.get(req(main, "importFilesFolderPath")),
      processedFolder = Paths.get(req(main, "importProcessedFolderPath")),
      errorFolder = Paths.get(req(main, "errorFolderPath")),
      lastImpLogFolder = Paths.get(req(main, "lastImpLogFolderPath")))
  }
}

/** Invoice-search config (/root/reference/InvoiceFileSearchFromSQL.ps1:20-34,
  * delimiter `"=="`). `query` contains the `INVOICE_NUMBERS` placeholder
  * spliced at :63 (J1 option (a), SURVEY.md §2.4).
  */
final case class SearchConfig(
    serverName: String,
    databaseName: String,
    query: String,
    invoiceCsvPath: Path,
    docStoreRoot: Path,
    destinationFolder: Path) {
  /** J1-a manual IN-list pushdown: splice keys into the query placeholder. */
  def queryWithKeys(keys: Seq[String]): String =
    query.replace("INVOICE_NUMBERS", keys.mkString("','"))
}

object SearchConfig {
  def apply(m: Map[String, String]): SearchConfig = {
    def req(k: String): String = m.get(k).filter(_.nonEmpty).getOrElse(
      throw ConfigError(s"Missing required setting '$k'", Fatal))
    SearchConfig(
      serverName = req("serverName"),
      databaseName = req("databaseName"),
      query = req("query"),
      invoiceCsvPath = Paths.get(req("invoiceCsvPath")),
      docStoreRoot = Paths.get(req("docStoreRoot")),
      destinationFolder = Paths.get(req("destinationFolder")))
  }
}

/** Retention config (/root/reference/FileHousekeeping.ps1:39-77): monitored
  * folders assembled from main + per-job settings; `days` TTL.
  */
final case class HousekeepingConfig(folders: Seq[Path], maxAgeDays: Int)
