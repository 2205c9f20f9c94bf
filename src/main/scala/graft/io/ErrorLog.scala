package graft.io

import java.nio.file.{Files, Path, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import graft.config.{Fatal, NotFatal, Severity}

/** K6 error-log sink (SURVEY.md §2.2): append `"<ts> <msg>"` to a per-day
  * error file, creating it if absent
  * (/root/reference/ExcelToCSVexport.ps1:23-51,
  * /root/reference/CSVtoSQLimport.ps1:19-47). `Fatal` aborts the run after
  * logging; `NotFatal` records and continues — the reference's universal
  * skip-and-log policy (SURVEY.md §2.10 ST4).
  *
  * Driver-side by design: pipeline-level errors are scalar events. Row-level
  * rejects at scale go through [[ErrorSink]] (a DataFrame write) instead.
  */
final class ErrorLog(errorFolder: Path, fileSuffix: String = "FileImportError.txt",
    clock: () => ZonedDateTime = () => ZonedDateTime.now(ZoneOffset.UTC)) {

  private val dayFmt = DateTimeFormatter.ofPattern("yyyyMMdd")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy.MM.dd HH.mm")

  def logFileFor(now: ZonedDateTime): Path =
    errorFolder.resolve(s"${dayFmt.format(now)} $fileSuffix")

  /** Append one record; create folder/file if missing; throw on Fatal. */
  def write(message: String, severity: Severity): Unit = {
    val now = clock()
    Files.createDirectories(errorFolder)
    Files.writeString(
      logFileFor(now),
      s"${tsFmt.format(now)} $message${System.lineSeparator}",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    severity match {
      case Fatal => throw new RuntimeException(s"Fatal: $message")
      case NotFatal => ()
    }
  }
}
