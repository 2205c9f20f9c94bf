package graft.io

import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

/** K4/K5 post-commit file moves (SURVEY.md §2.2).
  *
  * Archive: a consumed input leaves the input folder exactly once, moved to
  * the Completed folder under a `"yyyy.MM.dd HH.mm "` prefix
  * (/root/reference/CSVtoSQLimport.ps1:257-264).
  *
  * Quarantine: an unconsumed previous export is moved to the error folder as
  * `"Unprocessed <name> <ts>.csv"` before being replaced
  * (/root/reference/ExcelToCSVexport.ps1:195-207) — ST3 unconsumed-output
  * detection kept as an auditable event.
  */
object Archive {
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy.MM.dd HH.mm")

  def archiveCompleted(file: Path, completedDir: Path,
      now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): Path = {
    Files.createDirectories(completedDir)
    val target = completedDir.resolve(
      s"${tsFmt.format(now)} ${file.getFileName.toString}")
    Files.move(file, target, StandardCopyOption.REPLACE_EXISTING)
    target
  }

  /** Returns Some(quarantined path) if `file` existed (collision), None if
    * there was nothing to quarantine.
    */
  def quarantineUnprocessed(file: Path, errorDir: Path, label: String,
      now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): Option[Path] =
    if (!Files.exists(file)) None
    else {
      Files.createDirectories(errorDir)
      val target = errorDir.resolve(s"Unprocessed $label ${tsFmt.format(now)}.csv")
      Files.move(file, target, StandardCopyOption.REPLACE_EXISTING)
      Some(target)
    }
}
