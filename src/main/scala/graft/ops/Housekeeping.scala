package graft.ops

import java.nio.file.{Files, Path}
import java.time.Instant
import java.time.temporal.ChronoUnit
import scala.jdk.CollectionConverters._
import graft.config.HousekeepingConfig

/** F7/ST5 retention job (SURVEY.md §2.3/§2.10): delete files older than the
  * TTL in the monitored folders. The reference collects the folder list but
  * never implemented the delete (/root/reference/FileHousekeeping.ps1:1-13
  * spec comment; script ends at :86) — we implement the stated intent and
  * record the divergence (SURVEY.md §7.6.2).
  *
  * `dryRun=true` returns the deletion candidates without touching anything —
  * the auditable form. In-data retention over event tables is the
  * `retention_filter` query (RefPipelines).
  */
object Housekeeping {

  final case class Candidate(path: Path, mtime: Instant)

  def candidates(cfg: HousekeepingConfig,
      now: Instant = Instant.now()): Seq[Candidate] = {
    val cutoff = now.minus(cfg.maxAgeDays.toLong, ChronoUnit.DAYS)
    cfg.folders.filter(Files.isDirectory(_)).flatMap { dir =>
      scala.util.Using.resource(Files.list(dir)) { s =>
        s.iterator.asScala
          .filter(Files.isRegularFile(_))
          .map(p => Candidate(p, Files.getLastModifiedTime(p).toInstant))
          .filter(_.mtime.isBefore(cutoff))
          .toSeq
      }
    }
  }

  /** Returns the files actually deleted. */
  def run(cfg: HousekeepingConfig, dryRun: Boolean = false,
      now: Instant = Instant.now()): Seq[Candidate] = {
    val toDelete = candidates(cfg, now)
    if (!dryRun) toDelete.foreach(c => Files.deleteIfExists(c.path))
    toDelete
  }
}
