package graft.state

import java.nio.file.{Files, Path}
import java.time.Instant

/** ST1/K8 watermark state (SURVEY.md §2.10): one scalar per table persisted
  * in a text file; gate = "process only if source mtime exceeds stored value"
  * (/root/reference/ExcelToCSVexport.ps1:146-165), default beginning-of-time
  * when absent (:161), advanced only after a successful batch (:225).
  *
  * Stored as epoch-millis (internal format — the reference's .NET ticks are
  * not a compatibility surface, SURVEY.md §2.7 F-D3). At scale this state
  * moves to the Structured Streaming checkpoint (graft.streaming);
  * this class is the batch-mode equivalent.
  */
final class Watermark(stateFile: Path) {

  /** Stored watermark, or Instant.EPOCH when no state exists. */
  def read(): Instant =
    if (Files.exists(stateFile))
      Instant.ofEpochMilli(Files.readString(stateFile).trim.toLong)
    else Instant.EPOCH

  /** F4 modified-since gate. State is millisecond-granular, so the probe is
    * truncated likewise — file mtimes carry nanoseconds on Linux and would
    * otherwise always test newer than their own committed watermark.
    */
  def isNewerThanWatermark(sourceMtime: Instant): Boolean =
    Instant.ofEpochMilli(sourceMtime.toEpochMilli).isAfter(read())

  /** K8 commit — call only after the sink succeeded. */
  def commit(value: Instant): Unit = {
    Files.createDirectories(stateFile.getParent)
    Files.writeString(stateFile, value.toEpochMilli.toString)
  }
}
