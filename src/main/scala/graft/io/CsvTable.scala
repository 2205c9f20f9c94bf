package graft.io

import java.io.IOException
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 CSV scan + K1/K2 CSV sinks (SURVEY.md §2.1/§2.2).
  *
  * Reads are header-based and all-string — `inferSchema=false` deliberately
  * (the reference's `Import-Csv` yields string property bags,
  * /root/reference/CSVtoSQLimport.ps1:210; typing is the sink's problem).
  *
  * Writes preserve the reference's one-file-per-table shape
  * (/root/reference/ExcelToCSVexport.ps1:210) by writing a Spark part file
  * and moving it to the exact target path. `coalesce(1)` here is fidelity to
  * the reference contract, NOT the 100 TB design — at scale use
  * `df.write.csv(dir)` partitioned output (see README scale notes).
  */
object CsvTable {

  def read(spark: SparkSession, path: Path): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("mode", "PERMISSIVE")
      .csv(path.toString)

  /** K1: overwrite `target` with a single headered UTF-8 CSV file. */
  def writeSingleFile(df: DataFrame, target: Path): Unit = {
    val tmp = Files.createTempDirectory("graft-csv-out")
    val stage = tmp.resolve("stage")
    df.coalesce(1).write
      .mode("overwrite")
      .option("header", "true")
      .csv(stage.toString)
    val part = scala.util.Using.resource(Files.list(stage)) { s =>
      s.iterator.asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IOException(s"no part file written under $stage"))
    }
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    scala.util.Using.resource(Files.walk(tmp)) { s =>
      s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** K2 lock-fallback write
    * (/root/reference/InvoiceFileSearchFromSQL.ps1:143-151): if the target
    * can't be replaced (e.g. held open), write to a date-suffixed sibling
    * instead. Returns the path actually written.
    */
  def writeWithLockFallback(df: DataFrame, target: Path,
      now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): Path =
    try {
      writeSingleFile(df, target)
      target
    } catch {
      case _: IOException =>
        val day = DateTimeFormatter.ofPattern("yyyyMMdd").format(now)
        val fallback = target.resolveSibling(
          target.getFileName.toString.replaceAll("\\.csv$", s"_$day.csv"))
        writeSingleFile(df, fallback)
        fallback
    }
}
