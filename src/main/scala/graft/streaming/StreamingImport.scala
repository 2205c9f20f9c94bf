package graft.streaming

import java.nio.file.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.config.ImportConfig
import graft.io.TableSink
import graft.ops.ImportPipeline

/** ST2 monitored-folder pickup as Structured Streaming (SURVEY.md §2.10):
  * the reference's scheduled-batch loop (discover → import → move to
  * Completed, /root/reference/CSVtoSQLimport.ps1:96,257-264) is natively a
  * file-source stream with archival cleanup:
  *
  *  - new-file detection == the watermark gate (ST1) — the checkpoint
  *    replaces the last-imported text file, and "only advance on success"
  *    (/root/reference/ExcelToCSVexport.ps1:225) is the checkpoint's
  *    commit-after-sink contract, for free;
  *  - `cleanSource=archive` + `sourceArchiveDir` == the Completed move (K4),
  *    each file consumed exactly once;
  *  - `Trigger.AvailableNow` == the Task-Scheduler cadence: drain what's
  *    there, then stop — a scheduled batch with streaming exactly-once
  *    bookkeeping.
  *
  * The same ImportPipeline.transform runs inside foreachBatch, so batch and
  * streaming share one tested row pipeline (sanitize → date-convert → PK
  * filter → project).
  */
object StreamingImport {

  /** All-string schema is required up front (streams can't infer) — faithful
    * to the reference's header-string rows; callers pass the CSV's header.
    */
  def stringSchema(columns: Seq[String]): StructType =
    StructType(columns.map(StructField(_, StringType, nullable = true)))

  def start(spark: SparkSession, cfg: ImportConfig, columns: Seq[String],
      sink: TableSink, checkpointDir: Path, inputDir: Path,
      archiveDir: Path): StreamingQuery = {
    val stream: DataFrame = spark.readStream
      .schema(stringSchema(columns))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir.toString)
      .option("maxFilesPerTrigger", "1000")
      .csv(inputDir.toString)

    stream.writeStream
      .queryName(s"import-${cfg.importFileName}")
      .option("checkpointLocation", checkpointDir.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val out = ImportPipeline.transform(batch, cfg)
          sink.write(out, cfg.table)
        }
      }
      .start()
  }

  /** Drain everything currently in the folder and stop (the scheduled-batch
    * call shape).
    */
  def runAvailableNow(spark: SparkSession, cfg: ImportConfig,
      columns: Seq[String], sink: TableSink, checkpointDir: Path,
      inputDir: Path, archiveDir: Path): Unit = {
    val q = start(spark, cfg, columns, sink, checkpointDir, inputDir, archiveDir)
    q.awaitTermination()
  }
}
