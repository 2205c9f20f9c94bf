package graft.streaming

import java.nio.file.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.IncrementalDedup

/** Streaming cross-run dedup: documents arriving as files in a monitored
  * folder are deduplicated (a) within the stream via `dropDuplicates` on the
  * content fingerprint — Spark's keyed streaming state — and (b) against the
  * PERSISTED parquet fingerprint store of [[graft.ops.IncrementalDedup]]
  * inside `foreachBatch`, which then grows the store by the novel rows.
  *
  * Layer (b) is what survives a fresh checkpoint: re-ingesting an old file
  * after state loss still emits nothing, because content identity lives in
  * the store, not the stream state — the reference's watermark-file
  * semantics (ST1) applied to content rather than mtimes. `Trigger
  * .AvailableNow` keeps the scheduled-batch call shape of
  * [[StreamingImport]].
  *
  * In an always-on deployment `dropDuplicatesWithinWatermark` would bound
  * layer (a)'s state by event time; with drain-and-stop triggers the state
  * is bounded by the run, so plain `dropDuplicates` is exact.
  */
object StreamingDedup {

  /** @param schema   reader schema for the arriving document files (streams
    *                 can't infer); must contain a `text` column
    * @param outDir   novel rows land here as appended parquet
    */
  def start(spark: SparkSession, schema: StructType, inputDir: Path,
      storePath: Path, outDir: Path, checkpointDir: Path): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inputDir.toString)
    IncrementalDedup.withFingerprint(stream)
      .dropDuplicates("fingerprint")
      .writeStream
      .queryName("dedup-incremental")
      .option("checkpointLocation", checkpointDir.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val novel = IncrementalDedup.novel(batch,
          IncrementalDedup.readStore(batch.sparkSession, storePath.toString))
          .cache()
        try {
          novel.write.mode(SaveMode.Append).parquet(outDir.toString)
          IncrementalDedup.append(novel, storePath.toString)
        } finally novel.unpersist()
      }
      .start()
  }

  /** Drain everything currently in the folder and stop. */
  def runAvailableNow(spark: SparkSession, schema: StructType, inputDir: Path,
      storePath: Path, outDir: Path, checkpointDir: Path): Unit =
    start(spark, schema, inputDir, storePath, outDir, checkpointDir)
      .awaitTermination()
}
