package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
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
  * Exactly-once: `foreachBatch` is at-least-once, so both sinks are written
  * as per-batch partition OVERWRITES under a tag unique to (checkpoint
  * lineage, batchId) — a retried batch rewrites its own partitions with
  * identical content instead of appending duplicates, and the store read
  * excludes the batch's own partition so a half-written previous attempt
  * can't hide rows from the retry. The lineage id is persisted inside the
  * checkpoint directory: a restart reuses it (same tags → idempotent), a
  * fresh checkpoint gets a new one (batchId restarts at 0 but tags can't
  * collide with old partitions).
  *
  * In an always-on deployment `dropDuplicatesWithinWatermark` would bound
  * layer (a)'s state by event time; with drain-and-stop triggers the state
  * is bounded by the run, so plain `dropDuplicates` is exact.
  */
object StreamingDedup {

  private val storeSchema = StructType(Seq(
    StructField("fingerprint", StringType), StructField("batch", StringType)))

  private def lineageId(checkpointDir: Path): String = {
    Files.createDirectories(checkpointDir)
    val f = checkpointDir.resolve("graft-dedup-lineage")
    if (Files.exists(f)) Files.readString(f).trim
    else {
      val id = java.util.UUID.randomUUID().toString.take(8)
      Files.writeString(f, id); id
    }
  }

  /** @param schema   reader schema for the arriving document files (streams
    *                 can't infer); must contain a `text` column
    * @param outDir   novel rows land here under `batch=<tag>` partitions
    */
  def start(spark: SparkSession, schema: StructType, inputDir: Path,
      storePath: Path, outDir: Path, checkpointDir: Path): StreamingQuery = {
    val lineage = lineageId(checkpointDir)
    val stream = spark.readStream.schema(schema).parquet(inputDir.toString)
    IncrementalDedup.withFingerprint(stream)
      .dropDuplicates("fingerprint")
      .writeStream
      .queryName("dedup-incremental")
      .option("checkpointLocation", checkpointDir.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tag = s"$lineage-$batchId"
        val store = IncrementalDedup
          .readStore(batch.sparkSession, storePath.toString, storeSchema)
          .filter(col("batch") =!= tag) // own partition = a failed attempt
        val novel = IncrementalDedup.novel(batch, store).cache()
        try {
          novel.write.mode(SaveMode.Overwrite)
            .parquet(s"$outDir/batch=$tag")
          novel.select("fingerprint").distinct()
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$storePath/batch=$tag")
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
