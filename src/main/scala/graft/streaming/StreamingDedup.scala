package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.ops.IncrementalDedup

/** Streaming cross-run dedup: documents arriving as files in a monitored
  * folder are deduplicated (a) within the stream via Spark's keyed streaming
  * state — `dropDuplicates` on the content fingerprint for drain-and-stop
  * runs, `dropDuplicatesWithinWatermark` for the always-on form — and
  * (b) against the PERSISTED parquet fingerprint store of
  * [[graft.ops.IncrementalDedup]] inside `foreachBatch`, which then grows
  * the store by the novel rows.
  *
  * Layer (b) is what survives a fresh checkpoint: re-ingesting an old file
  * after state loss still emits nothing, because content identity lives in
  * the store, not the stream state — the reference's watermark-file
  * semantics (ST1) applied to content rather than mtimes. `Trigger
  * .AvailableNow` keeps the scheduled-batch call shape of
  * [[StreamingImport]]; [[startAlwaysOn]] is the resident deployment.
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
  * All paths are strings resolved through the Hadoop FileSystem of the
  * path (including the lineage tag file), so checkpoints/stores/outputs on
  * s3a:// or hdfs:// work the same as local files — matching
  * [[IncrementalDedup.readStore]]'s deliberate FS routing.
  */
object StreamingDedup {

  private val storeSchema = StructType(Seq(
    StructField("fingerprint", StringType), StructField("batch", StringType)))

  private def lineageId(spark: SparkSession, checkpointDir: String): String =
    StoreUtil.lineageId(spark, checkpointDir, "graft-dedup-lineage")

  // committed-only (r15 s2, the family-wide read model): a crashed
  // half-written tag must not mark its fingerprints "seen" — under a
  // fresh lineage those docs would be suppressed forever while their
  // output partition stayed partial
  private def readStoreCommitted(spark: SparkSession,
      storePath: String): DataFrame =
    StoreUtil.readCommitted(spark, storePath, storeSchema)

  /** The store-guarded per-batch write shared by both deployment shapes. */
  private def writeBatch(storePath: String, outDir: String, lineage: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val store = readStoreCommitted(batch.sparkSession, storePath)
      // null-SAFE: rows whose batch tag failed to parse must count as
      // store content, not be silently dropped with the own-tag partition
      .filter(!(col("batch") <=> lit(tag))) // own partition = failed attempt
    val novel = IncrementalDedup.novel(batch, store).cache()
    try {
      // nothing novel → don't grow the store or output: a resident query
      // would otherwise mint an empty batch=<tag> partition per trigger,
      // and the store listing every batch reads would grow with query age,
      // not content. Safe under retry: same input + store-minus-own-tag is
      // deterministic, so an empty retry was an empty first attempt.
      // Exception: the FIRST batch writes the OUTPUT even when empty, so
      // outDir always exists with a schema'd (possibly empty) parquet
      // dataset — the pre-guard contract downstream readers rely on. The
      // exception does NOT extend to the store (ADVICE r3): an empty first
      // batch must not mint a stray empty batch=<tag> store partition —
      // the store gains a partition only per batch with novel content.
      val outRoot = new HPath(outDir)
      val outFs = outRoot.getFileSystem(
        batch.sparkSession.sessionState.newHadoopConf())
      val hasNovel = !novel.isEmpty
      if (hasNovel || !outFs.exists(outRoot))
        novel.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$tag")
      if (hasNovel)
        novel.select("fingerprint").distinct()
          .write.mode(SaveMode.Overwrite).parquet(s"$storePath/batch=$tag")
    } finally novel.unpersist()
  }

  /** Drain-and-stop shape: exact in-stream dedup (state bounded by the run).
    *
    * @param schema   reader schema for the arriving document files (streams
    *                 can't infer); must contain a `text` column
    * @param outDir   novel rows land here under `batch=<tag>` partitions
    */
  def start(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, outDir: String, checkpointDir: String): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    IncrementalDedup.withFingerprint(stream)
      .dropDuplicates("fingerprint")
      .writeStream
      .queryName("dedup-incremental")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(writeBatch(storePath, outDir, lineage) _)
      .start()
  }

  /** Always-on shape: a resident query on a processing-time trigger, with
    * layer (a)'s state bounded by an EVENT-TIME watermark instead of by the
    * run — `dropDuplicatesWithinWatermark` keeps a fingerprint only until
    * the watermark passes `delay` behind max(eventTimeCol), so state stays
    * O(arrival rate × delay) no matter how long the query lives. A
    * duplicate arriving later than `delay` after the original is NOT caught
    * by stream state anymore — but layer (b)'s store still suppresses it,
    * which is the division of labor: state handles the recent burst
    * cheaply, the store owns content identity forever.
    *
    * LATE-DATA CONTRACT: a row whose event time is already more than
    * `delay` behind the stream's max event time is dropped by the stateful
    * operator BEFORE foreachBatch — including never-seen content. That is
    * the price of bounded state; pick `delay` to cover real arrival
    * lateness, and run genuine backfills (data older than `delay`) through
    * [[backfill]] — the batch path against the SAME store and output
    * layout — instead of dropping them into the monitored folder. (Plain
    * [[graft.ops.IncrementalDedup.append]] would write files at the store
    * root, which does not parse against the streaming store's `batch=`
    * partition layout.)
    *
    * The store gains at most one `batch=` partition per NON-EMPTY batch; in
    * a long-lived deployment fold them periodically with [[compactStore]]
    * so per-trigger store reads stay O(content), not O(query age).
    *
    * @param schema       must contain `text` and `eventTimeCol` (timestamp)
    * @param delay        watermark delay, e.g. "10 minutes"
    * @param interval     processing-time trigger interval, e.g. "10 seconds"
    */
  def startAlwaysOn(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, outDir: String, checkpointDir: String,
      eventTimeCol: String = "ts", delay: String = "10 minutes",
      interval: String = "10 seconds"): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    IncrementalDedup.withFingerprint(stream)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")
      .writeStream
      .queryName("dedup-incremental-always-on")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch(writeBatch(storePath, outDir, lineage) _)
      .start()
  }

  /** Batch backfill against the streaming store: dedup `docs` (must contain
    * a `text` column) against the store and all novel rows are written to
    * the same `batch=` layout the streaming query uses — the path for data
    * that arrives later than the always-on watermark `delay` tolerates.
    * Safe to run while the query is stopped or between triggers (it only
    * ADDS a partition; concurrent batches exclude nothing but their own
    * tag).
    */
  def backfill(spark: SparkSession, docs: DataFrame,
      storePath: String, outDir: String): Unit = {
    val tag = s"backfill-${java.util.UUID.randomUUID().toString.take(8)}"
    val store = readStoreCommitted(spark, storePath)
    val novel = IncrementalDedup
      .novel(IncrementalDedup.withFingerprint(docs)
        .dropDuplicates("fingerprint"), store)
      .cache()
    try if (!novel.isEmpty) {
      novel.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$tag")
      novel.select("fingerprint").distinct()
        .write.mode(SaveMode.Overwrite).parquet(s"$storePath/batch=$tag")
    } finally novel.unpersist()
  }

  /** Housekeeping for resident deployments: fold every `batch=` store
    * partition into a single compacted one (distinct fingerprints),
    * bounding the listing + scan each trigger performs. NOT atomic against
    * a concurrently running query — call while the query is stopped (e.g.
    * between `AvailableNow` drains, or around a planned restart of
    * [[startAlwaysOn]]).
    *
    * Crash-safe by construction: the store root is NEVER deleted or
    * renamed. The compacted partition is staged outside the root, renamed
    * IN (after which the store is duplicated, and duplicate fingerprints
    * are harmless — the store is a set under an anti-join), and only then
    * are the old partitions removed one by one. A crash at any point
    * leaves a correct store; re-running compactStore converges it.
    */
  def compactStore(spark: SparkSession, storePath: String): Unit = {
    val root = new HPath(storePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val oldParts = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
    if (oldParts.length <= 1) return // already compact
    val compactTag = s"compacted-${java.util.UUID.randomUUID().toString.take(8)}"
    val staging = new HPath(root.getParent, root.getName + ".compacting")
    if (fs.exists(staging)) fs.delete(staging, true)
    // committed-only fold: a crashed remnant partition contributes
    // nothing and is deleted with the other old partitions below
    readStoreCommitted(spark, storePath)
      .select("fingerprint").distinct()
      .write.mode(SaveMode.Overwrite)
      .parquet(new HPath(staging, s"batch=$compactTag").toString)
    require(fs.rename(new HPath(staging, s"batch=$compactTag"),
        new HPath(root, s"batch=$compactTag")),
      s"compactStore: rename of batch=$compactTag into $root failed")
    oldParts.foreach(p => require(fs.delete(p, true),
      s"compactStore: could not delete stale partition $p (store remains " +
        "correct but uncompacted — re-run compactStore)"))
    fs.delete(staging, true)
  }

  /** Drain everything currently in the folder and stop. */
  def runAvailableNow(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, outDir: String, checkpointDir: String): Unit =
    start(spark, schema, inputDir, storePath, outDir, checkpointDir)
      .awaitTermination()
}
