package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.VectorFunctions.toDoubleArray

/** Streaming IVF index maintenance (r14 — VERDICT r13 #5): the always-on
  * form of the batch `incremental_ivf` maintenance algebra. Vectors
  * arriving as files in a monitored folder are assigned against a FROZEN
  * persisted coarse quantizer (per-label centroids trained on the base
  * snapshot — [[graft.ops.SimilarityOps.ivfCentroids]], the identical
  * kernel the batch query runs) and appended to a persisted ASSIGNMENT
  * store — which IS the IVF index: `(vec_id, cid, d)` is the posting
  * list membership every nprobe search reads, and the per-bucket stats
  * (`counts`) are one keyed aggregate over it.
  *
  * Stream ≡ batch: assignment is a pure per-vector function of the frozen
  * centroids (argmin rounded squared distance, (d, cid) tie-break), so
  * the drained store equals the one-shot batch assignment of the same
  * vectors REGARDLESS of how arrivals were chopped into micro-batches —
  * StreamingIvfSpec pins exact row equality, the StreamingCdc /
  * StreamingDedup convention.
  *
  * Exactly-once under foreachBatch's at-least-once: per-batch partition
  * overwrite under a (lineage, batchId) tag, the store read excluding the
  * batch's own tag (a retried half-write can't hide rows from its
  * retry) — the [[StreamingEmbeddingDedup]] discipline. Identity novelty:
  * a vec_id already in the store is a re-ingest and is skipped (a
  * fresh-checkpoint re-drain of old files grows nothing — the
  * IncrementalDedup.novel discipline); without it every replay would
  * double-count bucket stats.
  *
  * Scale: the quantizer is labels × d (broadcast by construction); each
  * micro-batch does one narrow broadcast-assign pass + an id-keyed
  * anti-join against the store's id column; no stateful operator — the
  * index lives in the store, per-trigger memory is O(batch).
  */
object StreamingIvf {

  /** Train and persist the frozen quantizer from a base-era embeddings
    * frame (`vec_id, label, embedding`) — run once per index lifetime;
    * maintenance never retrains (drift is watched via `incremental_ivf`'s
    * dist_drift signal and answered by a rebuild, not a silent retrain).
    */
  def trainQuantizer(base: DataFrame, centroidsPath: String): Unit =
    graft.ops.SimilarityOps.ivfCentroids(
        base.select(col("vec_id"), col("label"),
          toDoubleArray(col("embedding")).as("v")))
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath)

  private def lineageId(spark: SparkSession, checkpointDir: String): String =
    StoreUtil.lineageId(spark, checkpointDir, "graft-ivf-lineage")

  private def storeSchema: StructType = StructType.fromDDL(
    "vec_id BIGINT, cid INT, d DOUBLE, batch STRING")

  // committed-only (r15 s2): a crashed half-written tag must not serve
  // partial assignments nor mark its ids "seen" under a fresh lineage
  private def readStore(spark: SparkSession, path: String): DataFrame =
    StoreUtil.readCommitted(spark, path, storeSchema)

  private def writeBatch(centroidsPath: String, storePath: String,
      lineage: String)(batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val spark = batch.sparkSession
    val seen = readStore(spark, s"$storePath/assign")
      .filter(!(col("batch") <=> lit(tag))) // own partition = failed attempt
      .select(col("vec_id").as("seen_id")).distinct()
    // dropDuplicates: two copies of an id in ONE micro-batch both pass
    // the seen anti-join (r14 code-review); tombstone anti-join: a
    // pre-deleted id arriving later must never enter the store (the
    // StreamingHnsw/StreamingSparse family invariant)
    val novel = batch
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .dropDuplicates("vec_id")
      .join(seen, col("vec_id") === col("seen_id"), "left_anti")
      .join(tombstones(spark, storePath)
          .select(col("vec_id").as("dead_id")).distinct(),
        col("vec_id") === col("dead_id"), "left_anti")
    val cents = spark.read.parquet(centroidsPath)
      .select(col("cid"), col("cv"))
    // localCheckpoint: the isEmpty probe and the write would otherwise
    // each re-run the assignment AND re-scan the store for the anti-joins
    val assigned = graft.ops.SimilarityOps.ivfAssign(novel, cents)
      .localCheckpoint()
    if (!assigned.isEmpty)
      assigned.write.mode(SaveMode.Overwrite)
        .parquet(s"$storePath/assign/batch=$tag")
  }

  private val tombSchema = StructType.fromDDL("vec_id BIGINT")

  /** Record a delete batch: ids land as tombstones and every serving
    * read excludes them — deletes never rewrite the assignment
    * partitions (the hnsw_tombstone_recall / knn_delete_repair delete
    * discipline; for IVF the tombstone IS exact maintenance, because
    * bucket stats are additive over disjoint vectors). Re-applying a
    * delete is a no-op (anti-join semantics), so the call is idempotent
    * under retries.
    */
  def applyDeletes(spark: SparkSession, storePath: String,
      ids: DataFrame): Unit =
    ids.select(col("vec_id")).distinct()
      .write.mode(SaveMode.Append).parquet(s"$storePath/tombstones")

  private def tombstones(spark: SparkSession, storePath: String): DataFrame =
    StoreUtil.readOrEmpty(spark, s"$storePath/tombstones", tombSchema)

  /** Physical reclamation (r15 — the [[StreamingHnsw.purgeTombstones]]
    * symmetry for the IVF family): tombstones ARE exact serving
    * maintenance here, so "compaction" is purely storage hygiene —
    * rewrite the assignment store without the dead rows, then drop
    * exactly those ids' tombstones ([[StoreUtil.compactStore]]: scrub
    * first, drop last, anti-join rewrite so a delete landing mid-scrub
    * is retained). Once compacted, a purged id CAN re-enter via insert —
    * calling this is the deployment's statement that the ids can no
    * longer arrive (bounded storage traded for the re-ingest gate). Run
    * quiesced, with no concurrent [[applyDeletes]].
    */
  def compact(spark: SparkSession, storePath: String): Unit =
    StoreUtil.compactStore(spark, storePath, "assign", storeSchema, "vec_id")

  /** The maintained index: every live assignment (tombstoned ids
    * excluded).
    */
  def assignments(spark: SparkSession, storePath: String): DataFrame =
    readStore(spark, s"$storePath/assign").select(col("vec_id"), col("cid"), col("d"))
      .join(tombstones(spark, storePath)
          .select(col("vec_id").as("dead_id")).distinct(),
        col("vec_id") === col("dead_id"), "left_anti")

  /** Per-bucket serving stats over the maintained index. */
  def counts(spark: SparkSession, storePath: String): DataFrame =
    assignments(spark, storePath)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("d")), 4).as("sum_d"))

  /** Drain-and-stop shape: assign everything currently in the folder
    * against the persisted quantizer, then stop. `schema` must contain
    * `vec_id` and `embedding`.
    */
  def start(spark: SparkSession, schema: StructType, inputDir: String,
      centroidsPath: String, storePath: String,
      checkpointDir: String): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .queryName("ivf-maintain")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(writeBatch(centroidsPath, storePath, lineage) _)
      .start()
  }

  /** Drain everything currently in the folder and stop. */
  def runAvailableNow(spark: SparkSession, schema: StructType,
      inputDir: String, centroidsPath: String, storePath: String,
      checkpointDir: String): Unit =
    start(spark, schema, inputDir, centroidsPath, storePath, checkpointDir)
      .awaitTermination()
}
