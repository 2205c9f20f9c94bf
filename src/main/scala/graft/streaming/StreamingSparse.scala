package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.SparseIndex

/** Streaming inverted-index maintenance (r14 — the third index family's
  * always-on form, making the [[StreamingIvf]] / [[StreamingHnsw]] story
  * symmetric across IVF, graph, and sparse): documents arriving as files
  * in a monitored folder have their 5-shingle postings built per batch
  * ([[SparseIndex.buildFor]] — the identical kernel the batch seam runs)
  * and appended to the persisted postings store, which IS the index
  * ([[SparseIndex.termStats]] serves BM25's df/tf mass off it).
  *
  * Stream ≡ batch: a doc's postings rows are a pure function of the doc
  * and eras are doc-disjoint ([[SparseIndex.insert]]'s union algebra),
  * so the drained store equals the one-shot batch build REGARDLESS of
  * how arrivals were chopped — StreamingSparseSpec pins exact row
  * equality, term stats included.
  *
  * Exactly-once + deletes: the [[StreamingIvf]] store discipline —
  * (lineage, batchId) tag overwrites, reads excluding the batch's own
  * tag, identity novelty on doc_id (replays and re-ingests are no-ops),
  * doc tombstones filtered from every serving read ([[applyDeletes]];
  * postings are doc-keyed, so the tombstone IS exact delete maintenance).
  *
  * Scale: each micro-batch pays one narrow shingle pass + one
  * (doc, shingle) keyed count over ITS OWN docs + an id-keyed anti-join
  * against the store's doc ids; no stateful operator, per-trigger memory
  * O(batch).
  */
object StreamingSparse {

  private def lineageId(spark: SparkSession, checkpointDir: String): String =
    StoreUtil.lineageId(spark, checkpointDir, "graft-ssparse-lineage")

  private val storeSchema = StructType.fromDDL(
    "doc_id BIGINT, s STRING, tf BIGINT, batch STRING")
  private val tombSchema = StructType.fromDDL("doc_id BIGINT")

  // committed-only (r15 s2): a crashed half-written tag must not serve
  // partial tf rows nor mark its docs "seen" under a fresh lineage; the
  // tombstone store is a root-file append store (no tag partitions), so
  // it keeps the plain read
  private def readPostings(spark: SparkSession, path: String): DataFrame =
    StoreUtil.readCommitted(spark, path, storeSchema)

  private def tombstones(spark: SparkSession, storePath: String): DataFrame =
    StoreUtil.readOrEmpty(spark, s"$storePath/tombstones", tombSchema)

  /** Record a delete batch (idempotent tombstone append); postings are
    * doc-keyed, so filtering tombstoned docs from serving reads IS exact
    * delete maintenance — no partition rewrite, and a tombstoned doc can
    * never re-enter via insert.
    */
  def applyDeletes(spark: SparkSession, storePath: String,
      ids: DataFrame): Unit =
    ids.select(col("doc_id")).distinct()
      .write.mode(SaveMode.Append).parquet(s"$storePath/tombstones")

  /** Physical reclamation (r15 — the [[StreamingIvf.compact]] symmetry
    * for the sparse family): postings are doc-keyed, so the tombstone IS
    * exact serving maintenance and compaction is storage hygiene —
    * rewrite the postings store without dead docs, then drop exactly
    * those docs' tombstones ([[StoreUtil.compactStore]]: scrub first,
    * drop last, anti-join rewrite so a delete landing mid-scrub is
    * retained). Once compacted, a purged doc CAN re-enter via insert —
    * the caller asserts the ids can no longer arrive. Run quiesced, with
    * no concurrent [[applyDeletes]].
    */
  def compact(spark: SparkSession, storePath: String): Unit =
    StoreUtil.compactStore(spark, storePath, "postings", storeSchema,
      "doc_id")

  private def writeBatch(storePath: String, lineage: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val spark = batch.sparkSession
    val seen = readPostings(spark, s"$storePath/postings")
      .filter(!(col("batch") <=> lit(tag))) // own partition = failed attempt
      .select(col("doc_id").as("seen_id")).distinct()
    // dropDuplicates: two copies of a doc in ONE micro-batch both pass
    // the seen anti-join and buildFor would sum their shingles, doubling
    // tf permanently (r14 code-review)
    val novel = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id")
      .join(seen, col("doc_id") === col("seen_id"), "left_anti")
      .join(tombstones(spark, storePath)
          .select(col("doc_id").as("dead_id")).distinct(),
        col("doc_id") === col("dead_id"), "left_anti")
    // localCheckpoint: the isEmpty probe and the write would otherwise
    // each re-run the shingle build AND re-scan the store anti-joins
    val postings = SparseIndex.buildFor(novel).localCheckpoint()
    if (!postings.isEmpty)
      postings.write.mode(SaveMode.Overwrite)
        .parquet(s"$storePath/postings/batch=$tag")
  }

  /** The maintained postings: every live `(doc_id, s, tf)` row. */
  def postings(spark: SparkSession, storePath: String): DataFrame =
    readPostings(spark, s"$storePath/postings")
      .select(col("doc_id"), col("s"), col("tf"))
      .join(tombstones(spark, storePath)
          .select(col("doc_id").as("dead_id")).distinct(),
        col("doc_id") === col("dead_id"), "left_anti")

  /** Drain-and-stop shape. `schema` must contain `doc_id` and `text`. */
  def start(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, checkpointDir: String): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .queryName("sparse-maintain")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(writeBatch(storePath, lineage) _)
      .start()
  }

  /** Drain everything currently in the folder and stop. */
  def runAvailableNow(spark: SparkSession, schema: StructType,
      inputDir: String, storePath: String, checkpointDir: String): Unit =
    start(spark, schema, inputDir, storePath, checkpointDir)
      .awaitTermination()
}
