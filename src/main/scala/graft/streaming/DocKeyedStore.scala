package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The shared always-on maintainer of a DOC-KEYED derived store — the
  * kernel behind [[StreamingSparse]] (5-shingle postings) and
  * [[StreamingDsir]] (hashed-feature bags). Both artifacts share one
  * algebra: each row set is a PURE FUNCTION of its document, eras are
  * doc-disjoint, so per-batch builds compose by union to the one-shot
  * batch build chop-independently, and a doc tombstone IS exact delete
  * maintenance (no partition rewrite). The [[BandedTopKMaintainer]]
  * lesson applied again (r15 s3 review — this was becoming the third
  * drifting copy of writeBatch/applyDeletes/serving): every store
  * discipline property — (lineage, batchId) tag overwrites,
  * committed-only reads excluding the batch's own tag, identity
  * novelty, intra-batch id dedup, tombstone anti-joins on ingest and
  * serving, crash-safe compaction — lives HERE exactly once and holds
  * for both instantiations by construction.
  *
  * Scale: each micro-batch pays the narrow `buildFor` pass over ITS
  * OWN docs + an id-keyed anti-join against the store's doc ids; no
  * stateful operator, per-trigger memory O(batch).
  *
  * @param storeName   subdirectory holding the tag-partitioned rows
  * @param storeSchema row schema INCLUDING the `batch STRING` tag column
  * @param inputCols   the arrival columns `buildFor` consumes (must
  *                    include `doc_id`)
  * @param buildFor    the per-batch derivation kernel — the identical
  *                    function the batch-side query/seam runs
  */
private[streaming] final class DocKeyedStoreMaintainer(
    storeName: String, storeSchema: StructType, inputCols: Seq[String],
    buildFor: DataFrame => DataFrame,
    lineageMarker: String, queryName: String) {

  private val valueCols = storeSchema.fieldNames.filterNot(_ == "batch")
  private val tombSchema = StructType.fromDDL("doc_id BIGINT")

  private def lineageId(spark: SparkSession, checkpointDir: String): String =
    StoreUtil.lineageId(spark, checkpointDir, lineageMarker)

  // committed-only: a crashed half-written tag must not serve partial
  // rows (an under-counted doc would be wrong forever — the seen
  // anti-join suppresses its re-arrival) nor poison novelty; the
  // tombstone store is a root-file append store (no tag partitions),
  // so it keeps the plain read
  private def readStore(spark: SparkSession, path: String): DataFrame =
    StoreUtil.readCommitted(spark, path, storeSchema)

  private def tombstones(spark: SparkSession, storePath: String): DataFrame =
    StoreUtil.readOrEmpty(spark, s"$storePath/tombstones", tombSchema)

  /** Record a delete batch (idempotent tombstone append); rows are
    * doc-keyed, so filtering tombstoned docs from serving reads IS
    * exact delete maintenance, and a tombstoned doc can never re-enter
    * via insert.
    */
  def applyDeletes(spark: SparkSession, storePath: String,
      ids: DataFrame): Unit =
    ids.select(col("doc_id")).distinct()
      .write.mode(SaveMode.Append).parquet(s"$storePath/tombstones")

  /** Physical reclamation via the shared crash-safe rewrite
    * ([[StoreUtil.compactStore]]: scrub first, drop exactly the
    * scrubbed tombstones last — a delete landing mid-scrub survives).
    * Run quiesced, with no concurrent [[applyDeletes]]; once compacted
    * a purged doc CAN re-enter via insert.
    */
  def compact(spark: SparkSession, storePath: String): Unit =
    StoreUtil.compactStore(spark, storePath, storeName, storeSchema,
      "doc_id")

  private def writeBatch(storePath: String, lineage: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val spark = batch.sparkSession
    val seen = readStore(spark, s"$storePath/$storeName")
      .filter(!(col("batch") <=> lit(tag))) // own partition = failed attempt
      .select(col("doc_id").as("seen_id")).distinct()
    // intra-batch dedup: two copies of a doc in ONE micro-batch both
    // pass the seen anti-join and buildFor would sum both, doubling its
    // rows permanently (r14 code-review). max_by on the payload hash —
    // not dropDuplicates, whose pick is partition-order-dependent — so
    // CONFLICTING same-id rows in one batch resolve identically on
    // every replay (r15 ADVICE); ties only between identical payloads.
    val novel = batch.select(inputCols.map(col): _*)
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct(inputCols.filterNot(_ == "doc_id").map(col): _*),
        md5(to_json(struct(inputCols.map(col): _*)))).as("_row"))
      .select(col("doc_id") +:
        inputCols.filterNot(_ == "doc_id").map(c => col(s"_row.$c")): _*)
      .join(seen, col("doc_id") === col("seen_id"), "left_anti")
      .join(tombstones(spark, storePath)
          .select(col("doc_id").as("dead_id")).distinct(),
        col("doc_id") === col("dead_id"), "left_anti")
    // localCheckpoint: the isEmpty probe and the write would otherwise
    // each re-run buildFor AND re-scan the store anti-joins
    val built = buildFor(novel).localCheckpoint()
    if (!built.isEmpty)
      built.write.mode(SaveMode.Overwrite)
        .parquet(s"$storePath/$storeName/batch=$tag")
  }

  /** The maintained store: every live value row. */
  def rows(spark: SparkSession, storePath: String): DataFrame =
    readStore(spark, s"$storePath/$storeName")
      .select(valueCols.map(col): _*)
      .join(tombstones(spark, storePath)
          .select(col("doc_id").as("dead_id")).distinct(),
        col("doc_id") === col("dead_id"), "left_anti")

  /** Drain-and-stop shape. `schema` must contain `inputCols`. */
  def start(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, checkpointDir: String): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .queryName(queryName)
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

/** Shared delegation surface of the doc-keyed maintainer facades (the
  * [[MaintainerFacade]] pattern).
  */
private[streaming] abstract class DocKeyedFacade(
    m: DocKeyedStoreMaintainer) {

  def applyDeletes(spark: SparkSession, storePath: String,
      ids: DataFrame): Unit = m.applyDeletes(spark, storePath, ids)

  def compact(spark: SparkSession, storePath: String): Unit =
    m.compact(spark, storePath)

  protected def rows(spark: SparkSession, storePath: String): DataFrame =
    m.rows(spark, storePath)

  def start(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, checkpointDir: String): StreamingQuery =
    m.start(spark, schema, inputDir, storePath, checkpointDir)

  def runAvailableNow(spark: SparkSession, schema: StructType,
      inputDir: String, storePath: String, checkpointDir: String): Unit =
    m.runAvailableNow(spark, schema, inputDir, storePath, checkpointDir)
}
