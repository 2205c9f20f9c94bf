package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.CurationOps

/** Streaming maintenance of the DSIR selection artifact (r15 third
  * session — the always-on form of [[CurationOps.dsirWeights]],
  * extending the index-family symmetry to DATA SELECTION: the
  * doc×bucket feature-bag store is to DSIR what postings are to BM25):
  * documents arriving as files in a monitored folder have their
  * hashed-unigram bags built per batch ([[CurationOps.dsirBucketsFor]]
  * — the identical kernel the batch query runs) and appended to the
  * persisted store; [[weights]] serves importance log-ratios off the
  * live store through the SAME estimate → score chain
  * ([[CurationOps.dsirWeightsFrom]]), so the store and the gate query
  * cannot drift.
  *
  * Stream ≡ batch: a doc's bag is a pure function of the doc and eras
  * are doc-disjoint, so the drained store equals the one-shot batch
  * bag table REGARDLESS of how arrivals were chopped, and the served
  * weights equal [[CurationOps.dsirWeights]] over everything seen —
  * StreamingDsirSpec pins row equality. Note the SERVING subtlety this
  * family adds: weights are GLOBAL (every admission shifts both
  * distributions and stales every stored score), which is why the
  * artifact persisted here is the additive BAG table — always exact
  * under arrival and deletion — and scores are derived at read time;
  * [[CurationOps.dsirDrift]]'s `lr_shift` is the measure that says
  * when a consumer caching derived scores must refresh.
  *
  * Exactly-once + deletes: the [[StreamingSparse]] store discipline —
  * (lineage, batchId) tag overwrites, committed-only reads excluding
  * the batch's own tag, identity novelty on doc_id (replays and
  * re-ingests are no-ops), doc tombstones filtered from every serving
  * read (bags are doc-keyed, so the tombstone IS exact maintenance:
  * the live-subset distributions are exactly the rebuild's), and
  * [[compact]] for physical reclamation via the shared crash-safe
  * rewrite.
  *
  * Scale: each micro-batch pays one narrow tokenize pass + one keyed
  * count over ITS OWN docs + an id-keyed anti-join against the store's
  * doc ids; no stateful operator, per-trigger memory O(batch). Serving
  * is the batch chain: two linear shuffles, B-row broadcasts.
  */
object StreamingDsir {

  private def lineageId(spark: SparkSession, checkpointDir: String): String =
    StoreUtil.lineageId(spark, checkpointDir, "graft-sdsir-lineage")

  private val storeSchema = StructType.fromDDL(
    "doc_id BIGINT, lang STRING, bucket BIGINT, cnt BIGINT, batch STRING")
  private val tombSchema = StructType.fromDDL("doc_id BIGINT")

  // committed-only: a crashed half-written tag must not serve partial
  // bags (an under-counted doc would get a wrong weight forever — the
  // seen anti-join suppresses its re-arrival) nor poison novelty
  private def readBags(spark: SparkSession, path: String): DataFrame =
    StoreUtil.readCommitted(spark, path, storeSchema)

  private def tombstones(spark: SparkSession, storePath: String): DataFrame =
    StoreUtil.readOrEmpty(spark, s"$storePath/tombstones", tombSchema)

  /** Record a delete batch (idempotent tombstone append); bags are
    * doc-keyed, so filtering tombstoned docs from serving reads IS
    * exact maintenance — the live distributions equal the rebuild's.
    */
  def applyDeletes(spark: SparkSession, storePath: String,
      ids: DataFrame): Unit =
    ids.select(col("doc_id")).distinct()
      .write.mode(SaveMode.Append).parquet(s"$storePath/tombstones")

  /** Physical reclamation via the shared crash-safe rewrite: scrub the
    * bag store of dead docs first, drop exactly those tombstones last.
    * Run quiesced, with no concurrent [[applyDeletes]]; once compacted
    * a purged doc CAN re-enter via insert.
    */
  def compact(spark: SparkSession, storePath: String): Unit =
    StoreUtil.compactStore(spark, storePath, "bags", storeSchema, "doc_id")

  private def writeBatch(storePath: String, lineage: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val spark = batch.sparkSession
    val seen = readBags(spark, s"$storePath/bags")
      .filter(!(col("batch") <=> lit(tag))) // own partition = failed attempt
      .select(col("doc_id").as("seen_id")).distinct()
    // dropDuplicates: two copies of a doc in ONE micro-batch both pass
    // the seen anti-join and the bag build would sum both, doubling its
    // counts permanently (the StreamingSparse r14 lesson)
    val novel = batch.select(col("doc_id"), col("lang"), col("text"))
      .dropDuplicates("doc_id")
      .join(seen, col("doc_id") === col("seen_id"), "left_anti")
      .join(tombstones(spark, storePath)
          .select(col("doc_id").as("dead_id")).distinct(),
        col("doc_id") === col("dead_id"), "left_anti")
    // localCheckpoint: the isEmpty probe and the write would otherwise
    // each re-run the tokenize build AND re-scan the store anti-joins
    val bags = CurationOps.dsirBucketsFor(novel).localCheckpoint()
    if (!bags.isEmpty)
      bags.write.mode(SaveMode.Overwrite)
        .parquet(s"$storePath/bags/batch=$tag")
  }

  /** The maintained feature-bag table: every live
    * `(doc_id, lang, bucket, cnt)` row.
    */
  def bags(spark: SparkSession, storePath: String): DataFrame =
    readBags(spark, s"$storePath/bags")
      .select(col("doc_id"), col("lang"), col("bucket"), col("cnt"))
      .join(tombstones(spark, storePath)
          .select(col("doc_id").as("dead_id")).distinct(),
        col("doc_id") === col("dead_id"), "left_anti")

  /** Importance log-ratios served off the live store — the exact
    * [[CurationOps.dsirWeights]] output over everything seen and
    * not deleted (one shared chain, [[CurationOps.dsirWeightsFrom]]).
    */
  def weights(spark: SparkSession, storePath: String): DataFrame =
    CurationOps.dsirWeightsFrom(bags(spark, storePath))

  /** Drain-and-stop shape. `schema` must contain `doc_id`, `lang`,
    * and `text`.
    */
  def start(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, checkpointDir: String): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .queryName("dsir-maintain")
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
