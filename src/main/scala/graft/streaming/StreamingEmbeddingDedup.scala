package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.VectorFunctions.{dot, normalize, signLshBuckets, toDoubleArray}

/** Streaming EMBEDDING near-dup (r11 — VERDICT r10 #6): vectors arriving
  * as files in a monitored folder are matched against everything seen so
  * far via banded sign-LSH, and every verified near-dup PAIR
  * (cos ≥ threshold) is emitted exactly once — the streaming form of
  * [[graft.ops.DedupOps.dedupEmbeddingLsh]], completing the streaming
  * family's modality gap (fingerprint dedup covered text; this covers
  * embeddings).
  *
  * Design — the [[StreamingDedup]] store architecture carrying the
  * [[graft.ops.DedupOps.incrementalDedupEdges]] maintenance algebra:
  * each micro-batch computes its rows' band buckets (the same
  * [[graft.functions.expressions.SignLshBuckets]] expression the batch
  * operator uses), unions them with the persisted BUCKET STORE
  * (label, band, bucket, vec_id, v — everything already seen), and joins
  * same-bucket collisions with ≥ 1 NEW endpoint — delta × (base ∪ delta),
  * never base × base again. Exact-cosine verification and the canonical
  * (min, max) pair orientation make each emitted pair a pure function of
  * its two endpoints, so the DRAINED stream's output is EXACTLY the batch
  * operator's row set regardless of how arrivals were chopped into
  * batches or ordered within one (pinned in StreamingDedupSpec): a pair
  * is emitted in the batch where its LATER endpoint arrives, and both
  * endpoints being in the store afterwards means it can never re-emit.
  *
  * Why not `dropDuplicatesWithinWatermark` on the bucket key (the r10
  * verdict's sketch): that keeps one REPRESENTATIVE row per bucket —
  * which row survives depends on intra-batch processing order, and
  * near-dup pairs (the batch operator's actual output) are lost entirely.
  * The store form is deterministic, emits the pairs, and needs no
  * stateful operator at all — state lives in the store, so an always-on
  * deployment's memory is O(batch), not O(stream age); the store itself
  * grows with CONTENT (the same curve the batch operator's input does)
  * and is the queryable audit artifact a production pipeline wants
  * anyway (the [[graft.ops.DedupEdges]] story). Exactly-once follows
  * [[StreamingDedup]]: per-batch partition overwrites under a
  * (lineage, batchId) tag, the store read excluding the batch's own tag
  * so a retried half-write can't hide rows from the retry.
  */
object StreamingEmbeddingDedup {

  /** (vec_id, label, band, bucket, v) — banded sign-LSH buckets plus the
    * normalized vector, exactly the batch operator's candidate keys.
    */
  private[streaming] def banded(rows: DataFrame, bitsPerBand: Int,
      bands: Int): DataFrame =
    rows.select(col("vec_id"), col("label"),
        normalize(toDoubleArray(col("embedding"))).as("v"))
      .select(col("vec_id"), col("label"), col("v"),
        posexplode(signLshBuckets(col("v"), bitsPerBand, bands)))
      .select(col("vec_id"), col("label"), col("pos").as("band"),
        col("col").as("bucket"), col("v"))

  private def lineageId(spark: SparkSession, checkpointDir: String): String =
    StoreUtil.lineageId(spark, checkpointDir, "graft-embdedup-lineage")

  private def storeSchema: StructType = StructType.fromDDL(
    "vec_id BIGINT, label INT, band INT, bucket BIGINT, " +
      "v ARRAY<DOUBLE>, batch STRING")

  // committed-only (r15 s2, the family-wide read model): a crashed
  // half-written tag must not mark its vec_ids "seen" (their pairs were
  // never fully emitted) nor contribute partial candidate rows
  private def readStore(spark: SparkSession, path: String): DataFrame =
    StoreUtil.readCommitted(spark, path, storeSchema)

  /** The delta × (base ∪ delta) pair emission shared by both shapes. */
  private def writeBatch(storePath: String, outDir: String, lineage: String,
      threshold: Double, bitsPerBand: Int, bands: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val spark = batch.sparkSession
    val base = readStore(spark, storePath)
      .filter(!(col("batch") <=> lit(tag))) // own partition = failed attempt
      .select(col("vec_id"), col("label"), col("band"), col("bucket"),
        col("v"))
      .withColumn("is_new", lit(false))
    // identity novelty (the IncrementalDedup.novel discipline): a vec_id
    // already in the store is a re-ingest — processing it as delta would
    // re-emit every pair it participates in (and self-pair is only
    // excluded by the id inequality). A fresh-checkpoint re-drain of old
    // files must emit nothing.
    val delta = banded(batch, bitsPerBand, bands)
      .join(base.select(col("vec_id").as("seen_id")).distinct(),
        col("vec_id") === col("seen_id"), "left_anti")
      .withColumn("is_new", lit(true))
    val un = base.union(delta)
    val a = un.as("a"); val b = un.as("b")
    // same-bucket collisions with ≥1 new endpoint, canonical orientation —
    // the incremental_dedup_edges candidate class; pairs already emitted
    // (both endpoints stored) can never reappear
    val pairs = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.label") === col("b.label") &&
        col("a.vec_id") < col("b.vec_id") &&
        (col("a.is_new") || col("b.is_new")))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.v").as("v_a"), col("b.v").as("v_b"))
      .distinct() // multi-band collisions of the same pair
      .select(col("vec_a"), col("vec_b"),
        dot(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
      .cache()
    try {
      val outRoot = new HPath(outDir)
      val outFs = outRoot.getFileSystem(spark.sessionState.newHadoopConf())
      val hasPairs = !pairs.isEmpty
      // first batch always writes the output so outDir exists schema'd;
      // the store, as in StreamingDedup, only gains non-empty partitions —
      // but here EVERY batch with rows grows the store (its vectors are
      // future pair endpoints even when they pair with nothing yet)
      if (hasPairs || !outFs.exists(outRoot))
        pairs.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$tag")
      if (!delta.isEmpty)
        delta.drop("is_new")
          .write.mode(SaveMode.Overwrite).parquet(s"$storePath/batch=$tag")
    } finally pairs.unpersist()
  }

  /** Drain-and-stop shape: everything currently in the folder, then stop.
    * `schema` must contain `vec_id`, `label`, `embedding`.
    */
  def start(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, outDir: String, checkpointDir: String,
      threshold: Double = 0.35, bitsPerBand: Int = 4,
      bands: Int = 20): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .queryName("embedding-dedup")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(
        writeBatch(storePath, outDir, lineage, threshold, bitsPerBand,
          bands) _)
      .start()
  }

  /** Always-on shape: a resident processing-time query. No stateful
    * operator — per-trigger memory is O(batch); content identity lives
    * in the bucket store, exactly as in [[StreamingDedup]]'s layer (b).
    */
  def startAlwaysOn(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, outDir: String, checkpointDir: String,
      threshold: Double = 0.35, bitsPerBand: Int = 4, bands: Int = 20,
      interval: String = "10 seconds"): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .queryName("embedding-dedup-always-on")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(interval))
      .foreachBatch(
        writeBatch(storePath, outDir, lineage, threshold, bitsPerBand,
          bands) _)
      .start()
  }

  /** Drain everything currently in the folder and stop. */
  def runAvailableNow(spark: SparkSession, schema: StructType,
      inputDir: String, storePath: String, outDir: String,
      checkpointDir: String): Unit =
    start(spark, schema, inputDir, storePath, outDir, checkpointDir)
      .awaitTermination()
}
