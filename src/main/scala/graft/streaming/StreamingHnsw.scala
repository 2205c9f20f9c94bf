package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.VectorFunctions.{normalize, toDoubleArray}
import graft.ops.{HnswIndex, SimilarityOps}

/** Streaming HNSW index maintenance (r14 — VERDICT r13 #5's second half,
  * wired once `incremental_hnsw` landed): vectors arriving as files in a
  * monitored folder are INSERTED into the persisted bounded-degree
  * out-adjacency via [[HnswIndex.insert]] — the graph is never rebuilt.
  * Each micro-batch bands its novel vectors, cogroups them against the
  * banded store (delta × (base ∪ delta), never base × base — the
  * [[StreamingEmbeddingDedup]] candidate class), exact-scores the
  * delta-involving pairs, and re-ranks per-node top-`Degree` over (prior
  * artifact ∪ delta candidates). The pigeonhole argument that makes one
  * insert equal a rebuild composes inductively across batches: after any
  * drain the artifact equals [[SimilarityOps.hnswOutInline]] over
  * everything seen, REGARDLESS of how arrivals were chopped —
  * StreamingHnswSpec pins exact row equality.
  *
  * Stores under `storePath` (all tag-partitioned for the at-least-once
  * discipline: reads exclude the batch's own tag, writes overwrite it):
  * `vecs/` (normalized vectors — identity novelty + scoring lookups),
  * `banded/` (the candidate-generation key table, append-only), and
  * `out/` — each batch writes a COMPLETE new artifact version stamped
  * with a monotone `seq` (maintenance can evict a base edge, so versions,
  * not deltas); [[outAdjacency]] serves the max-seq version.
  *
  * Scale: per batch the work is |delta banding| × bucket occupancy
  * candidates + id-keyed vector lookups + the artifact re-rank (node-
  * bounded window) — no corpus self-join, no stateful operator; the index
  * lives in the store exactly as a production serving deployment keeps
  * it.
  */
object StreamingHnsw {

  private def lineageId(spark: SparkSession, checkpointDir: String): String =
    StoreUtil.lineageId(spark, checkpointDir, "graft-shnsw-lineage")

  private val vecsSchema = StructType.fromDDL(
    "vec_id BIGINT, v ARRAY<DOUBLE>, batch STRING")
  private val bandedSchema = StructType.fromDDL(
    "vec_id BIGINT, band INT, bucket BIGINT, batch STRING")
  private val outSchema = StructType.fromDDL(
    "node BIGINT, nbr BIGINT, ncos DOUBLE, seq BIGINT, batch STRING")

  private def readStore(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    StoreUtil.readOrEmpty(spark, path, schema)

  /** The out store read by its GLOBAL max(seq) property — committed
    * partitions only, so a crashed half-written top-seq version can
    * never be served, compacted on, or inserted on (r14 code-review;
    * the vecs/banded stores keep the plain read: their consumers are
    * per-batch tag-excluding reads, which the retry overwrite protects).
    */
  private def readOutCommitted(spark: SparkSession,
      storePath: String): DataFrame =
    StoreUtil.readCommitted(spark, s"$storePath/out", outSchema)

  private val tombSchema = StructType.fromDDL("vec_id BIGINT")

  private def tombstones(spark: SparkSession, storePath: String): DataFrame =
    StoreUtil.readOrEmpty(spark, s"$storePath/tombstones", tombSchema)

  /** Exclude tombstoned ids from a frame keyed by `vec_id`. */
  private def live(df: DataFrame, spark: SparkSession,
      storePath: String): DataFrame =
    df.join(tombstones(spark, storePath)
        .select(col("vec_id").as("dead_id")).distinct(),
      col("vec_id") === col("dead_id"), "left_anti")

  /** Record a delete batch (idempotent tombstone append — the
    * [[StreamingIvf.applyDeletes]] discipline). The ARTIFACT keeps its
    * edges until [[compact]]: tombstone-period serving filters deleted
    * nodes from results (the `hnsw_tombstone_recall` semantics, measured
    * there); a tombstoned id can never re-enter via insert, and deleting
    * a never-indexed id pre-deletes it.
    */
  def applyDeletes(spark: SparkSession, storePath: String,
      ids: DataFrame): Unit =
    ids.select(col("vec_id")).distinct()
      .write.mode(SaveMode.Append).parquet(s"$storePath/tombstones")

  /** Compaction — the [[graft.ops.SimilarityOps.knnDeleteRepair]]
    * dominance algebra applied to the artifact: drop deleted nodes'
    * lists, keep every undamaged list (nothing kept was removed,
    * everything below stays below), re-probe ONLY damaged nodes' buckets
    * against survivors (the banded store makes the re-probe bounded).
    * The compacted artifact equals a full rebuild over the live ids —
    * StreamingHnswSpec pins it — and subsequent inserts stay
    * pigeonhole-exact on top of it. Tombstones are retained (they also
    * gate future re-ingest); a production deployment gives them a TTL
    * once the ids can no longer arrive.
    */
  def compact(spark: SparkSession, storePath: String): Unit = {
    val dead = tombstones(spark, storePath)
      .select(col("vec_id").as("dead_id")).distinct()
    val outStore = readOutCommitted(spark, storePath)
    val prevSeq = outStore.agg(coalesce(max(col("seq")), lit(0L)))
      .collect()(0).getLong(0)
    val prevOut = outStore.filter(col("seq") === prevSeq)
      .select(col("node"), col("nbr"), col("ncos"))
      .localCheckpoint() // survivors/damaged/kept all read it
    val surviving = prevOut
      .join(dead, col("node") === col("dead_id"), "left_anti")
    val damaged = surviving
      .join(dead, col("nbr") === col("dead_id"), "left_semi")
      .select(col("node")).distinct()
    val kept = surviving
      .join(damaged.select(col("node")), Seq("node"), "left_anti")
    val bandedSurv = live(
      readStore(spark, s"$storePath/banded", bandedSchema)
        .select(col("vec_id"), col("band"), col("bucket")),
      spark, storePath)
    val bandedDamaged = bandedSurv
      .join(damaged.select(col("node").as("vec_id")), Seq("vec_id"),
        "left_semi")
    val vecsLive = live(
      readStore(spark, s"$storePath/vecs", vecsSchema)
        .select(col("vec_id"), col("v")), spark, storePath)
    val repaired = SimilarityOps.hnswTopOut(
      SimilarityOps.hnswScore(
        SimilarityOps.hnswCohabit(bandedDamaged, bandedSurv), vecsLive),
      HnswIndex.Degree)
    kept.unionByName(repaired)
      .withColumn("seq", lit(prevSeq + 1L))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$storePath/out/batch=compact-${prevSeq + 1L}")
  }

  private def writeBatch(storePath: String, lineage: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val spark = batch.sparkSession
    def notOwn(df: DataFrame): DataFrame =
      df.filter(!(col("batch") <=> lit(tag)))
    val vecsStore = notOwn(readStore(spark, s"$storePath/vecs", vecsSchema))
      .select(col("vec_id"), col("v"))
    // identity novelty: a vec_id already indexed is a re-ingest (and a
    // tombstoned one stays dead); inserting either would corrupt the
    // candidate algebra
    // dropDuplicates: two copies of an id in ONE micro-batch both pass
    // the seen anti-join and would fan out duplicate scored rows that
    // consume top-Degree slots (r14 code-review)
    val novel = live(batch
      .select(col("vec_id"),
        normalize(toDoubleArray(col("embedding"))).as("v"))
      .dropDuplicates("vec_id")
      .join(vecsStore.select(col("vec_id").as("seen_id")).distinct(),
        col("vec_id") === col("seen_id"), "left_anti"), spark, storePath)
      .localCheckpoint() // read 4× below (banding, union, empty-probe, write)
    if (!novel.isEmpty) {
      val bandedDelta = SimilarityOps.hnswBanded(novel,
        HnswIndex.BitsPerBand, HnswIndex.Bands).localCheckpoint()
      // candidates come from LIVE ids only — a tombstoned waypoint must
      // not gain new edges (post-compact inserts stay rebuild-exact)
      val bandedAll = live(notOwn(
          readStore(spark, s"$storePath/banded", bandedSchema))
        .select(col("vec_id"), col("band"), col("bucket")), spark, storePath)
        .unionByName(bandedDelta)
      val deltaCand = SimilarityOps.hnswCohabit(bandedDelta, bandedAll)
        .unionByName(SimilarityOps.hnswCohabit(bandedAll, bandedDelta))
        .distinct()
      val embAll = vecsStore.unionByName(novel)
      val outStore = notOwn(readOutCommitted(spark, storePath))
      val prevSeq = outStore.agg(coalesce(max(col("seq")), lit(0L)))
        .collect()(0).getLong(0)
      val prevOut = outStore.filter(col("seq") === prevSeq)
        .select(col("node"), col("nbr"), col("ncos"))
      val maintained = HnswIndex.insert(prevOut,
        SimilarityOps.hnswScore(deltaCand, embAll))
      maintained.withColumn("seq", lit(prevSeq + 1L))
        .write.mode(SaveMode.Overwrite).parquet(s"$storePath/out/batch=$tag")
      bandedDelta
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$storePath/banded/batch=$tag")
      novel.write.mode(SaveMode.Overwrite)
        .parquet(s"$storePath/vecs/batch=$tag")
    }
  }

  /** The maintained out-adjacency artifact: the latest complete version
    * (`node, nbr, ncos` — [[HnswIndex.loadOut]]'s shape).
    */
  def outAdjacency(spark: SparkSession, storePath: String): DataFrame = {
    val store = readOutCommitted(spark, storePath)
    val latest = store.agg(coalesce(max(col("seq")), lit(0L)))
      .collect()(0).getLong(0)
    store.filter(col("seq") === latest)
      .select(col("node"), col("nbr"), col("ncos"))
  }

  /** Drain-and-stop shape: insert everything currently in the folder,
    * then stop. `schema` must contain `vec_id` and `embedding`.
    */
  def start(spark: SparkSession, schema: StructType, inputDir: String,
      storePath: String, checkpointDir: String): StreamingQuery = {
    val lineage = lineageId(spark, checkpointDir)
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .queryName("hnsw-maintain")
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
