package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
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

  private def lineageId(spark: SparkSession, checkpointDir: String): String = {
    val f = new HPath(checkpointDir, "graft-shnsw-lineage")
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    val existing =
      if (!fs.exists(f)) ""
      else {
        val in = fs.open(f)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      }
    if (existing.nonEmpty) existing
    else {
      val id = java.util.UUID.randomUUID().toString.take(8)
      val tmp = new HPath(checkpointDir, s"graft-shnsw-lineage.tmp-$id")
      val out = fs.create(tmp, true)
      try out.write(id.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, f)) id
      else { fs.delete(tmp, false); lineageId(spark, checkpointDir) }
    }
  }

  private val vecsSchema = StructType.fromDDL(
    "vec_id BIGINT, v ARRAY<DOUBLE>, batch STRING")
  private val bandedSchema = StructType.fromDDL(
    "vec_id BIGINT, band INT, bucket BIGINT, batch STRING")
  private val outSchema = StructType.fromDDL(
    "node BIGINT, nbr BIGINT, ncos DOUBLE, seq BIGINT, batch STRING")

  private def readStore(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hPath)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  private def writeBatch(storePath: String, lineage: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val tag = s"$lineage-$batchId"
    val spark = batch.sparkSession
    def notOwn(df: DataFrame): DataFrame =
      df.filter(!(col("batch") <=> lit(tag)))
    val vecsStore = notOwn(readStore(spark, s"$storePath/vecs", vecsSchema))
      .select(col("vec_id"), col("v"))
    // identity novelty: a vec_id already indexed is a re-ingest; inserting
    // it again would self-pair and double candidate edges
    val novel = batch
      .select(col("vec_id"),
        normalize(toDoubleArray(col("embedding"))).as("v"))
      .join(vecsStore.select(col("vec_id").as("seen_id")).distinct(),
        col("vec_id") === col("seen_id"), "left_anti")
      .localCheckpoint() // read 4× below (banding, union, empty-probe, write)
    if (!novel.isEmpty) {
      val bandedDelta = SimilarityOps.hnswBanded(novel,
        HnswIndex.BitsPerBand, HnswIndex.Bands).localCheckpoint()
      val bandedAll = notOwn(
          readStore(spark, s"$storePath/banded", bandedSchema))
        .select(col("vec_id"), col("band"), col("bucket"))
        .unionByName(bandedDelta)
      val deltaCand = SimilarityOps.hnswCohabit(bandedDelta, bandedAll)
        .unionByName(SimilarityOps.hnswCohabit(bandedAll, bandedDelta))
        .distinct()
      val embAll = vecsStore.unionByName(novel)
      val outStore = notOwn(readStore(spark, s"$storePath/out", outSchema))
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
    val store = readStore(spark, s"$storePath/out", outSchema)
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
