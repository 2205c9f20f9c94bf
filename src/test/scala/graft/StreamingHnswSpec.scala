package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{normalize, toDoubleArray}
import graft.ops.{HnswIndex, SimilarityOps}
import graft.streaming.StreamingHnsw

/** Stream/batch parity for HNSW index maintenance across the FULL
  * lifecycle (VERDICT r13 #5): insert (drained artifact ≡ one-shot
  * rebuild, chop-independent — the per-batch [[HnswIndex.insert]]
  * pigeonhole composes inductively), delete + compact (the
  * knn_delete_repair dominance algebra over the stores ≡ rebuild over
  * survivors), and post-compact insert (still rebuild-exact: candidates
  * come from live ids only). A fresh-checkpoint re-drain of old files
  * must leave the artifact untouched (identity novelty; tombstoned ids
  * stay dead).
  */
class StreamingHnswSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("insert ≡ rebuild chop-independently; delete+compact ≡ survivor rebuild; post-compact insert stays exact; re-drain no-op") {
    def bag(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    val emb = graft.ops.Tables(spark, dir, "embeddings")
    // frame-level rebuild over an arbitrary id predicate (the
    // HnswIndexSpec stages, shared build definition)
    def rebuild(pred: org.apache.spark.sql.Column): Seq[(Long, Long, Double)] = {
      val e = emb.filter(pred).select(col("vec_id"),
        normalize(toDoubleArray(col("embedding"))).as("v"))
      val banded = SimilarityOps.hnswBanded(e,
        HnswIndex.BitsPerBand, HnswIndex.Bands)
      bag(SimilarityOps.hnswTopOut(
        SimilarityOps.hnswScore(
          SimilarityOps.hnswCohabit(banded, banded), e), HnswIndex.Degree))
    }

    val root = Files.createTempDirectory("graft-shnsw")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString

    // phase 1 — insert: two arrival chops of the first two thirds
    for (pred <- Seq("vec_id % 3 = 0", "vec_id % 3 = 1"))
      emb.filter(pred).coalesce(1).write.mode("append").parquet(in.toString)
    StreamingHnsw.runAvailableNow(spark, emb.schema, in.toString, store,
      root.resolve("ckpt1").toString)
    val phase1 = rebuild(pmod(col("vec_id"), lit(3)) =!= 2)
    assert(phase1.nonEmpty)
    assert(bag(StreamingHnsw.outAdjacency(spark, store)) == phase1,
      "phase 1: drained artifact ≠ rebuild over arrivals")

    // phase 2 — delete + compact: tombstone every vec_id % 10 = 3
    // (including not-yet-arrived ones — pre-deleted), then compact
    StreamingHnsw.applyDeletes(spark, store,
      emb.filter(pmod(col("vec_id"), lit(10)) === 3).select(col("vec_id")))
    StreamingHnsw.compact(spark, store)
    val phase2 = rebuild(pmod(col("vec_id"), lit(3)) =!= 2 &&
      pmod(col("vec_id"), lit(10)) =!= 3)
    assert(phase2.nonEmpty)
    assert(bag(StreamingHnsw.outAdjacency(spark, store)) == phase2,
      "phase 2: compacted artifact ≠ rebuild over survivors")

    // phase 3 — post-compact insert: the last third arrives (its
    // tombstoned members must stay dead)
    emb.filter("vec_id % 3 = 2").coalesce(1).write.mode("append")
      .parquet(in.toString)
    StreamingHnsw.runAvailableNow(spark, emb.schema, in.toString, store,
      root.resolve("ckpt1").toString)
    val phase3 = rebuild(pmod(col("vec_id"), lit(10)) =!= 3)
    assert(bag(StreamingHnsw.outAdjacency(spark, store)) == phase3,
      "phase 3: post-compact insert ≠ rebuild over all live ids")

    // fresh checkpoint re-drain: novelty + tombstones suppress everything
    StreamingHnsw.runAvailableNow(spark, emb.schema, in.toString, store,
      root.resolve("ckpt2").toString)
    assert(bag(StreamingHnsw.outAdjacency(spark, store)) == phase3,
      "re-drain disturbed the artifact")
  }

  test("duplicate rows inside one micro-batch do not distort the artifact") {
    def bag(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
    val emb = graft.ops.Tables(spark, dir, "embeddings")
    val full = bag(SimilarityOps.hnswOutInline(spark, dir,
      HnswIndex.BitsPerBand, HnswIndex.Bands, HnswIndex.Degree))
    val root = Files.createTempDirectory("graft-shnsw-dup")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    // every vector TWICE in one arrival file: without the intra-batch
    // dedup the duplicate scored rows would consume top-Degree slots
    emb.unionByName(emb).coalesce(1).write.mode("append")
      .parquet(in.toString)
    StreamingHnsw.runAvailableNow(spark, emb.schema, in.toString, store,
      root.resolve("ckpt").toString)
    assert(bag(StreamingHnsw.outAdjacency(spark, store)) == full,
      "intra-batch duplicate distorted the artifact")
  }
}
