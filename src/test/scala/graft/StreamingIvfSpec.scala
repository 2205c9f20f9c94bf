package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDoubleArray
import graft.streaming.StreamingIvf

/** Stream/batch parity for IVF index maintenance: the drained store's
  * assignments must equal the one-shot batch assignment of the same
  * vectors against the same frozen quantizer — chop-independent, because
  * assignment is a pure per-vector function of the persisted centroids
  * (the StreamingCdc/StreamingDedup parity convention, VERDICT r13 #5).
  * A fresh-checkpoint re-drain of old files must grow nothing (identity
  * novelty — replays cannot double-count bucket stats).
  */
class StreamingIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("drained assignments equal the batch assignment against the frozen quantizer; re-drain grows nothing") {
    val emb = graft.ops.Tables(spark, dir, "embeddings")
    val root = Files.createTempDirectory("graft-sivf")
    val cents = root.resolve("cents").toString
    val store = root.resolve("store").toString
    val in = root.resolve("in"); Files.createDirectories(in)

    // quantizer trained once, on the base era only (the incremental_ivf
    // convention) — maintenance assigns EVERY arrival against it frozen
    StreamingIvf.trainQuantizer(
      emb.filter(pmod(col("vec_id"), lit(10)) =!= 9), cents)

    val expected = graft.ops.SimilarityOps.ivfAssign(
        emb.select(col("vec_id"), toDoubleArray(col("embedding")).as("v")),
        spark.read.parquet(cents).select(col("cid"), col("cv")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)

    // three arbitrary arrival files — parity must hold for ANY chop
    for (pred <- Seq("vec_id % 3 = 0", "vec_id % 3 = 1", "vec_id % 3 = 2"))
      emb.filter(pred).coalesce(1).write.mode("append").parquet(in.toString)
    StreamingIvf.runAvailableNow(spark, emb.schema, in.toString, cents,
      store, root.resolve("ckpt1").toString)
    val got = StreamingIvf.assignments(spark, store).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"drained ≠ batch: missing=${expected.diff(got).take(5)} " +
        s"extra=${got.diff(expected).take(5)}")

    // per-bucket serving stats are one aggregate over the store and must
    // be whole: counts sum to the corpus
    val cnt = StreamingIvf.counts(spark, store)
      .agg(sum(col("cnt"))).collect()(0).getLong(0)
    assert(cnt == expected.size.toLong)

    // fresh checkpoint re-drain: identity novelty suppresses everything
    StreamingIvf.runAvailableNow(spark, emb.schema, in.toString, cents,
      store, root.resolve("ckpt2").toString)
    assert(StreamingIvf.assignments(spark, store).count() ==
      expected.size.toLong, "re-drain double-counted assignments")

    // delete batch: tombstones ARE exact IVF maintenance (bucket stats
    // are additive over disjoint vectors) — live assignments must equal
    // the survivor subset, and re-applying the deletes is a no-op
    val delIds = emb.filter(pmod(col("vec_id"), lit(10)) === 3)
      .select(col("vec_id"))
    StreamingIvf.applyDeletes(spark, store, delIds)
    val live = StreamingIvf.assignments(spark, store).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val survivors = expected.filter(_._1 % 10 != 3)
    assert(live == survivors,
      s"post-delete assignments diverge: missing=${survivors.diff(live).take(3)} " +
        s"extra=${live.diff(survivors).take(3)}")
    StreamingIvf.applyDeletes(spark, store, delIds) // idempotent
    assert(StreamingIvf.assignments(spark, store).count() ==
      survivors.size.toLong, "re-applied delete changed the index")
  }

  test("pre-deleted and intra-batch-duplicated ids never enter the persisted store") {
    val emb = graft.ops.Tables(spark, dir, "embeddings")
    val root = Files.createTempDirectory("graft-sivf-pre")
    val cents = root.resolve("cents").toString
    val store = root.resolve("store").toString
    val in = root.resolve("in"); Files.createDirectories(in)
    StreamingIvf.trainQuantizer(
      emb.filter(pmod(col("vec_id"), lit(10)) =!= 9), cents)
    // delete BEFORE arrival (pre-delete) + every row duplicated in the
    // one arrival file (intra-batch duplicates)
    StreamingIvf.applyDeletes(spark, store,
      emb.filter(pmod(col("vec_id"), lit(10)) === 3).select(col("vec_id")))
    emb.unionByName(emb).coalesce(1).write.mode("append")
      .parquet(in.toString)
    StreamingIvf.runAvailableNow(spark, emb.schema, in.toString, cents,
      store, root.resolve("ckpt").toString)
    // the PERSISTED store (not just the filtered serving view) must hold
    // exactly one live assignment per surviving id — dead ids never
    // landed, duplicates collapsed
    val raw = spark.read.parquet(s"$store/assign")
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(raw.length == raw.distinct.length, "duplicate rows in the store")
    assert(raw.forall(_ % 10 != 3), "pre-deleted id entered the store")
    val nLive = emb.filter(pmod(col("vec_id"), lit(10)) =!= 3).count()
    assert(raw.length.toLong == nLive)
  }
}
