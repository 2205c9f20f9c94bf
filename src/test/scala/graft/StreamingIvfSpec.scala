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

  test("property: lifecycle chain (insert → delete → insert) ≡ batch assignment over live arrivals on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sparkRef = spark
    import sparkRef.implicits._
    // the StreamingHnswSpec chain run through the IVF maintainer on
    // random corpora (VERDICT r14 #6): drain two arrival chops, delete a
    // random family (including pre-deletes of not-yet-arrived ids),
    // drain a third chop — after every delete/drain the served
    // assignments must equal the one-shot batch assignment of exactly
    // the live arrived ids against the same frozen quantizer. Random
    // integer-grid vectors make argmin DISTANCE TIES likely (the (d,
    // cid) tie-break is part of the assignment definition)
    val corpus = for {
      d <- Gen.choose(2, 3)
      n <- Gen.choose(6, 14)
      vs <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-2, 2).map(_.toDouble)))
      ls <- Gen.listOfN(n, Gen.choose(0, 2))
    } yield vs.zip(ls)
    val prop = Prop.forAll(corpus, Gen.choose(0, 100),
        Gen.choose(0, 9)) { (rows, seed, mod) =>
      val emb = rows.zipWithIndex
        .map { case ((v, l), i) => (i.toLong, l, v) }
        .toDF("vec_id", "label", "embedding")
      val root = Files.createTempDirectory("graft-sivf-prop")
      val cents = root.resolve("cents").toString
      val store = root.resolve("store").toString
      val in = root.resolve("in"); Files.createDirectories(in)
      def era(r: Int) = pmod(col("vec_id") + seed, lit(3)) === r
      val dead = pmod(col("vec_id"), lit(10)) === mod
      StreamingIvf.trainQuantizer(emb.filter(era(0)), cents)
      def expect(pred: org.apache.spark.sql.Column): Set[(Long, Int, Double)] =
        graft.ops.SimilarityOps.ivfAssign(
            emb.filter(pred)
              .select(col("vec_id"), toDoubleArray(col("embedding")).as("v")),
            spark.read.parquet(cents).select(col("cid"), col("cv")))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
          .toSet
      def got(): Set[(Long, Int, Double)] =
        StreamingIvf.assignments(spark, store).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      // stage 1 — two arrival chops drained
      for (r <- Seq(0, 1) if emb.filter(era(r)).count() > 0)
        emb.filter(era(r)).coalesce(1).write.mode("append")
          .parquet(in.toString)
      StreamingIvf.runAvailableNow(spark, emb.schema, in.toString, cents,
        store, root.resolve("ckpt").toString)
      val ok1 = got() == expect(era(0) || era(1))
      // stage 2 — delete a family (pre-deleting its era-2 members)
      StreamingIvf.applyDeletes(spark, store,
        emb.filter(dead).select(col("vec_id")))
      val ok2 = got() == expect((era(0) || era(1)) && !dead)
      // stage 2b — compact: serving unchanged, but the PERSISTED store
      // now holds survivors only and the tombstones are gone
      StreamingIvf.compact(spark, store)
      val ok2b = got() == expect((era(0) || era(1)) && !dead)
      val assignDir = root.resolve("store").resolve("assign")
      val okRaw = !Files.exists(assignDir) || {
        // explicit schema: a fully-scrubbed store is a valid empty dir
        // that schema inference cannot read
        val raw = spark.read.schema(
            org.apache.spark.sql.types.StructType.fromDDL(
              "vec_id BIGINT, cid INT, d DOUBLE, batch STRING"))
          .parquet(assignDir.toString)
          .select(col("vec_id")).collect().map(_.getLong(0))
        raw.length == raw.distinct.length &&
          raw.toSet == got().map(_._1)
      }
      // the tombstone store is rewritten (not blanket-deleted — a delete
      // landing mid-scrub must survive), so "gone" means empty
      val tombDir = root.resolve("store").resolve("tombstones")
      val okTomb = !Files.exists(tombDir) ||
        spark.read.schema(
            org.apache.spark.sql.types.StructType.fromDDL("vec_id BIGINT"))
          .parquet(tombDir.toString).count() == 0L
      // stage 3 — post-compact arrivals: the purge traded the re-ingest
      // gate away, so era-2 members of the deleted family DO re-enter
      if (emb.filter(era(2)).count() > 0) {
        emb.filter(era(2)).coalesce(1).write.mode("append")
          .parquet(in.toString)
        StreamingIvf.runAvailableNow(spark, emb.schema, in.toString, cents,
          store, root.resolve("ckpt").toString)
      }
      val ok3 = got() == expect(((era(0) || era(1)) && !dead) || era(2))
      ok1 && ok2 && ok2b && okRaw && okTomb && ok3
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
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
