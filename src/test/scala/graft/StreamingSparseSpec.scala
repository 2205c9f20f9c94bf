package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SparseIndex
import graft.streaming.StreamingSparse

/** Stream/batch parity for inverted-index maintenance: the drained
  * postings store must equal the one-shot batch build — chop-independent
  * because a doc's postings are a pure function of the doc and eras are
  * doc-disjoint (SparseIndex.insert's union algebra under foreachBatch).
  * Deletes are doc tombstones (exact — postings are doc-keyed); a
  * fresh-checkpoint re-drain grows nothing and cannot resurrect deleted
  * docs.
  */
class StreamingSparseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("drained postings equal the batch build; term stats agree; delete + re-drain leaves survivors only") {
    def bag(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
    val docs = graft.ops.Tables(spark, dir, "documents")
    val full = bag(SparseIndex.build(spark, dir))
    assert(full.nonEmpty)

    val root = Files.createTempDirectory("graft-ssparse")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    for (pred <- Seq("doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"))
      docs.filter(pred).coalesce(1).write.mode("append").parquet(in.toString)
    StreamingSparse.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt1").toString)
    assert(bag(StreamingSparse.postings(spark, store)) == full,
      "drained postings ≠ batch build")
    def stats(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
      SparseIndex.termStats(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(stats(StreamingSparse.postings(spark, store)) ==
      stats(SparseIndex.build(spark, dir)), "term stats diverge")

    // delete + fresh-checkpoint re-drain: survivors only, no resurrection
    StreamingSparse.applyDeletes(spark, store,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3).select(col("doc_id")))
    val survivors = full.filter(_._1 % 10 != 3)
    assert(bag(StreamingSparse.postings(spark, store)) == survivors,
      "post-delete postings ≠ survivor subset")
    StreamingSparse.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt2").toString)
    assert(bag(StreamingSparse.postings(spark, store)) == survivors,
      "re-drain resurrected or duplicated postings")
  }

  test("duplicate rows inside one micro-batch do not double tf") {
    def bag(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
    val docs = graft.ops.Tables(spark, dir, "documents")
    val full = bag(SparseIndex.build(spark, dir))
    val root = Files.createTempDirectory("graft-ssparse-dup")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    // every doc TWICE in the same arrival file — one micro-batch sees
    // both copies, so prior-batch novelty alone cannot catch it
    docs.unionByName(docs).coalesce(1).write.mode("append")
      .parquet(in.toString)
    StreamingSparse.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt").toString)
    assert(bag(StreamingSparse.postings(spark, store)) == full,
      "intra-batch duplicate doubled tf")
  }

  test("property: lifecycle chain (insert → delete → insert) ≡ batch build over live arrivals on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sparkRef = spark
    import sparkRef.implicits._
    // the StreamingHnswSpec chain run through the sparse maintainer on
    // random corpora (VERDICT r14 #6): drain two arrival chops, delete a
    // random doc family (including pre-deletes of not-yet-arrived docs),
    // drain a third chop — after every stage the served postings must
    // equal the one-shot build over exactly the live arrived docs.
    // Tiny-vocab random texts make shingle COLLISIONS across docs dense,
    // and lengths below the shingle width exercise the no-postings edge
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val corpus = for {
      n <- Gen.choose(6, 14)
      texts <- Gen.listOfN(n,
        Gen.choose(0, 12).flatMap(len =>
          Gen.listOfN(len, word).map(_.mkString(" "))))
    } yield texts
    val prop = Prop.forAll(corpus, Gen.choose(0, 100),
        Gen.choose(0, 9)) { (texts, seed, mod) =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val root = Files.createTempDirectory("graft-ssparse-prop")
      val in = root.resolve("in"); Files.createDirectories(in)
      val store = root.resolve("store").toString
      def era(r: Int) = pmod(col("doc_id") + seed, lit(3)) === r
      val dead = pmod(col("doc_id"), lit(10)) === mod
      def expect(pred: org.apache.spark.sql.Column): Set[(Long, String, Long)] =
        SparseIndex.buildFor(docs.filter(pred)).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      def got(): Set[(Long, String, Long)] =
        StreamingSparse.postings(spark, store).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      for (r <- Seq(0, 1) if docs.filter(era(r)).count() > 0)
        docs.filter(era(r)).coalesce(1).write.mode("append")
          .parquet(in.toString)
      StreamingSparse.runAvailableNow(spark, docs.schema, in.toString,
        store, root.resolve("ckpt").toString)
      val ok1 = got() == expect(era(0) || era(1))
      StreamingSparse.applyDeletes(spark, store,
        docs.filter(dead).select(col("doc_id")))
      val ok2 = got() == expect((era(0) || era(1)) && !dead)
      // compact: serving unchanged, persisted postings scrubbed, no
      // tombstones left
      StreamingSparse.compact(spark, store)
      val ok2b = got() == expect((era(0) || era(1)) && !dead)
      val postDir = root.resolve("store").resolve("postings")
      val okRaw = !Files.exists(postDir) || {
        // explicit schema: a fully-scrubbed store is a valid empty dir
        // that schema inference cannot read
        val raw = spark.read.schema(
            org.apache.spark.sql.types.StructType.fromDDL(
              "doc_id BIGINT, s STRING, tf BIGINT, batch STRING"))
          .parquet(postDir.toString)
          .select(col("doc_id")).collect().map(_.getLong(0))
        raw.toSet == got().map(_._1)
      }
      // the tombstone store is rewritten (not blanket-deleted — a delete
      // landing mid-scrub must survive), so "gone" means empty
      val tombDir = root.resolve("store").resolve("tombstones")
      val okTomb = !Files.exists(tombDir) ||
        spark.read.schema(
            org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT"))
          .parquet(tombDir.toString).count() == 0L
      // post-compact arrivals: the purge traded the re-ingest gate away,
      // so era-2 members of the deleted family DO re-enter
      if (docs.filter(era(2)).count() > 0) {
        docs.filter(era(2)).coalesce(1).write.mode("append")
          .parquet(in.toString)
        StreamingSparse.runAvailableNow(spark, docs.schema, in.toString,
          store, root.resolve("ckpt").toString)
      }
      val ok3 = got() == expect(((era(0) || era(1)) && !dead) || era(2))
      ok1 && ok2 && ok2b && okRaw && okTomb && ok3
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
