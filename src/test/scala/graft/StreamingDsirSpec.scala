package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CurationOps
import graft.streaming.StreamingDsir

/** Stream/batch parity for the DSIR selection artifact: weights served
  * off the drained feature-bag store must equal the one-shot batch
  * query — chop-independent because a doc's bag is a pure function of
  * the doc and eras are doc-disjoint. Deletes are doc tombstones
  * (exact — bags are doc-keyed, distributions re-derive from live rows
  * at read time); a fresh-checkpoint re-drain grows nothing and cannot
  * resurrect deleted docs; compaction leaves serving unchanged.
  */
class StreamingDsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)

  /** Equality up to the 4-dp rounding half-width on the score column:
    * the two sides aggregate sum(cnt·logratio) under different physical
    * partitionings, so a doc whose true score sits within an ulp of a
    * .00005 boundary may round apart (r15 s3 review — exact == would
    * flake); ids/langs/counts compare exactly, and each side's selected
    * flag is definitional against its own rounded score.
    */
  private def assertSameWeights(
      got: Seq[(Long, String, Long, Double, Boolean)],
      want: Seq[(Long, String, Long, Double, Boolean)],
      clue: String): Unit = {
    assert(got.length == want.length, clue)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$clue: $g vs $w")
      assert(math.abs(g._4 - w._4) <= 1.01e-4, s"$clue: score $g vs $w")
      assert(g._5 == (g._4 > 0) && w._5 == (w._4 > 0),
        s"$clue: selected not definitional")
    }
  }

  test("drained weights equal the batch query; delete + re-drain serves " +
      "the survivor rebuild; compact changes nothing") {
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val full = rows(CurationOps.dsirWeights(spark, dir))
    assert(full.nonEmpty)

    val root = Files.createTempDirectory("graft-sdsir")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    for (pred <- Seq("doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"))
      docs.filter(pred).coalesce(1).write.mode("append").parquet(in.toString)
    StreamingDsir.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt1").toString)
    assertSameWeights(rows(StreamingDsir.weights(spark, store)), full,
      "drained weights ≠ batch query")

    // delete a family: the served weights must equal the chain re-run
    // over the survivor docs — the global-weights subtlety made exact
    // by deriving scores from live bags at read time
    StreamingDsir.applyDeletes(spark, store,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3).select(col("doc_id")))
    val survivorWeights = rows(CurationOps.dsirWeightsFrom(
      CurationOps.dsirBucketsFor(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 3))))
    assert(survivorWeights.length != full.length,
      "delete family empty — survivor test vacuous")
    assertSameWeights(rows(StreamingDsir.weights(spark, store)),
      survivorWeights, "post-delete weights ≠ survivor rebuild")

    // fresh-checkpoint re-drain: no resurrection, no duplication
    StreamingDsir.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt2").toString)
    assertSameWeights(rows(StreamingDsir.weights(spark, store)),
      survivorWeights, "re-drain resurrected or duplicated bags")

    // physical compaction: serving identical, dead rows physically gone
    StreamingDsir.compact(spark, store)
    assertSameWeights(rows(StreamingDsir.weights(spark, store)),
      survivorWeights, "compaction changed served weights")
    val raw = spark.read.parquet(s"$store/bags")
    assert(raw.filter(pmod(col("doc_id"), lit(10)) === 3).count() == 0,
      "compaction left dead bag rows on disk")
  }

  test("duplicate rows inside one micro-batch do not double a bag") {
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val full = rows(CurationOps.dsirWeights(spark, dir))
    val root = Files.createTempDirectory("graft-sdsir-dup")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    // every doc TWICE in the same arrival file — one micro-batch sees
    // both copies, so prior-batch novelty alone cannot catch it
    docs.unionByName(docs).coalesce(1).write.mode("append")
      .parquet(in.toString)
    StreamingDsir.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt").toString)
    assertSameWeights(rows(StreamingDsir.weights(spark, store)), full,
      "intra-batch duplicate doubled a bag (weights diverge)")
  }

  test("conflicting same-id rows inside one micro-batch resolve " +
      "deterministically across arrival orders") {
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text").limit(40)
    // same doc_id, DIFFERENT payload — the max_by(payload-hash) pick
    // must choose the same winner no matter how the file is laid out
    // (dropDuplicates picked whichever partition arrived first; r15
    // ADVICE)
    val twin = docs.withColumn("text", concat(col("text"), lit(" zq")))
    def drain(arrivals: org.apache.spark.sql.DataFrame, tag: String) = {
      val root = Files.createTempDirectory(s"graft-sdsir-$tag")
      val in = root.resolve("in"); Files.createDirectories(in)
      val store = root.resolve("store").toString
      arrivals.coalesce(1).write.mode("append").parquet(in.toString)
      StreamingDsir.runAvailableNow(spark, docs.schema, in.toString,
        store, root.resolve("ckpt").toString)
      spark.read.parquet(s"$store/bags")
        .select("doc_id", "bucket", "cnt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    }
    val bagsA = drain(docs.unionByName(twin), "a")
    val bagsB = drain(twin.unionByName(docs).repartition(7), "b")
    assert(bagsA.nonEmpty, "conflict drain produced no bags")
    assert(bagsA == bagsB,
      "conflicting intra-batch rows picked different winners per order")
    // and the winner is a REAL one of the two payloads, not a merge:
    // each doc's persisted token mass equals exactly one candidate's
    val massByDoc = bagsA.groupBy(_._1).view
      .mapValues(_.toSeq.map(_._3).sum).toMap
    val origMass = CurationOps.dsirBucketsFor(docs)
      .groupBy("doc_id").agg(sum("cnt").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twinMass = CurationOps.dsirBucketsFor(twin)
      .groupBy("doc_id").agg(sum("cnt").as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    massByDoc.foreach { case (id, m) =>
      assert(m == origMass(id) || m == twinMass(id),
        s"doc $id bag is neither candidate's (mass $m)")
    }
  }

  test("chained lifecycle: insert -> delete -> insert serves the rebuild " +
      "over live arrivals (pre-deleted ids blocked at ingest)") {
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val root = Files.createTempDirectory("graft-sdsir-chain")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString

    // era 1 arrives and drains
    docs.filter("doc_id % 3 < 2").coalesce(1).write.mode("append")
      .parquet(in.toString)
    StreamingDsir.runAvailableNow(spark, docs.schema, in.toString, store,
      ckpt)
    // the delete lands BETWEEN eras and names ids from BOTH: already-
    // ingested ones (tombstone filters serving) and not-yet-arrived ones
    // (the tombstone must block their later ingest)
    StreamingDsir.applyDeletes(spark, store,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3).select(col("doc_id")))
    // era 2 arrives and drains on the SAME checkpoint (only the new file
    // is processed)
    docs.filter("doc_id % 3 = 2").coalesce(1).write.mode("append")
      .parquet(in.toString)
    StreamingDsir.runAvailableNow(spark, docs.schema, in.toString, store,
      ckpt)

    val expected = rows(CurationOps.dsirWeightsFrom(
      CurationOps.dsirBucketsFor(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 3))))
    assertSameWeights(rows(StreamingDsir.weights(spark, store)), expected,
      "chained lifecycle diverges from the live-arrival rebuild")
    // the blocked ids truly never entered the store (not just filtered)
    val raw = spark.read.parquet(s"$store/bags")
    val era2Dead = raw.filter(
      pmod(col("doc_id"), lit(10)) === 3 && pmod(col("doc_id"), lit(3)) === 2)
    assert(era2Dead.count() == 0,
      "a pre-deleted id was ingested by the later era")
  }
}
