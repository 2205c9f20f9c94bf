package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{CurationOps, Tables}
import graft.streaming.StreamingPpl

/** Stream/batch parity for the perplexity-filter artifact: scores and
  * tertile labels served off the drained bigram-bag store must equal
  * the one-shot batch query — chop-independent because a doc's bag is
  * a pure function of the doc and eras are doc-disjoint. Deletes are
  * doc tombstones (exact — bags are doc-keyed; the LM and the tertile
  * cutpoints re-derive from live rows at read time, the GLOBAL-model
  * subtlety doubled relative to DSIR); a fresh-checkpoint re-drain
  * grows nothing; compaction leaves serving unchanged.
  */
class StreamingPplSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
      .toSeq.sortBy(_._1)

  /** Equality up to the 4-dp rounding half-width on the score (the two
    * sides aggregate under different physical partitionings — the
    * [[StreamingDsirSpec]] precedent); ids/langs/counts/labels compare
    * exactly (labels derive from post-rounding scores on both sides).
    */
  private def assertSamePpl(
      got: Seq[(Long, String, Long, Double, String)],
      want: Seq[(Long, String, Long, Double, String)],
      clue: String): Unit = {
    assert(got.length == want.length, clue)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$clue: $g vs $w")
      assert(math.abs(g._4 - w._4) <= 1.01e-4, s"$clue: score $g vs $w")
      assert(g._5 == w._5, s"$clue: bucket $g vs $w")
    }
  }

  test("drained perplexity equals the batch query; delete + re-drain " +
      "serves the survivor rebuild (LM + cutpoints re-derive); compact " +
      "changes nothing") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val full = rows(CurationOps.perplexityFilter(spark, dir))
    assert(full.nonEmpty)

    val root = Files.createTempDirectory("graft-sppl")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    for (pred <- Seq("doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"))
      docs.filter(pred).coalesce(1).write.mode("append").parquet(in.toString)
    StreamingPpl.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt1").toString)
    assertSamePpl(rows(StreamingPpl.perplexity(spark, store)), full,
      "drained scores ≠ batch query")

    // delete a family: the served scores must equal the chain re-run
    // over the survivor docs — BOTH the LM and the tertile boundaries
    // move, made exact by deriving everything from live bags at read
    StreamingPpl.applyDeletes(spark, store,
      docs.filter(pmod(col("doc_id"), lit(10)) === 3).select(col("doc_id")))
    val survivors = rows(CurationOps.perplexityFrom(
      CurationOps.pplBagsFor(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 3))))
    assert(survivors.length != full.length,
      "delete family empty — survivor test vacuous")
    assertSamePpl(rows(StreamingPpl.perplexity(spark, store)),
      survivors, "post-delete scores ≠ survivor rebuild")

    // fresh-checkpoint re-drain: no resurrection, no duplication
    StreamingPpl.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt2").toString)
    assertSamePpl(rows(StreamingPpl.perplexity(spark, store)),
      survivors, "re-drain resurrected or duplicated bags")

    // physical compaction: serving identical, dead rows physically gone
    StreamingPpl.compact(spark, store)
    assertSamePpl(rows(StreamingPpl.perplexity(spark, store)),
      survivors, "compaction changed served scores")
    val raw = spark.read.parquet(s"$store/bags")
    assert(raw.filter(pmod(col("doc_id"), lit(10)) === 3).count() == 0,
      "compaction left dead bag rows on disk")
  }

  test("chained lifecycle: insert -> delete -> insert serves the rebuild " +
      "over live arrivals (pre-deleted ids blocked at ingest)") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val root = Files.createTempDirectory("graft-sppl-chain")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    // era 1: the non-7 families arrive
    docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      .coalesce(1).write.mode("append").parquet(in.toString)
    StreamingPpl.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt1").toString)
    // tombstone family 4 (already in) AND family 7 (not yet arrived)
    StreamingPpl.applyDeletes(spark, store,
      docs.filter(pmod(col("doc_id"), lit(10)).isin(4, 7))
        .select(col("doc_id")))
    // era 2: family 7 arrives — must be blocked at ingest, not just
    // filtered at read
    docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      .coalesce(1).write.mode("append").parquet(in.toString)
    StreamingPpl.runAvailableNow(spark, docs.schema, in.toString, store,
      root.resolve("ckpt2").toString)
    val live = rows(CurationOps.perplexityFrom(CurationOps.pplBagsFor(
      docs.filter(!pmod(col("doc_id"), lit(10)).isin(4, 7)))))
    assertSamePpl(rows(StreamingPpl.perplexity(spark, store)), live,
      "chained lifecycle ≠ live-arrival rebuild")
    StreamingPpl.compact(spark, store)
    val raw = spark.read.parquet(s"$store/bags")
    assert(raw.filter(pmod(col("doc_id"), lit(10)).isin(4, 7)).count() == 0,
      "tombstoned families present on disk after compact")
  }
}
