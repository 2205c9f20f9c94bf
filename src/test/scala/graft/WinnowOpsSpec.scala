package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WinnowOps

/** Winnowing fingerprints (Schleimer et al. SIGMOD'03): the detection
  * guarantee on crafted documents plus density/structure invariants on the
  * real corpus. Value-level parity with DuckDB is the driver oracle's job
  * (md5-hex selection is engine-independent); these pin the algorithmic
  * properties no row-hash comparison expresses.
  */
class WinnowOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Write a minimal documents table the WinnowOps queries can read. */
  private def docsDir(texts: Seq[String]): String = {
    val d = Files.createTempDirectory("graft-winnow").toString
    val rows = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "spec", t.length.toLong)
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("guarantee: a long shared token run is detected, disjoint text is not") {
    // docs 0 and 1 embed the same 40-token run inside different
    // surroundings; doc 2 shares nothing. W+K-1 = 7 tokens is the
    // guarantee threshold — 40 tokens yields many winnowed fingerprints.
    val run = (1 to 40).map(i => s"shared$i").mkString(" ")
    val d = docsDir(Seq(
      s"alpha beta gamma $run delta epsilon",
      s"one two three four five $run six seven",
      (1 to 60).map(i => s"other$i").mkString(" ")))
    val pairs = WinnowOps.dedupWinnow(spark, d)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)), s"shared-run pair missed: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"disjoint doc reported: ${pairs.toSeq}")
  }

  test("structure: fingerprint counts bounded by shingle/window counts") {
    val rows = WinnowOps.winnowFingerprint(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nSh = r.getAs[Long]("n_shingles")
      val nFp = r.getAs[Long]("n_fingerprints")
      if (nSh == 0) assert(nFp == 0, s"doc ${r.get(0)}: fps without shingles")
      else {
        assert(nFp >= 1, s"doc ${r.get(0)}: no fingerprint despite $nSh shingles")
        assert(nFp <= math.max(1, nSh - 3), // ≤ number of full windows (W=4)
          s"doc ${r.get(0)}: $nFp fps > windows of $nSh shingles")
      }
    }
  }

  test("density: winnowing samples ~2/(W+1) of shingles, never all of them") {
    val agg = WinnowOps.winnowFingerprint(spark, dir)
      .filter(col("n_shingles") > lit(20))
      .agg(avg(col("n_fingerprints").cast("double") / col("n_shingles")))
      .head().getDouble(0)
    // expected 2/(W+1) = 0.4 for random hashes; distinct-dedup of repeated
    // text pulls it lower. Loose band — this guards against selecting
    // every shingle (broken winnow → 1.0) or almost none (broken min).
    assert(agg > 0.15 && agg < 0.6, s"winnow density out of band: $agg")
  }

  test("spans: same pairs and counts as dedup_winnow, ordered bounds") {
    val pairs = WinnowOps.dedupWinnow(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val spans = WinnowOps.dedupWinnowSpans(spark, dir).collect()
    assert(spans.length == pairs.size, "span rows must mirror pair rows")
    spans.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(pairs.get(k).contains(r.getLong(2)),
        s"pair $k n_shared diverges between dedup_winnow and spans")
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(5) <= r.getLong(6),
        s"pair $k: span bounds unordered")
    }
  }

}
