package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DedupOps, SimilarityOps}

/** The hash-dependent dedup/ANN variants have no DuckDB oracle (RowsOnly);
  * these tests pin them against the exact ground-truth queries instead:
  * LSH/SimHash results must be consistent with exact Jaccard/cosine.
  */
class DedupOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("minhash LSH: verified pairs ⊆ exact-jaccard pairs, recall ≥ 0.8") {
    val exact = DedupOps.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.dedupMinhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // dedupNgramJaccard blocks by source; LSH is unblocked, so it may
    // legitimately find cross-source pairs — compare on the blocked subset.
    val docsSource = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lshBlocked = lsh.filter { case (a, b) => docsSource(a) == docsSource(b) }
    assert(lshBlocked.subsetOf(exact),
      s"LSH-verified pairs not in exact set: ${lshBlocked.diff(exact).take(5)}")
    val recall = lshBlocked.size.toDouble / exact.size.toDouble
    assert(recall >= 0.8, s"LSH recall too low: $recall (${lshBlocked.size}/${exact.size})")
  }

  test("simhash: near-dup pairs overlap exact near-dups substantially") {
    val exact = DedupOps.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = DedupOps.dedupSimhash(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty, "simhash found no pairs")
    val precision = sim.intersect(exact).size.toDouble / sim.size.toDouble
    assert(precision >= 0.5,
      s"simhash precision vs exact jaccard too low: $precision")
  }

  test("shingle minhash LSH: reported jaccard matches independent Scala recomputation") {
    val rows = DedupOps.dedupMinhashShingle(spark, dir).collect()
    assert(rows.nonEmpty, "no shingle near-dups found")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.8)
      assert(r.getLong(0) < r.getLong(1))
    }
    // independent ground truth: string shingles via Scala sliding windows
    // (a completely different code path from RollingShingleHash — hash
    // collisions are the only permissible divergence, at ~2^-64)
    val texts = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("\\s+").toSeq).toMap
    def shingles(toks: Seq[String]): Set[Seq[String]] =
      if (toks.length < 5) Set.empty else toks.sliding(5).map(_.toSeq).toSet
    rows.take(50).foreach { r =>
      val (a, b, reported) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      assert(math.abs(expected - reported) < 1e-6,
        s"pair ($a,$b): reported $reported, recomputed $expected")
    }
  }

  test("sign-LSH ANN: per-query ranks contiguous, cos non-increasing, ⊆ brute-force candidates") {
    val rows = SimilarityOps.annSignLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq,
        s"ranks not contiguous for query $q")
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._4 >= y._4; case _ => true
      }, s"cos not non-increasing for query $q")
      assert(rs.forall(_._3 != q), "self returned as neighbor")
    }
  }
}
