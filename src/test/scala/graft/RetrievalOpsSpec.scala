package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Contracts the oracle can't state for the retrieval-evaluation pair:
  * hard_negative_mining's margin algebra against independently recomputed
  * positives, and retrieval_metrics' cross-consistency with the standalone
  * top-k queries it is supposed to be measuring.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val hardNeg =
    SimilarityOps.hardNegativeMining(spark, dir).collect()

  test("hard negatives: per-query ranks are 1..3 with cos non-increasing") {
    val byQuery = hardNeg.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val coss = sorted.map(_.getDouble(4))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hard negatives: pos_cos matches an independent same-label max " +
    "and margin = pos_cos - neg_cos on the 6-rounded values") {
    import graft.functions.VectorFunctions._
    val emb = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        normalize(toDoubleArray(col("embedding"))).as("v"))
    val vecs = emb.collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray)).toSeq
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    hardNeg.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val (_, qlabel, qv) = byId(qid)
      val posMax = vecs.filter(c => c._1 != qid && c._2 == qlabel)
        .map(c => cos6(qv, c._3)).max
      val pos4 = BigDecimal(posMax)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.foreach { r =>
        assert(r.getDouble(5) == pos4, s"pos_cos for query $qid")
        // margin re-derived from the unrounded-at-4 components
        val negId = r.getLong(2)
        val neg6 = cos6(qv, byId(negId)._3)
        val margin = BigDecimal(posMax - neg6)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(6) == margin, s"margin for ($qid, $negId)")
        // a hard negative is, by construction, never a same-label vector
        assert(byId(negId)._2 != qlabel)
      }
    }
  }

  private lazy val metrics =
    SimilarityOps.retrievalMetrics(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("retrieval metrics: both methods present, all metrics in [0,1], " +
    "and MRR >= recall-implied floor") {
    assert(metrics.keySet == Set("ivf_nprobe1", "trunc32"))
    metrics.values.foreach { case (n, recall, mrr, ndcg) =>
      assert(n > 0)
      Seq(recall, mrr, ndcg).foreach(m => assert(m >= 0.0 && m <= 1.0))
    }
  }

  test("retrieval metrics: ivf_nprobe1 mean recall equals the recall of " +
    "ann_ivf_topk measured against the exact baseline") {
    // membership sets from the standalone queries (their ranking scores are
    // unrounded, but membership at rank<=K survives the 6-rounding unless a
    // true tie straddles the boundary — assert equality, which also pins
    // that no such straddle exists on this corpus)
    val exact = SimilarityOps.annCosineTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.annIvfTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val queries = exact.map(_._1)
    val perQuery = queries.toSeq.map { q =>
      val rel = exact.filter(_._1 == q).map(_._2)
      val got = ivf.filter(_._1 == q).map(_._2)
      val r6 = BigDecimal((rel & got).size.toDouble / rel.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r6
    }
    val mean = BigDecimal(perQuery.sum / perQuery.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(metrics("ivf_nprobe1")._2 == mean)
  }

  test("retrieval metrics: nDCG <= 1 implies ordering credit is bounded " +
    "and equals 1 only with perfect top-K agreement") {
    metrics.foreach { case (m, (_, recall, _, ndcg)) =>
      if (ndcg == 1.0) assert(recall == 1.0, s"method $m")
      // nDCG can exceed recall (early hits weigh more) but never 1
      assert(ndcg <= 1.0)
    }
  }

  test("ann_ivf_tune: recall and candidate cost are monotone in nprobe, " +
    "and the np=1 recall is consistent with retrieval_metrics") {
    val rows = graft.ops.SimilarityOps.annIvfTune(spark, dir).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val recalls = rows.map(_.getDouble(1))
    val cands = rows.map(_.getDouble(2))
    val fracs = rows.map(_.getDouble(3))
    // nested probe sets: more buckets can only add candidates and recall
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone: ${recalls.toSeq}")
    assert(cands.zip(cands.tail).forall { case (a, b) => a < b },
      s"candidates must strictly grow: ${cands.toSeq}")
    fracs.foreach(f => assert(f > 0 && f < 1))
    recalls.foreach(r => assert(r >= 0 && r <= 1))
    // same quantizer, same corpus at np=1 — but ann_ivf_tune ranks probe
    // buckets by CENTROID distance while retrieval_metrics' ivf_nprobe1
    // probes the query's OWN label; on this corpus the nearest centroid
    // is almost always the own-label one, so the two must be close
    val rm = metrics("ivf_nprobe1")._2
    assert(math.abs(recalls.head - rm) < 0.2,
      s"np=1 recall ${recalls.head} vs retrieval_metrics $rm")
  }

  test("ann_filtered_topk: survivors bounded by 20, recall in [0,1], and " +
    "a brute-force recheck of the post-filter pipeline") {
    import graft.functions.VectorFunctions._
    val rows = graft.ops.SimilarityOps.annFilteredTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, sv, rec) =>
      assert(sv >= 0 && sv <= 20)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // brute force one query end-to-end
    val vecs = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        normalize(toDoubleArray(col("embedding"))).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def c6(a: Array[Double], b: Array[Double]) =
      BigDecimal(a.zip(b).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (qid, _, qv) = vecs.find(_._1 == 0L).get
    val scored = vecs.filter(_._1 != qid)
      .map(v => (v._1, v._2 % 2 == 0, c6(qv, v._3)))
      .sortBy { case (nid, _, c) => (-c, nid) }
    val truth = scored.filter(_._2).take(5).map(_._1).toSet
    val surv = scored.take(20).filter(_._2)
    val post = surv.take(5).map(_._1).toSet
    val row0 = rows.find(_._1 == 0L).get
    assert(row0._2 == surv.length, s"survivors ${row0._2} vs ${surv.length}")
    val rec = BigDecimal((post & truth).size / 5.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row0._3 == rec, s"recall ${row0._3} vs $rec")
  }

  test("kcenter coreset: greedy invariants — distinct centers, seed is " +
    "vec_id 0, and selection distances never increase") {
    val rows = graft.ops.SimilarityOps.kcenterCoreset(spark, dir).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 6)
    assert(rows.head.getInt(0) == 1 && rows.head.getLong(1) == 0L)
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    val dists = rows.tail.map(_.getDouble(2)) // round 1 is the 0.0 seed
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b },
      s"selection distances must be non-increasing: ${dists.toSeq}")
  }

  test("kcenter coreset: each selected center is the true farthest point " +
    "from the prior set (brute-force recheck)") {
    import graft.functions.VectorFunctions._
    val vecs = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), normalize(toDoubleArray(col("embedding"))).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d6(a: Array[Double], b: Array[Double]): Double = {
      val c = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal(1.0 - c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = graft.ops.SimilarityOps.kcenterCoreset(spark, dir).collect()
      .sortBy(_.getInt(0))
    var centers = Vector(vecs.find(_._1 == 0L).get)
    rows.tail.foreach { r =>
      val expected = vecs
        .map(p => (p, centers.map(c => d6(c._2, p._2)).min))
        .maxBy { case (p, md) => (md, -p._1) } // max md, then min vec_id
      assert(r.getLong(1) == expected._1._1, s"round ${r.getInt(0)}")
      val d4 = BigDecimal(expected._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == d4, s"dist at round ${r.getInt(0)}")
      centers = centers :+ expected._1
    }
  }
}
