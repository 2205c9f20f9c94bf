package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AnalyticsOps, LayoutOps, ModelOps, SketchOps, Tables, TextOps}
import org.apache.spark.sql.functions._

/** Property pins for the r8 additions: the md5-deterministic sketches
  * (HLL, Count-Min), the Gram matrix, chunking, zone-map pruning, and
  * calendar-lag autocorrelation. Value-level equality vs DuckDB is the
  * driver gate's job; these pin the mathematical invariants that survive
  * any refactor of the plumbing.
  */
class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("hll_estimate: estimates within the m=32 HLL error envelope") {
    val rows = SketchOps.hllEstimate(spark, dir).collect()
    assert(rows.nonEmpty)
    val relErrs = rows.map(_.getDouble(3))
    // 1.04/sqrt(32) ~ 18% std error; median must sit well inside 2 sigma
    // and no group may be wildly off (5 sigma)
    val sorted = relErrs.sorted
    assert(sorted(sorted.length / 2) <= 0.40,
      s"median rel_err ${sorted(sorted.length / 2)} too high for m=32")
    assert(relErrs.max <= 1.0, s"outlier rel_err ${relErrs.max}")
  }

  test("countmin_est: one-sided error, within the e/w * N bound") {
    val rows = SketchOps.countminEst(spark, dir).collect()
    val nUsers = Tables(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.length == math.min(20L, nUsers))
    val n = Tables(spark, dir, "events").count()
    val bound = math.ceil(math.E / 64 * n).toLong
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2); val over = r.getLong(3)
      assert(est >= exact, s"CMS undercounted: est=$est exact=$exact")
      assert(over == est - exact)
      // Markov bound holds in expectation per row; min over 4 independent
      // rows exceeding 2x the epsilon*N bound would be a broken sketch
      assert(over <= 2 * bound, s"overcount $over way past eN=$bound")
    }
  }

  test("bootstrap_ci: CI ordered and brackets the mean; SE near sigma/sqrt(n)") {
    val rows = SketchOps.bootstrapCi(spark, dir).collect()
    assert(rows.length == 5)
    val ords = Tables(spark, dir, "orders")
      .agg(stddev_samp(col("o_totalprice")).as("sd"), count(lit(1)).as("n"))
      .collect()(0)
    rows.foreach { r =>
      val n = r.getLong(1); val mean = r.getDouble(2)
      val se = r.getDouble(3); val lo = r.getDouble(4); val hi = r.getDouble(5)
      assert(lo < hi, "degenerate CI")
      // a 95% percentile CI from 32 replicates almost surely brackets the
      // point estimate; allow a 1-SE slack for the tiny-R percentile bias
      assert(mean > lo - se && mean < hi + se,
        s"mean $mean outside CI [$lo, $hi] +/- se $se")
      // Poisson-bootstrap SE of a mean ~ sigma/sqrt(n_group) — within 3x
      val expected = ords.getDouble(0) / math.sqrt(n.toDouble)
      assert(se > expected / 3 && se < expected * 3,
        s"se $se implausible vs sigma/sqrt(n) = $expected")
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables(spark, dir, "orders").count())
  }

  test("cms_join_card: one-sided estimate, FK-exact baseline, sane ratio") {
    val r = SketchOps.cmsJoinCard(spark, dir).collect()(0)
    val exact = r.getLong(0); val est = r.getLong(1)
    // FK integrity: every order joins exactly one customer
    assert(exact == Tables(spark, dir, "orders").count())
    assert(est >= exact, s"CMS inner product undercounted: $est < $exact")
    assert(r.getLong(2) == est - exact)
    // collision mass bound: e * |A| * |B| / w above the true mass would
    // mean a broken sketch (w=4096 keeps expected excess ~ a few %)
    val nB = Tables(spark, dir, "customer").count()
    assert(est - exact <= math.ceil(math.E * exact * nB / 4096).toLong,
      s"overcount ${est - exact} beyond the CMS bound")
  }

  test("dp_counts: Laplace noise bounded, nonzero, deterministic across runs") {
    val rows = SketchOps.dpCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, t, dp) =>
      // P(|Laplace(1)| > 20) = e^-20 — a violation means broken noise
      assert(math.abs(dp - t) < 20, s"$src: noise ${dp - t} implausible")
      assert(dp != t.toDouble, s"$src: noise exactly zero")
    }
    val again = SketchOps.dpCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == again.toSeq, "noise not idempotent across runs")
  }

  test("gram_matrix: upper triangle, PSD-consistent diagonal, symmetry via Cauchy-Schwarz") {
    val rows = ModelOps.gramMatrix(spark, dir).collect()
    val d = 64
    assert(rows.length == d * (d + 1) / 2)
    val g = rows.map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    (1 to d).foreach { i =>
      assert(g((i, i)) >= 0, s"diagonal ($i,$i) negative: ${g((i, i))}")
    }
    // Cauchy–Schwarz: g(i,j)^2 <= g(i,i) * g(j,j) (slack for round(4))
    for (i <- 1 to d; j <- i to d) {
      assert(g((i, j)) * g((i, j)) <= g((i, i)) * g((j, j)) + 1e-4,
        s"($i,$j) violates Cauchy-Schwarz")
    }
  }

  test("doc_chunk: full coverage, stride/overlap exact, short docs one chunk") {
    val chunks = TextOps.docChunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(graft.ops.DedupOps.normText(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == docs.keySet, "some doc lost all its chunks")
    chunks.foreach { case (docId, cs) =>
      val n = docs(docId)
      val sortedCs = cs.sortBy(_._2)
      // chunk_idx is 1..k dense; starts are 1, 49, 97, ...
      assert(sortedCs.map(_._2).toSeq == (1 to cs.length))
      sortedCs.foreach { case (_, idx, start, nTok) =>
        assert(start == 1 + (idx - 1) * 48)
        assert(nTok == math.min(64, n - start + 1),
          s"doc $docId chunk $idx: n_tok $nTok, n=$n start=$start")
      }
      // coverage: the last chunk reaches the last token
      val (_, _, lastStart, lastNTok) = sortedCs.last
      assert(lastStart + lastNTok - 1 == n, s"doc $docId tail uncovered")
      // every non-final chunk is full-size
      sortedCs.dropRight(1).foreach { case (_, _, _, nTok) =>
        assert(nTok == 64)
      }
    }
  }

  test("zonemap_prune: self-auditing selectivities and complete partition") {
    val rows = LayoutOps.zonemapPrune(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byDecision = rows.map(r => r._1 -> r).toMap
    assert(rows.map(_._1).toSet.subsetOf(Set("skip", "full", "partial")))
    byDecision.get("skip").foreach { case (_, _, _, sel) =>
      assert(sel == 0.0, s"skip class must match nothing, got $sel")
    }
    byDecision.get("full").foreach { case (_, _, _, sel) =>
      assert(sel == 1.0, s"full class must match everything, got $sel")
    }
    byDecision.get("partial").foreach { case (_, _, _, sel) =>
      assert(sel > 0.0 && sel < 1.0, s"partial selectivity $sel out of (0,1)")
    }
    assert(rows.map(_._3).sum == Tables(spark, dir, "lineitem").count(),
      "classes don't partition the table")
    // the report's reason to exist: a date predicate on ingest-ordered
    // files must actually skip most files
    val skipFiles = byDecision.get("skip").map(_._2).getOrElse(0L)
    val totalFiles = rows.map(_._2).sum
    assert(skipFiles.toDouble / totalFiles >= 0.5,
      s"only $skipFiles/$totalFiles files skipped — zone maps not pruning")
  }

  test("pca_power: unit-norm loadings, Rayleigh quotient non-decreasing") {
    val rows = ModelOps.pcaPower(spark, dir).collect()
    assert(rows.length == 64)
    val v = rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val lambda = rows.head.getDouble(2)
    assert(rows.forall(_.getDouble(2) == lambda), "eigenvalue not constant")
    assert(lambda > 0, s"PSD Gram must have positive top eigenvalue, got $lambda")
    val norm = math.sqrt(v.values.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loadings not unit norm: $norm")
    // power-iteration property: the Rayleigh quotient at the NEXT iterate
    // (the returned v2) must not be below the reported one (which is at v1)
    val g = ModelOps.gramMatrix(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    def gAt(i: Int, j: Int) = if (i <= j) g((i, j)) else g((j, i))
    val rayleighV2 = (for (i <- 1 to 64; j <- 1 to 64)
      yield v(i) * gAt(i, j) * v(j)).sum
    assert(rayleighV2 >= lambda - 0.05,
      s"R(v2)=$rayleighV2 below reported lambda=$lambda — iteration broken")
  }

  test("quantile_normalize: per-source cume_dist hits 1.0 and is monotone") {
    val rows = TextOps.quantileNormalize(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._3).max == 1.0, s"$src: max quantile != 1.0")
      assert(rs.forall(r => r._3 > 0.0 && r._3 <= 1.0))
      // monotone in the metric: sort by n_chars, q must be non-decreasing,
      // and ties in n_chars must share the same q
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, n1, q1), (_, n2, q2)) =>
          assert(q2 >= q1, s"$src: q not monotone")
          if (n1 == n2) assert(q1 == q2, s"$src: ties at $n1 diverge")
        case _ =>
      }
    }
  }

  test("rrf_fusion: scores recomputable from ranks, ordered, ranks in [1,50]") {
    val rows = graft.ops.SimilarityOps.rrfFusion(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    def rankOpt(r: org.apache.spark.sql.Row, i: Int): Option[Int] =
      if (r.isNullAt(i)) None else Some(r.getInt(i))
    var prev = Double.MaxValue
    rows.foreach { r =>
      val rs = rankOpt(r, 1); val rd = rankOpt(r, 2); val rrf = r.getDouble(3)
      assert(rs.nonEmpty || rd.nonEmpty, "doc in neither list")
      (rs ++ rd).foreach(x => assert(x >= 1 && x <= 50, s"rank $x out of range"))
      val expect = rs.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rd.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-6,
        s"rrf $rrf != recomputed $expect for ranks $rs/$rd")
      assert(rrf <= prev + 1e-9, "rrf not descending")
      prev = rrf
    }
  }

  test("rfm_segments: quartile cells partition the user base, scores in 1..4") {
    val rows = graft.ops.EventOps.rfmSegments(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (rq, fq, mq, n, _) =>
      assert(rq >= 1 && rq <= 4 && fq >= 1 && fq <= 4 && mq >= 1 && mq <= 4)
      assert(n > 0)
    }
    val ev = Tables(spark, dir, "events")
    assert(rows.map(_._4).sum ==
      ev.select(col("user_id")).distinct().count(), "users lost or doubled")
    assert(rows.map(_._5).sum == ev.count(), "events lost or doubled")
  }

  test("path_mining: lift recomputable, obs-ordered, Markov expectations positive") {
    val rows = graft.ops.EventOps.pathMining(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 10)
    var prev = Long.MaxValue
    rows.foreach { case (path, obs, exp, lift) =>
      assert(path.split(">").length == 3)
      assert(obs > 0 && exp > 0)
      assert(math.abs(lift - obs / exp) < 0.01,
        s"$path: lift $lift != obs/exp ${obs / exp}")
      assert(obs <= prev, "not ordered by obs desc")
      prev = obs
    }
  }

  test("autocorr_lag: 7 lags, |acf| bounded, pair counts shrink with lag") {
    val rows = AnalyticsOps.autocorrLag(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1 to 7))
    rows.foreach { case (lag, n, acf) =>
      assert(n > 100, s"lag $lag has only $n pairs")
      assert(acf >= -1.0 && acf <= 1.0, s"acf $acf out of [-1,1] at lag $lag")
    }
    // calendar-join property: pairs at lag k can never exceed pairs at
    // a divisor-free smaller domain bound (n_days - distinct missing);
    // weaker but refactor-stable: no lag has more pairs than days
    val days = Tables(spark, dir, "orders")
      .select(col("o_orderdate").cast("date")).distinct().count()
    rows.foreach { case (_, n, _) => assert(n <= days) }
  }
}
