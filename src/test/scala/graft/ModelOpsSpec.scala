package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ModelOps

/** Training-dynamics invariants of the model-in-the-loop operators —
  * properties the value-pinning oracle cannot express (GD descent must hold
  * for ANY learning rate small enough, not just reproduce one trajectory).
  */
class ModelOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("batch GD loss is non-increasing across the two steps") {
    val rows = ModelOps.linreg2Step(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(4))).toMap
    assert(rows.keySet == Set(1, 2))
    // loss_before(iter=2) is the loss AT w1; step 1 starts from w0 = 0 —
    // a descent step at eta=0.1 on these (scaled ~O(1)) features must not
    // increase the loss beyond 4-decimal rounding noise
    assert(rows(2) <= rows(1) + 1e-4,
      s"loss rose after step 1: ${rows(1)} -> ${rows(2)}")
  }

  test("logistic GD: iter-1 loss is exactly ln 2 and descent holds") {
    val rows = ModelOps.logreg2Step(spark, dir).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(rows.keySet == Set(1, 2))
    // at w = 0 every p is exactly 0.5, so the pre-step log-loss is ln 2
    // regardless of the data — a closed-form pin on the loss arithmetic
    assert(rows(1)._4 == math.floor(math.log(2) * 1e4 + 0.5) / 1e4,
      s"iter-1 loss ${rows(1)._4} != round(ln 2, 4)")
    assert(rows(2)._4 <= rows(1)._4 + 1e-4,
      s"log-loss rose after step 1: ${rows(1)._4} -> ${rows(2)._4}")
    // the step must have moved at least one weight off zero
    val (b, w1, w2, _) = rows(1)
    assert(b != 0.0 || w1 != 0.0 || w2 != 0.0, "step 1 left weights at zero")
  }

  test("first step moves weights in the negative-gradient direction") {
    val w1 = ModelOps.linreg2Step(spark, dir).collect()
      .find(_.getInt(0) == 1).get
    // at w0 = 0 every residual is -y with y > 0 (chars per token >= 1),
    // so each gradient component is negative and each weight must rise
    assert(w1.getDouble(1) > 0, s"bias ${w1.getDouble(1)} not positive")
    assert(w1.getDouble(2) > 0, s"w1 ${w1.getDouble(2)} not positive")
    assert(w1.getDouble(3) > 0, s"w2 ${w1.getDouble(3)} not positive")
  }

  test("scoring profile is consistent: every source scored, errors finite") {
    val rows = ModelOps.qualityModelScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: empty source group")
      assert(!r.getDouble(3).isNaN && r.getDouble(3) >= 0,
        s"${r.getString(0)}: bad mean_abs_err ${r.getDouble(3)}")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= r.getLong(1),
        s"${r.getString(0)}: overpredicted count out of range")
    }
  }

  test("model_calibration: bins partition the corpus, ECE matches its definition, diagram is non-degenerate") {
    val rows = graft.ops.ModelOps.modelCalibration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val n = graft.ops.Tables(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == n, "bins must partition the corpus")
    // standardized sharpening must actually spread the scores — the whole
    // point of the transform (a 1–2 bin diagram diagnoses nothing)
    assert(rows.length >= 8, s"degenerate diagram: ${rows.length} bins")
    val eces = rows.map(_._6).distinct
    assert(eces.length == 1, "ECE must be one global value")
    val definitional = BigDecimal(
      rows.map(r => r._2 * r._5).sum / rows.map(_._2).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(eces.head - definitional) < 1e-9,
      s"ECE ${eces.head} != Σn·gap/N $definitional")
    rows.foreach { case (bin, _, conf, acc, gap, ece) =>
      assert(bin >= 0 && bin <= 9)
      assert(conf >= 0 && conf <= 1 && acc >= 0 && acc <= 1)
      assert(gap >= 0 && ece >= 0 && ece <= 1)
    }
  }

  test("model_eval_by_slice: slices reconcile with the aggregate holdout " +
    "and per-slice R2 is bounded above by 1") {
    val slices = graft.ops.ModelOps.modelEvalBySlice(spark, dir).collect()
    val agg = graft.ops.ModelOps.modelEval(spark, dir).collect().head
    assert(slices.map(_.getLong(1)).sum == agg.getLong(0),
      "slice val counts must sum to the aggregate n_val")
    // Σ n_i · mse_i / N == aggregate MSE (both sides rounded at 4, so
    // allow the rounding slack)
    val wMse = slices.map(r => r.getLong(1) * r.getDouble(2)).sum /
      slices.map(_.getLong(1)).sum
    assert(math.abs(wMse - agg.getDouble(1)) < 1e-3,
      s"weighted slice MSE $wMse vs aggregate ${agg.getDouble(1)}")
    slices.foreach { r =>
      if (!r.isNullAt(3)) assert(r.getDouble(3) <= 1.0, r.getString(0))
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("conformal_interval: q-hat is the exact order statistic and " +
    "coverage matches a brute-force recount") {
    val row = graft.ops.ModelOps.conformalInterval(spark, dir).collect().head
    val (nCal, nTest, qHat, coverage) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    // brute force: same features, same 2-step GD, same clamp+round
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("doc_id", "n_chars", "text").collect().map { r =>
        val chars = r.getLong(1).toDouble
        val toks = r.getString(2).split(" ", -1).length.toDouble
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getLong(0).toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val nib = "0123456789abcdef".indexOf(md.charAt(31))
        (nib, chars / 1000.0, toks / 100.0, chars / toks)
      }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val train = docs.filter(_._1 < 13)
    def gd(b: Double, w1: Double, w2: Double) = {
      val es = train.map { case (_, x1, x2, y) =>
        val e = b + w1 * x1 + w2 * x2 - y; (e, e * x1, e * x2) }
      val n = train.length
      (r6(b - 0.2 * es.map(_._1).sum / n), r6(w1 - 0.2 * es.map(_._2).sum / n),
        r6(w2 - 0.2 * es.map(_._3).sum / n))
    }
    val (b1, w11, w21) = gd(0.0, 0.0, 0.0)
    val (b2, w12, w22) = gd(b1, w11, w21)
    def res(d: (Int, Double, Double, Double)) =
      r4(math.min(math.abs(b2 + w12 * d._2 + w22 * d._3 - d._4), 100.0))
    val cal = docs.filter(d => d._1 >= 13 && d._1 < 15).map(res).sorted
    val test = docs.filter(_._1 == 15).map(res)
    assert(nCal == cal.length && nTest == test.length)
    val k = math.ceil(0.9 * (cal.length + 1)).toInt
    assert(qHat == cal(k - 1), s"q_hat $qHat vs ${cal(k - 1)}")
    val cov = r4(test.count(_ <= qHat).toDouble / test.length)
    assert(coverage == cov, s"coverage $coverage vs $cov")
    // finite-sample guarantee holds in expectation; on one split allow
    // binomial noise around the target
    assert(coverage > 0.6 && coverage <= 1.0)
  }

  test("model_auc: histogram-cumsum AUC equals the brute-force " +
    "tie-corrected pair count, and the score actually ranks") {
    val row = graft.ops.ModelOps.modelAuc(spark, dir).collect().head
    val (nPos, nNeg, auc, gini) =
      (row.getLong(0), row.getLong(1), row.getDouble(3), row.getDouble(4))
    // brute force: P(pos > neg) + P(tie)/2 over all pos×neg pairs, on the
    // same (p, y) frame — rebuilt from the features so a drift in the
    // private score frame shows up as a mismatch here
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("n_chars", "text").collect().map { r =>
        val chars = r.getLong(0).toDouble
        val toks = r.getString(1).split(" ", -1).length.toDouble
        (chars / 1000.0, toks / 100.0, if (chars / toks > 5.49) 1.0 else 0.0)
      }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def gd(b: Double, w1: Double, w2: Double) = {
      val gs = docs.map { case (x1, x2, y) =>
        val p = 1.0 / (1.0 + math.exp(-(b + w1 * x1 + w2 * x2)))
        (p - y, (p - y) * x1, (p - y) * x2)
      }
      val n = docs.length
      (r6(b - 0.1 * gs.map(_._1).sum / n), r6(w1 - 0.1 * gs.map(_._2).sum / n),
        r6(w2 - 0.1 * gs.map(_._3).sum / n))
    }
    val (b1, w11, w21) = gd(0.0, 0.0, 0.0)
    val (b2, w12, w22) = gd(b1, w11, w21)
    val zs = docs.map { case (x1, x2, y) => (b2 + w12 * x1 + w22 * x2, y) }
    val mz = r6(zs.map(_._1).sum / zs.length)
    val sz = r6(math.sqrt(
      zs.map(z => math.pow(z._1 - mz, 2)).sum / (zs.length - 1)))
    val py = zs.map { case (z, y) =>
      (r6(1.0 / (1.0 + math.exp(-2.0 * (z - mz) / sz))), y) }
    val pos = py.filter(_._2 == 1.0).map(_._1)
    val neg = py.filter(_._2 == 0.0).map(_._1)
    assert(nPos == pos.length && nNeg == neg.length)
    val u = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val expected = r6(u / (pos.length.toDouble * neg.length))
    assert(math.abs(auc - expected) < 2e-6, s"auc $auc vs brute $expected")
    assert(math.abs(gini - (2 * auc - 1)) < 2e-6)
    // the model must rank better than coin-flip on this corpus — the
    // reason the query exists
    assert(auc > 0.5, s"score does not rank: auc = $auc")
  }

  test("nb_source_classify: rows partition the holdout; one doc's score vector recounted driver-side") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.ModelOps.nbSourceClassify(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, c, acc) =>
      assert(c <= n && acc >= 0.0 && acc <= 1.0, s"$src: $c/$n acc=$acc")
      assert(math.abs(acc - c.toDouble / n) < 1e-6)
    }
    // the per-source rows partition the holdout doc set exactly
    def nib(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(h.charAt(31))
    }
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.ops.DedupOps.normText(col("text")).as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val holdout = docs.filter(d => nib(d._1) >= 13)
    assert(rows.map(_._2).sum == holdout.length,
      "per-source rows must partition the holdout docs")
    // full NB score vector for the min-id holdout doc, recomputed from
    // scratch (train counts, smoothing, decomposed likelihood), must
    // reproduce the argmax the query committed to
    val train = docs.filter(d => nib(d._1) < 13)
    val tokensOf = (t: String) => t.split(" ").filter(_.nonEmpty)
    val classTok = train.groupBy(_._2).view.mapValues(ds =>
      ds.flatMap(d => tokensOf(d._3)).groupBy(identity).view
        .mapValues(_.length.toLong).toMap).toMap
    val vocab = train.flatMap(d => tokensOf(d._3)).distinct.length
    val dDoc = holdout.minBy(_._1)
    val cnts = tokensOf(dDoc._3).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val len = cnts.values.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scoresByClass = classTok.map { case (cls, tok) =>
      val nC = tok.values.sum
      val dC = train.count(_._2 == cls)
      val lp = math.log(dC.toDouble / train.length)
      val lden = math.log((nC + vocab).toDouble)
      val m = cnts.map { case (w, cw) =>
        tok.get(w).map(c => cw * math.log(c + 1.0)).getOrElse(0.0) }.sum
      cls -> r6(lp - len * lden + m)
    }
    val expectPred = scoresByClass.toSeq.minBy { case (cls, sc) => (-sc, cls) }._1
    assert(scoresByClass.size == train.map(_._2).distinct.length)
    assert(scoresByClass.values.forall(v => !v.isNaN && !v.isInfinite))
    // the query's committed per-doc argmax (and its 6-rounded score)
    // must equal the from-scratch recount's
    val pred = graft.ops.ModelOps.nbPredictions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
      .find(_._1 == dDoc._1).get
    assert(pred._2 == expectPred,
      s"doc ${dDoc._1}: query predicts ${pred._2}, recount $expectPred")
    assert(math.abs(pred._3 - scoresByClass(expectPred)) < 2e-6,
      s"doc ${dDoc._1}: score ${pred._3} vs recount ${scoresByClass(expectPred)}")
  }
}
